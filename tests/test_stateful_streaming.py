"""applyInPandasWithState custom stateful operator: per-conversation
running state across microbatches, checked against a batch computation."""

from pyspark.sql import functions as F

from pyelt_spark.sources.events import transcript_change_events
from pyelt_spark.streaming.stateful import conversation_progress


def test_conversation_progress_matches_batch(spark, tmp_path):
    ev = transcript_change_events(spark, 1200, batch_size=400, seed=3)
    src = str(tmp_path / "src")
    ev.write.mode("overwrite").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)  # force multiple microbatches
        .parquet(src)
    )
    out = conversation_progress(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("conv_progress")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    # update mode re-emits a conv's row each batch — keep the final state
    # (max n_events per conv, since counts only grow)
    got = (
        spark.table("conv_progress")
        .groupBy("conv_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("max_seq").alias("max_seq"),
            F.max("n_turns_seen").alias("n_turns_seen"),
        )
    )
    want = (
        spark.read.parquet(src)
        .groupBy("conv_id")
        .agg(
            F.count("*").alias("n_events"),
            F.max("seq").alias("max_seq"),
            F.countDistinct("turn_idx").alias("n_turns_seen"),
        )
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0

    # last_text tracks the max-seq event's text
    final = {r["conv_id"]: r for r in spark.table("conv_progress").collect()}
    from pyelt_spark.operators.dedup import latest_per_key

    latest = latest_per_key(
        spark.read.parquet(src).select("conv_id", "seq", "text"),
        ["conv_id"], ["seq"],
    )
    for r in latest.collect():
        assert final[r["conv_id"]]["last_text"] is not None
