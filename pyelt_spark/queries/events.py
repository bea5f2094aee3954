"""Event-analytics driver queries: rollups, sessionization, exact
percentiles, and the Structured Streaming watermark query."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from pyelt_spark.queries.common import _dec, _t


def q_events_hourly_rollup(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(_dec("value")).cast("double"), 6).alias("sum_value"),
        )
        .orderBy("hour", "event_type")
    )


SQL_EVENTS_HOURLY = """
SELECT date_trunc('hour', ts) AS hour, event_type,
  count(*) AS n_events,
  round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 6) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


def q_events_sessionize(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity) — the batch analog of a
    stateful streaming session window."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    starts = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    wsum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        e.withColumn("_new", starts)
        .withColumn("session_num", F.sum("_new").over(wsum))
        .groupBy("user_id", "session_num")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .orderBy("user_id", "session_num")
    )


SQL_EVENTS_SESSIONIZE = """
WITH g AS (
  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
      OR date_diff('second', lag(ts) OVER w, ts) > 1800 THEN 1 ELSE 0 END AS _new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, sum(_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_num
  FROM g
)
SELECT user_id, CAST(session_num AS BIGINT) AS session_num, count(*) AS n_events,
  min(ts) AS session_start, max(ts) AS session_end
FROM s GROUP BY 1, 2 ORDER BY 1, 2
"""


_STREAM_N = {"n": 0}


def q_stream_hourly_rollup(spark, sf_dir):
    """Structured Streaming windowed aggregation with a 1-hour watermark
    (availableNow): append mode emits only windows the final watermark has
    closed — the oracle applies the identical cutoff."""
    src = os.path.join(sf_dir, "events.parquet")
    # the file stream source lists a DIRECTORY; expose the single parquet
    # file through a per-sf temp dir (symlink — no copy)
    stream_dir = os.path.join(
        tempfile.gettempdir(), f"stream_src_{abs(hash(sf_dir))}"
    )
    os.makedirs(stream_dir, exist_ok=True)
    link = os.path.join(stream_dir, "events.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(stream_dir)
    # watermarks need TIMESTAMP (ltz); session TZ is UTC so values are equal
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(_dec("value")).cast("double"), 6).alias("sum_value"),
        )
    )
    _STREAM_N["n"] += 1
    name = f"stream_hourly_{_STREAM_N['n']}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name).select(
        F.col("w.start").alias("hour"), "event_type", "n_events", "sum_value"
    )


SQL_STREAM_HOURLY = """
WITH m AS (SELECT max(ts) AS mx FROM events)
SELECT date_trunc('hour', ts) AS hour, event_type,
  count(*) AS n_events,
  round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 6) AS sum_value
FROM events, m
GROUP BY 1, 2, m.mx
HAVING date_trunc('hour', min(ts)) + INTERVAL 1 HOUR <= mx - INTERVAL 1 HOUR
"""


def q_events_value_percentiles(spark, sf_dir):
    """Exact interpolated percentiles per group (analytics coverage beyond
    the reference's aggregate set)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
            F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
        )
        .orderBy("event_type")
    )


SQL_EVENTS_PERCENTILES = """
SELECT event_type,
  round(quantile_cont(value, 0.5), 6) AS p50,
  round(quantile_cont(value, 0.9), 6) AS p90,
  round(quantile_cont(value, 0.99), 6) AS p99
FROM events GROUP BY event_type ORDER BY event_type
"""


QUERIES = {
    "events_hourly_rollup": q_events_hourly_rollup,
    "events_sessionize": q_events_sessionize,
    "stream_hourly_rollup": q_stream_hourly_rollup,
    "events_value_percentiles": q_events_value_percentiles,
}

ORACLES = {
    "events_hourly_rollup": SQL_EVENTS_HOURLY,
    "events_sessionize": SQL_EVENTS_SESSIONIZE,
    "stream_hourly_rollup": SQL_STREAM_HOURLY,
    "events_value_percentiles": SQL_EVENTS_PERCENTILES,
}
