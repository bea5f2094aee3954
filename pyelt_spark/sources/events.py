"""Deterministic synthetic transcript change-event generator.

Plays the role of the reference's multi-revision CSV fixtures
(/root/reference/tests/data/patienten1..4.csv and the 10,000-row scale
variants): a seeded, fully distributed stream of insert/update/delete
events over the transcript table shape from BASELINE.json's input_hint
(conv_id, turn_idx, role, text, tool, ts) wrapped in a binlog envelope
(seq, op, batch_id).

Required awkwardness (FIXTURES §1) is all present and deterministic:
* updates that change ``text`` (hashdiff fires) and updates that change
  nothing (hashdiff must NOT fire — EXCEPT semantics, etl.py:156-163),
* out-of-order ``seq`` per key (rows are emitted in scrambled order),
* duplicate ``(conv_id, turn_idx, seq)`` rows with diverging payloads
  (exercises the deterministic dedup tiebreak),
* delete events (``op='D'``),
* a skewed conv_id distribution (a few hot conversations take a large
  share of events — the salting/partial-agg stress case),
* optional late-arriving column (additive schema evolution).

Everything is built from ``spark.range`` + ``xxhash64`` column
expressions: no driver-side loops, no Python per row, generates at any
scale the cluster can hold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _h(seed: int, *cols) -> F.Column:
    """Deterministic 64-bit mix of (seed, cols)."""
    return F.xxhash64(F.lit(seed), *cols)


def _pm(col, n: int) -> F.Column:
    return F.pmod(col, F.lit(n))


def transcript_change_events(
    spark: SparkSession,
    n_events: int,
    n_convs: int | None = None,
    turns_per_conv: int = 20,
    batch_size: int = 10_000,
    seed: int = 42,
    hot_convs: int = 3,
    hot_share_pct: int = 20,
    dup_one_in: int = 50,
    text_revisions: int = 5,
    evolve_from_batch: int | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """Generate ``n_events`` change events (plus ~1/dup_one_in duplicates).

    ``evolve_from_batch``: if set, events in batches >= that id carry an
    extra non-null ``meta`` column (schema-evolution scenario).
    """
    n_convs = n_convs or max(n_events // (turns_per_conv * 4), 4)
    df = spark.range(0, n_events, numPartitions=partitions).withColumnRenamed("id", "seq")

    # skewed conversation assignment: hot_share_pct% of events land on
    # `hot_convs` conversations, the rest spread uniformly
    pick = _pm(_h(seed, "seq"), 100)
    conv_num = F.when(
        pick < F.lit(hot_share_pct), _pm(_h(seed + 1, "seq"), hot_convs)
    ).otherwise(F.lit(hot_convs) + _pm(_h(seed + 2, "seq"), max(n_convs - hot_convs, 1)))
    df = df.withColumn("_conv_num", conv_num)
    df = df.withColumn("conv_id", F.concat(F.lit("conv-"), F.col("_conv_num")))
    df = df.withColumn(
        "turn_idx", _pm(_h(seed + 3, "seq"), turns_per_conv).cast("int")
    )

    # op mix: ~76% updates/inserts, ~16% repeat-content (no-op) updates via
    # small text_revisions space, ~8% deletes
    opn = _pm(_h(seed + 4, "seq"), 100)
    df = df.withColumn("op", F.when(opn < 8, F.lit("D")).when(opn < 54, F.lit("U")).otherwise(F.lit("I")))

    role_idx = _pm(F.col("turn_idx"), 3)
    df = df.withColumn(
        "role",
        F.element_at(F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")), (role_idx + 1).cast("int")),
    )
    df = df.withColumn(
        "tool",
        F.when(
            F.col("role") == "tool",
            F.concat(F.lit("tool_"), _pm(_h(seed + 5, "conv_id", "turn_idx"), 7)),
        ).otherwise(F.lit(None).cast("string")),
    )
    # text revision drawn from a small space → two updates to the same turn
    # often repeat content exactly (hashdiff must not fire on those)
    rev = _pm(_h(seed + 6, "seq"), text_revisions)
    df = df.withColumn(
        "text",
        F.concat(
            F.lit("turn "), F.col("turn_idx"), F.lit(" of "), F.col("conv_id"),
            F.lit(" rev "), rev, F.lit(" :: "),
            F.sha2(F.concat_ws("|", F.col("conv_id"), F.col("turn_idx"), rev), 256),
        ),
    )
    df = df.withColumn(
        "ts", F.timestamp_seconds(F.lit(1704067200) + F.col("seq"))  # 2024-01-01 + seq sec
    )
    df = df.withColumn("batch_id", (F.col("seq") / F.lit(batch_size)).cast("long"))

    if evolve_from_batch is not None:
        df = df.withColumn(
            "meta",
            F.when(
                F.col("batch_id") >= evolve_from_batch,
                F.concat(F.lit("m"), _pm(_h(seed + 7, "seq"), 10)),
            ).otherwise(F.lit(None).cast("string")),
        )

    # duplicate (conv_id, turn_idx, seq) rows with diverging text — the
    # deterministic tiebreak must always pick the same winner
    dups = df.filter(_pm(_h(seed + 8, "seq"), dup_one_in) == 0).withColumn(
        "text", F.concat(F.col("text"), F.lit(" [dup-fork]"))
    )
    df = df.unionByName(dups).drop("_conv_num")

    # scramble physical order so nothing downstream can rely on seq order
    return df.repartition(F.col("seq") % 7).sortWithinPartitions(_h(seed + 9, "seq"))
