"""Shared plumbing for the driver-contract queries: table access, the
derived CDC change stream, and the memoized replayed vault.

The change stream derives deterministically from the driver's ``events``
table (so the DuckDB oracle can derive the identical stream in SQL):
conv_id from user_id, turn_idx from event_id, op from event_type, a binlog
envelope (seq, op, batch_id).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pyelt_spark.plans.pipeline import TranscriptVault
from pyelt_spark.streaming.runner import MicrobatchRunner


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _dec(c: str, scale: int = 4) -> Column:
    return F.col(c).cast(f"decimal(18,{scale})")


EVENTS_BATCH_SIZE = 2500


def derived_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    turn = (F.col("event_id") % 16).cast("int")
    role = (
        F.when(turn % 3 == 0, "user").when(turn % 3 == 1, "assistant").otherwise("tool")
    )
    return e.select(
        F.concat(F.lit("conv-"), F.col("user_id").cast("string")).alias("conv_id"),
        turn.alias("turn_idx"),
        role.alias("role"),
        F.concat(
            F.col("event_type"),
            F.lit(" "),
            F.round(F.col("value") * 100).cast("bigint").cast("string"),
        ).alias("text"),
        F.when(
            turn % 3 == 2,
            F.concat(F.lit("tool_"), F.regexp_extract("props", "[0-9]+", 0)),
        ).otherwise(F.lit(None).cast("string")).alias("tool"),
        F.col("ts"),
        F.col("event_id").alias("seq"),
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
        F.floor(F.col("event_id") / EVENTS_BATCH_SIZE).cast("long").alias("batch_id"),
    )


EV_CTE = f"""
ev AS (
  SELECT
    concat('conv-', CAST(user_id AS VARCHAR)) AS conv_id,
    CAST(event_id % 16 AS INTEGER) AS turn_idx,
    CASE CAST(event_id % 16 AS INTEGER) % 3
      WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
    concat(event_type, ' ', CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR)) AS text,
    CASE WHEN CAST(event_id % 16 AS INTEGER) % 3 = 2
      THEN concat('tool_', regexp_extract(props, '[0-9]+'))
      ELSE NULL END AS tool,
    ts,
    event_id AS seq,
    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
    CAST(floor(event_id / {EVENTS_BATCH_SIZE}) AS BIGINT) AS batch_id
  FROM events
)
"""


SQL_CONTENT = (
    "concat(coalesce(role, chr(0)), chr(31), coalesce(text, chr(0)), "
    "chr(31), coalesce(tool, chr(0)))"
)


_VAULTS: dict[str, TranscriptVault] = {}


def replayed_vault(spark: SparkSession, sf_dir: str) -> TranscriptVault:
    if sf_dir not in _VAULTS:
        root = tempfile.mkdtemp(prefix="pyelt_spark_vault_")
        vault = TranscriptVault(spark, root, num_buckets=16)
        ev = derived_events(spark, sf_dir).persist()
        MicrobatchRunner(vault).replay(ev)
        ev.unpersist()
        _VAULTS[sf_dir] = vault
    return _VAULTS[sf_dir]
