"""Datamart layer: star-schema dims + facts derived from the vault.

The reference's DM layer (pyelt/datalayers/dm.py:1-110) delegates dim/fact
construction to pygrametl over the DV tables; here the star schema is a
pair of declarative DataFrame builders over the vault — the dimension is
the hub enriched with current-state attributes, the fact is the SCD2
version history keyed by the dimension's hash key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyelt_spark.plans.pipeline import TranscriptVault


def dim_conversation(vault: TranscriptVault) -> DataFrame:
    """Conversation dimension: hub key + current activity stats."""
    cur = vault.sat.current().groupBy("conv_id").agg(
        F.count("*").alias("n_active_turns"),
        F.max("_revision").alias("max_revision"),
    )
    return (
        vault.hub.read()
        .select(F.col("_key").alias("conversation_key"), "conv_id", "_insert_ts")
        .join(cur, "conv_id", "left")
        .na.fill({"n_active_turns": 0, "max_revision": 0})
    )


def scd2_dim(
    sat_read: DataFrame,
    nk: list[str],
    attrs: list[str],
    runid_col: str = "_runid",
    insert_ts: str = "_insert_ts",
    finish_ts: str = "_finish_ts",
) -> DataFrame:
    """Generic type-2 dimension from any SCD2 satellite read: one row per
    stored version with a deterministic surrogate key and a validity
    interval (the reusable dim builder the reference delegates to pygrametl,
    dm.py:1-110 — here a pure projection, no loader loop).

    Surrogate = sha256(natural key ‖ '|' ‖ runid): reproducible across
    replays and engines (the oracle computes the identical key), unlike a
    sequence. ``valid_to`` is NULL for the open version.
    """
    key = F.sha2(
        F.concat_ws(
            "|", *[F.col(c).cast("string") for c in nk], F.col(runid_col).cast("string")
        ),
        256,
    )
    return sat_read.select(
        key.alias("dim_key"),
        *[F.col(c) for c in nk],
        *[F.col(c) for c in attrs],
        F.col(runid_col).alias("version_run"),
        F.col(insert_ts).alias("valid_from"),
        F.col(finish_ts).alias("valid_to"),
    )


def fact_turn_versions(vault: TranscriptVault) -> DataFrame:
    """Version fact: one row per (conversation, load run) with version and
    delete counts — the grain a load-monitoring datamart wants."""
    s = vault.sat_merge.sys
    hist = vault.sat.read()
    return (
        hist.groupBy(
            F.sha2(
                F.coalesce(F.col("conv_id").cast("string"), F.lit("\x00")), 256
            ).alias("conversation_key"),
            F.col(s.runid).alias("run_id"),
        )
        .agg(
            F.count("*").alias("n_versions"),
            F.sum(F.when(F.col(s.deleted_runid).isNotNull(), 1).otherwise(0)).alias(
                "n_deleted"
            ),
        )
    )
