"""SCD2 merge-apply: hashdiff change detection + valid-from/valid-to upsert.

One microbatch of change events is applied to a key-bucketed state table in
a single pass that reproduces, functionally, the reference's per-table load
cycle (docs/source/05etl_proces.rst "Pipe.Run Detail stappen"):

reference step (file:line)                     → here
-------------------------------------------------------------------------
insert-new-or-changed via EXCEPT active
  (pyelt/process/etl.py:156-163)               → anti semantics via
                                                 hashdiff != state hashdiff
revision bump self-join (etl.py:168-171)       → max(_revision)+1 from the
                                                 pruned state read (no self-join)
close-out UPDATE _active/_finish_date
  (etl.py:174-177)                             → conditional column rewrite of
                                                 superseded active rows
delete detection (etl.py:180-183)              → 'D' tombstone events close the
                                                 active row with _deleted_runid
latest-per-key DISTINCT ON (etl.py:576)        → operators.dedup.latest_per_key
duplicate-key validation (etl.py:349-371)      → operators.validate
first-load fast path (etl.py:233-278)          → empty-state bootstrap branch

Scale shape: the batch is deduped with a map-side aggregate (skew-proof),
its affected buckets are computed, ONLY those buckets of state are read
(file-level pruning via the lake manifest), one shuffle joins batch↔state
on the hash key, and only those buckets are rewritten. Everything is JVM
column expressions — no per-row Python.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyelt_spark.functions.hashing import HashRecipe, hash_key
from pyelt_spark.operators.dedup import latest_per_key
from pyelt_spark.storage.lake import BUCKET_COL, LakeTable, bucket_expr


@dataclass
class ScdColumns:
    """System-column contract, mirroring the reference's CDC sextet
    (pyelt/process/ddl.py:334-348 and pyelt/datalayers/dv.py:38-62)."""

    key: str = "_key"                    # SHA-256 business-key hash (replaces _id SERIAL)
    runid: str = "_runid"                # batch / commit id
    active: str = "_active"
    insert_ts: str = "_insert_ts"        # _insert_date
    finish_ts: str = "_finish_ts"        # _finish_date
    deleted_runid: str = "_deleted_runid"
    revision: str = "_revision"
    load_seq: str = "_seq"               # max applied event seq (stale guard)
    hashdiff: str = "_hashdiff"
    hd_version: str = "_hd_version"      # hashdiff recipe version (schema evolution)
    source: str = "_source_system"

    def all(self) -> list[str]:
        return [
            self.key, self.runid, self.active, self.insert_ts, self.finish_ts,
            self.deleted_runid, self.revision, self.load_seq, self.hashdiff,
            self.hd_version, self.source,
        ]


@dataclass
class Scd2Merge:
    """Merge a deduped change-event batch into a LakeTable satellite.

    ``business_keys``: natural-key columns (e.g. conv_id, turn_idx).
    ``payload_cols``: attribute columns under hashdiff change detection.
    ``order_by``: event-order columns for latest-per-key (e.g. ["seq"]).
    ``op_col``: 'I' / 'U' / 'D' change-event op column (op absent → treat
    all as upserts).
    """

    business_keys: list[str]
    payload_cols: list[str]
    order_by: list[str]
    op_col: str | None = "op"
    ts_col: str = "ts"
    source_system: str = "events"
    sys: ScdColumns = field(default_factory=ScdColumns)

    # ------------------------------------------------------------------ hash

    def _with_keys_and_hashdiff(self, df: DataFrame, recipe: HashRecipe) -> DataFrame:
        cur = recipe.current_version
        df = df.withColumn(self.sys.key, hash_key(*self.business_keys))
        df = df.withColumn(self.sys.hashdiff, recipe.hashdiff_for(cur))
        df = df.withColumn(self.sys.hd_version, F.lit(cur))
        # hashdiffs under every older recipe version too, so a batch row can
        # be compared against a state row stored before a schema evolution
        # without re-versioning it (SURVEY §7.6).
        for v in sorted(recipe.versions):
            if v != cur:
                df = df.withColumn(f"{self.sys.hashdiff}_v{v}", recipe.hashdiff_for(v))
        return df

    def _evolved_recipe(self, batch: DataFrame, table: LakeTable) -> HashRecipe:
        recipe = table.recipe()
        batch_payload = [c for c in self.payload_cols if c in batch.columns]
        if recipe is None:
            return HashRecipe.initial(batch_payload)
        recipe.evolve(batch_payload)
        return recipe

    # ----------------------------------------------------------------- merge

    def apply_batch(
        self,
        table: LakeTable,
        events: DataFrame,
        batch_id: int,
        lineage: dict[str, Any] | None = None,
    ) -> dict[str, Any]:
        """Apply one microbatch; returns merge metrics. Idempotent: an
        already-committed batch_id is skipped (exactly-once)."""
        if batch_id in table.committed_batch_ids():
            return {"skipped_duplicate_batch": batch_id}

        recipe = self._evolved_recipe(events, table)
        payload = recipe.current_cols

        # 1. latest-per-key dedup (map-side aggregate; skew-proof)
        batch = latest_per_key(events, self.business_keys, self.order_by)
        batch = self._with_keys_and_hashdiff(batch, recipe)
        batch = batch.withColumn(BUCKET_COL, bucket_expr(self.sys.key, table.num_buckets))

        op = (
            F.col(self.op_col)
            if self.op_col and self.op_col in batch.columns
            else F.lit("U")
        )
        batch = batch.withColumn("_op", op)
        batch = batch.persist()  # feeds bucket discovery + join + metrics

        # 2. affected-bucket discovery → pruned state read
        affected = [r[0] for r in batch.select(BUCKET_COL).distinct().collect()]
        first_load = table.last_commit() is None or not table.last_commit().buckets
        s = self.sys

        if first_load:
            state = None
            per_key = None
        else:
            state = table.read(buckets=affected).persist()
            active = state.filter(F.col(s.active)).select(
                F.col(s.key), F.col(s.hashdiff).alias("_st_hd"),
                F.col(s.hd_version).alias("_st_hdv"),
                F.col(s.load_seq).alias("_st_seq"),
            )
            agg = state.groupBy(s.key).agg(
                F.max(s.revision).alias("_st_maxrev"),
                F.max(s.load_seq).alias("_st_maxseq"),
            )
            per_key = active.join(agg, s.key, "full")

        # 3. classify batch rows against active state
        if per_key is not None:
            j = batch.join(per_key, s.key, "left")
        else:
            j = batch.withColumn("_st_hd", F.lit(None).cast("string")) \
                     .withColumn("_st_hdv", F.lit(None).cast("int")) \
                     .withColumn("_st_seq", F.lit(None).cast("long")) \
                     .withColumn("_st_maxrev", F.lit(None).cast("long")) \
                     .withColumn("_st_maxseq", F.lit(None).cast("long"))

        # compare under the STATE row's recipe version (schema evolution):
        # equal old-recipe hashes count as unchanged ONLY if every column
        # added since that version is still null (null ≡ the value the old
        # row implicitly had) — otherwise the new column carries new info
        # and the row must version.
        cmp_hd = F.col(s.hashdiff)
        new_info = F.lit(False)
        cur_cols = recipe.current_cols
        for v in sorted(recipe.versions):
            if v != recipe.current_version:
                cmp_hd = F.when(
                    F.col("_st_hdv") == v, F.col(f"{s.hashdiff}_v{v}")
                ).otherwise(cmp_hd)
                added = [c for c in cur_cols if c not in recipe.versions[v]]
                if added:
                    any_nonnull = None
                    for c in added:
                        e = (F.col(c) if c in batch.columns else F.lit(None)).isNotNull()
                        any_nonnull = e if any_nonnull is None else (any_nonnull | e)
                    new_info = F.when(F.col("_st_hdv") == v, any_nonnull).otherwise(new_info)

        is_delete = F.col("_op") == F.lit("D")
        has_active = F.col("_st_hd").isNotNull()
        seq_expr = F.col(self.order_by[0]).cast("long")
        # out-of-order guard ACROSS batches: an event older than anything
        # already applied for its key is stale and must not regress state
        # (within-batch disorder is resolved by the dedup window; this
        # handles cross-batch/late delivery — north rule §2.8)
        stale = F.col("_st_maxseq").isNotNull() & (seq_expr < F.col("_st_maxseq"))
        unchanged = has_active & ~is_delete & (cmp_hd == F.col("_st_hd")) & ~new_info
        # content-equal but NEWER event: keep the row, advance its _seq so
        # later stale events can't sneak in behind it
        bump = unchanged & (seq_expr > F.col("_st_seq"))

        j = j.withColumn(
            "_verdict",
            F.when(stale, F.lit("stale"))
            .when(is_delete & has_active, F.lit("delete"))
            .when(is_delete, F.lit("noop"))
            .when(bump, F.lit("bump"))
            .when(unchanged, F.lit("noop"))
            .when(has_active, F.lit("update"))
            .otherwise(
                # no ACTIVE row; a prior revision may exist (re-insert after
                # delete) — revision keeps counting (etl.py:168-171 joins the
                # latest previous row, active or not)
                F.when(F.col("_st_maxrev").isNotNull(), F.lit("reinsert"))
                .otherwise(F.lit("insert"))
            ),
        ).persist()

        new_versions = (
            j.filter(F.col("_verdict").isin("insert", "update", "reinsert"))
            .select(
                F.col(s.key),
                *[F.col(c) for c in self.business_keys],
                *[
                    (F.col(c) if c in batch.columns else F.lit(None)).alias(c)
                    for c in payload
                ],
                F.lit(batch_id).cast("long").alias(s.runid),
                F.lit(True).alias(s.active),
                F.col(self.ts_col).cast("timestamp").alias(s.insert_ts),
                F.lit(None).cast("timestamp").alias(s.finish_ts),
                F.lit(None).cast("long").alias(s.deleted_runid),
                (F.coalesce(F.col("_st_maxrev") + 1, F.lit(0)).cast("long")).alias(s.revision),
                seq_expr.alias(s.load_seq),
                F.col(s.hashdiff),
                F.col(s.hd_version),
                F.lit(self.source_system).alias(s.source),
                F.col(BUCKET_COL),
            )
        )

        closers = (
            j.filter(F.col("_verdict").isin("update", "delete", "bump"))
            .select(
                F.col(s.key).alias("_close_key"),
                F.col("_verdict").alias("_close_verdict"),
                F.col(self.ts_col).cast("timestamp").alias("_close_ts"),
                seq_expr.alias("_close_seq"),
            )
        )

        # ONE aggregation drives verdict counts, write-bucket discovery and
        # per-bucket lineage (replaces four separate driver round-trips)
        vc = (
            j.groupBy("_verdict", BUCKET_COL).agg(F.count("*").alias("n")).collect()
        )
        metrics_rows: dict[str, int] = {}
        for r in vc:
            metrics_rows[r["_verdict"]] = metrics_rows.get(r["_verdict"], 0) + r["n"]

        # 4. rewrite ONLY buckets holding changed/deleted/seq-bumped keys (a
        #    no-op-heavy stream must not rewrite every bucket it touched)
        write_buckets = sorted(
            {r[BUCKET_COL] for r in vc if r["_verdict"] not in ("noop", "stale")}
        )
        metrics = {
            "batch_id": batch_id,
            "deduped_keys": sum(metrics_rows.values()),
            "inserted": metrics_rows.get("insert", 0) + metrics_rows.get("reinsert", 0),
            "updated": metrics_rows.get("update", 0),
            "deleted": metrics_rows.get("delete", 0),
            "unchanged": metrics_rows.get("noop", 0) + metrics_rows.get("bump", 0),
            "stale": metrics_rows.get("stale", 0),
            "buckets_read": sorted(affected),
            "buckets_written": write_buckets,
            "batch_keys_per_bucket": {
                str(r[BUCKET_COL]): sum(
                    x["n"] for x in vc if x[BUCKET_COL] == r[BUCKET_COL]
                )
                for r in vc
            },
            "lineage": lineage or {},
        }
        if not write_buckets:
            # nothing changed — commit only the batch-id bookkeeping
            table.commit(None, [], batch_id, recipe=recipe, metrics=metrics)
            batch.unpersist()
            j.unpersist()
            if state is not None:
                state.unpersist()
            return metrics

        new_versions = new_versions.filter(F.col(BUCKET_COL).isin(write_buckets))
        if state is not None:
            state = state.filter(F.col(BUCKET_COL).isin(write_buckets))
            is_bump = F.col("_close_verdict") == "bump"
            closed = (
                state.join(closers, state[s.key] == closers["_close_key"], "left")
                .withColumn(
                    "_closing",
                    F.col("_close_key").isNotNull() & F.col(s.active) & ~is_bump,
                )
                .withColumn(
                    s.load_seq,
                    F.when(
                        F.col("_close_key").isNotNull() & F.col(s.active) & is_bump,
                        F.col("_close_seq"),
                    ).otherwise(F.col(s.load_seq)),
                )
                .withColumn(
                    s.finish_ts,
                    F.when(F.col("_closing"), F.col("_close_ts")).otherwise(F.col(s.finish_ts)),
                )
                .withColumn(
                    s.deleted_runid,
                    F.when(
                        F.col("_closing") & (F.col("_close_verdict") == "delete"),
                        F.lit(batch_id).cast("long"),
                    ).otherwise(F.col(s.deleted_runid)),
                )
                .withColumn(
                    s.active,
                    F.when(F.col("_closing"), F.lit(False)).otherwise(F.col(s.active)),
                )
                .drop("_close_key", "_close_verdict", "_close_ts", "_close_seq", "_closing")
            )
            # additive schema evolution: older state may predate new payload cols
            for c in new_versions.columns:
                if c not in closed.columns:
                    closed = closed.withColumn(
                        c, F.lit(None).cast(dict(new_versions.dtypes)[c])
                    )
            new_bucket_data = closed.select(new_versions.columns).unionByName(new_versions)
        else:
            new_bucket_data = new_versions

        table.commit(
            new_bucket_data,
            affected_buckets=write_buckets,
            batch_id=batch_id,
            recipe=recipe,
            metrics=metrics,
        )
        batch.unpersist()
        j.unpersist()
        if state is not None:
            state.unpersist()
        return metrics
