"""CDC / data-vault driver queries: merge-apply replay reads, change
detection, validation, deletes, projections and the datamart fact — each
with its DuckDB oracle twin (closed-form SQL over the same derived event
stream, no engine code in the oracle)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from pyelt_spark.functions.hashing import hashdiff
from pyelt_spark.operators.dedup import latest_per_key
from pyelt_spark.queries.common import (
    EV_CTE,
    SQL_CONTENT,
    _dec,
    _t,
    derived_events,
    replayed_vault,
)


def q_cdc_current_turns(spark, sf_dir):
    """Final current-state after full engine replay: per-turn text equality
    under stable turn ordering (BASELINE.json invariant)."""
    v = replayed_vault(spark, sf_dir)
    return v.current_turns().select("conv_id", "turn_idx", "role", "text", "tool")


SQL_CDC_CURRENT_TURNS = f"""
WITH {EV_CTE},
latest AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY seq DESC) AS rn
  FROM ev
)
SELECT conv_id, turn_idx, role, text, tool
FROM latest WHERE rn = 1 AND op <> 'D'
"""


def q_cdc_scd2_history(spark, sf_dir):
    """Full SCD2 satellite after replay: every version with _runid,
    _revision, _active, _insert_ts — the bit-for-bit replay check."""
    v = replayed_vault(spark, sf_dir)
    s = v.sat_merge.sys
    return v.sat.read().select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "tool",
        F.col(s.runid).alias("_runid"),
        F.col(s.revision).alias("_revision"),
        F.col(s.active).alias("_active"),
        F.col(s.insert_ts).alias("_insert_ts"),
    )


SQL_CDC_SCD2_HISTORY = f"""
WITH {EV_CTE},
cand AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx, batch_id ORDER BY seq DESC) AS rn
  FROM ev
),
c1 AS (SELECT * FROM cand WHERE rn = 1),
chain AS (
  SELECT *,
    CASE WHEN op = 'D' THEN NULL ELSE {SQL_CONTENT} END AS content,
    lag(CASE WHEN op = 'D' THEN NULL ELSE {SQL_CONTENT} END)
      OVER (PARTITION BY conv_id, turn_idx ORDER BY batch_id) AS prev_content
  FROM c1
),
applied AS (
  SELECT * FROM chain
  WHERE op <> 'D' AND (content IS DISTINCT FROM prev_content)
),
lasta AS (SELECT conv_id, turn_idx, max(batch_id) AS la FROM applied GROUP BY 1, 2),
lastd AS (SELECT conv_id, turn_idx, max(batch_id) AS ld FROM c1 WHERE op = 'D' GROUP BY 1, 2)
SELECT a.conv_id, a.turn_idx, a.role, a.text, a.tool,
  a.batch_id AS _runid,
  row_number() OVER (PARTITION BY a.conv_id, a.turn_idx ORDER BY a.batch_id) - 1 AS _revision,
  (a.batch_id = lasta.la AND (lastd.ld IS NULL OR lastd.ld < lasta.la)) AS _active,
  a.ts AS _insert_ts
FROM applied a
JOIN lasta USING (conv_id, turn_idx)
LEFT JOIN lastd USING (conv_id, turn_idx)
"""


def q_cdc_hub_conversations(spark, sf_dir):
    v = replayed_vault(spark, sf_dir)
    return v.hub.read().select("_key", "type", "bk", "conv_id", "_runid", "_insert_ts")


SQL_CDC_HUB = f"""
WITH {EV_CTE}
SELECT sha256(conv_id) AS _key, 'conversation' AS type, conv_id AS bk, conv_id,
  min(batch_id) AS _runid, min(ts) AS _insert_ts
FROM ev WHERE op <> 'D'
GROUP BY conv_id
"""


def q_cdc_tool_link(spark, sf_dir):
    v = replayed_vault(spark, sf_dir)
    return v.link.read().select(
        "_key", "bk", "conv_id", "tool", "fk_conversation", "fk_tool",
        "_runid", "_insert_ts",
    )


SQL_CDC_TOOL_LINK = f"""
WITH {EV_CTE}
SELECT sha256(concat(conv_id, chr(31), tool)) AS _key,
  concat(conv_id, '.', tool) AS bk, conv_id, tool,
  sha256(conv_id) AS fk_conversation, sha256(tool) AS fk_tool,
  min(batch_id) AS _runid, min(ts) AS _insert_ts
FROM ev WHERE op <> 'D' AND tool IS NOT NULL
GROUP BY conv_id, tool
"""


def q_cdc_latest_per_key(spark, sf_dir):
    """The dedup operator standalone (DISTINCT ON semantics, etl.py:576)."""
    ev = derived_events(spark, sf_dir)
    out = latest_per_key(ev, ["conv_id", "turn_idx"], ["seq"])
    return out.select(
        "conv_id", "turn_idx",
        F.col("seq").alias("last_seq"), F.col("op").alias("last_op"), "text",
    )


SQL_CDC_LATEST_PER_KEY = f"""
WITH {EV_CTE},
latest AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY seq DESC) AS rn
  FROM ev
)
SELECT conv_id, turn_idx, seq AS last_seq, op AS last_op, text
FROM latest WHERE rn = 1
"""


def q_cdc_changed_rows(spark, sf_dir):
    """Hashdiff change-mark operator: events whose payload differs from the
    key's previous event (etl.py:236-238 semantics as a change-log scan)."""
    from pyspark.sql import Window

    ev = derived_events(spark, sf_dir).filter(F.col("op") != "D")
    hd = hashdiff(["role", "text", "tool"])
    w = Window.partitionBy("conv_id", "turn_idx").orderBy("seq")
    out = (
        ev.withColumn("_hd", hd)
        .withColumn("_prev", F.lag("_hd").over(w))
        .filter(F.col("_prev").isNull() | (F.col("_hd") != F.col("_prev")))
    )
    return out.select("conv_id", "turn_idx", "seq", "text")


SQL_CDC_CHANGED_ROWS = f"""
WITH {EV_CTE},
u AS (SELECT * FROM ev WHERE op <> 'D'),
chain AS (
  SELECT *, {SQL_CONTENT} AS content,
    lag({SQL_CONTENT}) OVER (PARTITION BY conv_id, turn_idx ORDER BY seq) AS prev_content
  FROM u
)
SELECT conv_id, turn_idx, seq, text
FROM chain WHERE prev_content IS NULL OR content <> prev_content
"""


def q_cdc_dup_key_validation(spark, sf_dir):
    """Duplicate-key validation (etl.py:349-371): (batch, key) groups with
    more than one event."""
    ev = derived_events(spark, sf_dir)
    return (
        ev.groupBy("batch_id", "conv_id", "turn_idx")
        .agg(F.count("*").alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


SQL_CDC_DUP_KEY = f"""
WITH {EV_CTE}
SELECT batch_id, conv_id, turn_idx, count(*) AS n_rows
FROM ev GROUP BY 1, 2, 3 HAVING count(*) > 1
"""


def q_cdc_delete_detection(spark, sf_dir):
    """Keys whose final event is a tombstone (etl.py:180-183)."""
    ev = derived_events(spark, sf_dir)
    last = latest_per_key(ev, ["conv_id", "turn_idx"], ["seq"])
    return last.filter(F.col("op") == "D").select(
        "conv_id", "turn_idx", F.col("seq").alias("deleted_seq")
    )


SQL_CDC_DELETES = f"""
WITH {EV_CTE},
latest AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY seq DESC) AS rn
  FROM ev
)
SELECT conv_id, turn_idx, seq AS deleted_seq
FROM latest WHERE rn = 1 AND op = 'D'
"""


def q_cdc_validation(spark, sf_dir):
    """Row-rule + duplicate-key validation (etl.py:349-388): the invalid
    rows with their accumulated messages."""
    from pyelt_spark.operators.validate import RowRule, apply_rules, mark_duplicate_keys

    ev = derived_events(spark, sf_dir)
    out = apply_rules(ev, [RowRule(F.col("turn_idx") >= 14, "turn index out of range")])
    out = mark_duplicate_keys(out, ["conv_id", "turn_idx"], batch_col="batch_id")
    return out.filter(~F.col("_valid")).select(
        "seq", "conv_id", "turn_idx", "_validation_msg"
    )


SQL_CDC_VALIDATION = f"""
WITH {EV_CTE},
d AS (
  SELECT *, count(*) OVER (PARTITION BY batch_id, conv_id, turn_idx) AS n FROM ev
)
SELECT seq, conv_id, turn_idx,
  concat_ws('; ',
    CASE WHEN turn_idx >= 14 THEN 'turn index out of range' END,
    CASE WHEN n > 1 THEN 'duplicate key' END) AS _validation_msg
FROM d WHERE turn_idx >= 14 OR n > 1
"""


def q_cdc_snapshot_deletes(spark, sf_dir):
    """Full-snapshot delete detection (etl.py:180-183): apply batch 0 as
    state, treat batch 1's keys as a complete snapshot, emit missing keys."""
    import tempfile

    from pyelt_spark.operators.scd2 import Scd2Merge, Scd2Table, snapshot_delete_events
    from pyelt_spark.plans.pipeline import BUSINESS_KEYS, PAYLOAD_COLS

    ev = derived_events(spark, sf_dir)
    t = Scd2Table(spark, tempfile.mkdtemp(prefix="snapdel_"), num_buckets=8)
    m = Scd2Merge(
        business_keys=BUSINESS_KEYS, payload_cols=PAYLOAD_COLS, order_by=["seq"]
    )
    m.apply_batch(t, ev.filter(F.col("batch_id") == 0), batch_id=0)
    snapshot = ev.filter(F.col("batch_id") == 1)
    dels = snapshot_delete_events(t, snapshot, m, seq_value=1)
    return dels.select("conv_id", "turn_idx")


SQL_CDC_SNAPSHOT_DELETES = f"""
WITH {EV_CTE},
l0 AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY seq DESC) AS rn
  FROM ev WHERE batch_id = 0
),
alive AS (SELECT conv_id, turn_idx FROM l0 WHERE rn = 1 AND op <> 'D')
SELECT conv_id, turn_idx FROM alive
EXCEPT
SELECT DISTINCT conv_id, turn_idx FROM ev WHERE batch_id = 1
"""


def q_cdc_record_status(spark, sf_dir):
    """RecordStatusSat analog: currently-deleted keys with the deleting run
    (dv.py:85-86, etl.py:495-505)."""
    v = replayed_vault(spark, sf_dir)
    return v.record_status().select("conv_id", "turn_idx", "deleted_runid")


SQL_CDC_RECORD_STATUS = f"""
WITH {EV_CTE},
cand AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx, batch_id ORDER BY seq DESC) AS rn
  FROM ev
),
c1 AS (SELECT * FROM cand WHERE rn = 1),
chain AS (
  SELECT *,
    CASE WHEN op = 'D' THEN NULL ELSE {SQL_CONTENT} END AS content,
    lag(CASE WHEN op = 'D' THEN NULL ELSE {SQL_CONTENT} END)
      OVER (PARTITION BY conv_id, turn_idx ORDER BY batch_id) AS prev_content
  FROM c1
),
applied AS (
  SELECT conv_id, turn_idx, batch_id FROM chain
  WHERE op <> 'D' AND (content IS DISTINCT FROM prev_content)
),
lasta AS (SELECT conv_id, turn_idx, max(batch_id) AS la FROM applied GROUP BY 1, 2),
firstd AS (
  SELECT c.conv_id, c.turn_idx, min(c.batch_id) AS deleted_runid
  FROM c1 c JOIN lasta USING (conv_id, turn_idx)
  WHERE c.op = 'D' AND c.batch_id > lasta.la
  GROUP BY 1, 2
)
SELECT conv_id, turn_idx, deleted_runid FROM firstd
"""


def q_mapping_projection(spark, sf_dir):
    """Field-mapping projection parity (mappings/base.py:46-78): JSON
    construction (json_build_object analog, sor_to_dv_mappings.py:145-150),
    array literal folded to text (:509-513), string funcs + casts + constant
    columns used in reference mappings (tests/_mappings.py:45-68)."""
    ev = derived_events(spark, sf_dir)
    return ev.select(
        "seq",
        F.to_json(
            F.struct("conv_id", "turn_idx", "role", "tool"),
            {"ignoreNullFields": "false"},
        ).alias("payload_json"),
        F.array_join(F.array(F.col("role"), F.col("op")), ",").alias("tags"),
        F.upper(F.col("role")).alias("role_upper"),
        F.substring(F.col("conv_id"), 1, 6).alias("conv_prefix"),
        F.coalesce(F.col("tool"), F.lit("none")).alias("tool_or_none"),
        F.lit("pyelt_spark").alias("source_const"),
        F.col("turn_idx").cast("string").alias("turn_txt"),
    )


SQL_MAPPING_PROJECTION = f"""
WITH {EV_CTE}
SELECT seq,
  to_json(struct_pack(conv_id := conv_id, turn_idx := turn_idx, role := role, tool := tool)) AS payload_json,
  array_to_string([role, op], ',') AS tags,
  upper(role) AS role_upper,
  substr(conv_id, 1, 6) AS conv_prefix,
  coalesce(tool, 'none') AS tool_or_none,
  'pyelt_spark' AS source_const,
  CAST(turn_idx AS VARCHAR) AS turn_txt
FROM ev
"""


def q_cdc_set_difference(spark, sf_dir):
    """EXCEPT-based change capture (the reference file-load path,
    etl.py:156-163): batch-0 payload rows not present in batch 1
    (multiset semantics — exceptAll)."""
    ev = derived_events(spark, sf_dir)
    p = ["conv_id", "turn_idx", "role", "text"]
    b0 = ev.filter(F.col("batch_id") == 0).select(*p)
    b1 = ev.filter(F.col("batch_id") == 1).select(*p)
    return b0.exceptAll(b1)


SQL_CDC_SET_DIFFERENCE = f"""
WITH {EV_CTE}
SELECT conv_id, turn_idx, role, text FROM ev WHERE batch_id = 0
EXCEPT ALL
SELECT conv_id, turn_idx, role, text FROM ev WHERE batch_id = 1
"""


def q_datamart_fact_turn_versions(spark, sf_dir):
    """Datamart fact over the replayed vault: version counts per
    (conversation, run) — the DM layer analog (dm.py:1-110)."""
    from pyelt_spark.plans.datamart import fact_turn_versions

    v = replayed_vault(spark, sf_dir)
    return fact_turn_versions(v)


SQL_DATAMART_FACT = f"""
WITH {EV_CTE},
cand AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx, batch_id ORDER BY seq DESC) AS rn
  FROM ev
),
c1 AS (SELECT * FROM cand WHERE rn = 1),
chain AS (
  SELECT *,
    CASE WHEN op = 'D' THEN NULL ELSE {SQL_CONTENT} END AS content,
    lag(CASE WHEN op = 'D' THEN NULL ELSE {SQL_CONTENT} END)
      OVER (PARTITION BY conv_id, turn_idx ORDER BY batch_id) AS prev_content
  FROM c1
),
applied AS (
  SELECT conv_id, turn_idx, batch_id FROM chain
  WHERE op <> 'D' AND (content IS DISTINCT FROM prev_content)
),
versions AS (
  SELECT conv_id, turn_idx, batch_id,
    lead(batch_id) OVER (PARTITION BY conv_id, turn_idx ORDER BY batch_id) AS nxt
  FROM applied
)
-- a version is delete-closed iff a tombstone lands strictly between it and
-- the next applied version (the engine sets _deleted_runid on exactly that
-- row; later deletes on an already-dead key no-op)
SELECT sha256(v.conv_id) AS conversation_key, v.batch_id AS run_id,
  count(*) AS n_versions,
  CAST(sum(CASE WHEN EXISTS (
        SELECT 1 FROM c1 d
        WHERE d.conv_id = v.conv_id AND d.turn_idx = v.turn_idx
          AND d.op = 'D' AND d.batch_id > v.batch_id
          AND (v.nxt IS NULL OR d.batch_id < v.nxt)
      ) THEN 1 ELSE 0 END) AS BIGINT) AS n_deleted
FROM versions v
GROUP BY 1, 2
"""


QUERIES = {
    "cdc_current_turns": q_cdc_current_turns,
    "cdc_scd2_history": q_cdc_scd2_history,
    "cdc_hub_conversations": q_cdc_hub_conversations,
    "cdc_tool_link": q_cdc_tool_link,
    "cdc_latest_per_key": q_cdc_latest_per_key,
    "cdc_changed_rows": q_cdc_changed_rows,
    "cdc_dup_key_validation": q_cdc_dup_key_validation,
    "cdc_delete_detection": q_cdc_delete_detection,
    "cdc_validation": q_cdc_validation,
    "cdc_snapshot_deletes": q_cdc_snapshot_deletes,
    "cdc_record_status": q_cdc_record_status,
    "mapping_projection": q_mapping_projection,
    "cdc_set_difference": q_cdc_set_difference,
    "datamart_fact_turn_versions": q_datamart_fact_turn_versions,
}

ORACLES = {
    "cdc_current_turns": SQL_CDC_CURRENT_TURNS,
    "cdc_scd2_history": SQL_CDC_SCD2_HISTORY,
    "cdc_hub_conversations": SQL_CDC_HUB,
    "cdc_tool_link": SQL_CDC_TOOL_LINK,
    "cdc_latest_per_key": SQL_CDC_LATEST_PER_KEY,
    "cdc_changed_rows": SQL_CDC_CHANGED_ROWS,
    "cdc_dup_key_validation": SQL_CDC_DUP_KEY,
    "cdc_delete_detection": SQL_CDC_DELETES,
    "cdc_validation": SQL_CDC_VALIDATION,
    "cdc_snapshot_deletes": SQL_CDC_SNAPSHOT_DELETES,
    "cdc_record_status": SQL_CDC_RECORD_STATUS,
    "mapping_projection": SQL_MAPPING_PROJECTION,
    "cdc_set_difference": SQL_CDC_SET_DIFFERENCE,
    "datamart_fact_turn_versions": SQL_DATAMART_FACT,
}
