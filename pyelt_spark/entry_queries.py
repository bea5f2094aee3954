"""Driver-contract queries: Spark implementations + DuckDB oracle SQL.

Each query key maps to (a) a Spark callable ``(spark, sf_dir) -> DataFrame``
that exercises engine code (hash functions, latest-per-key, the full vault
replay) and (b) an ANSI-SQL oracle string DuckDB runs on the same parquet
tables. Column names/aliases match exactly on both sides; float aggregates
are decimal-cast (order-independent, exact) or rounded doubles so the
driver's value-hash compare is stable.

The CDC queries run over a transcript change-event stream DERIVED
deterministically from the driver's ``events`` table (so the oracle can
derive the identical stream in SQL): conv_id from user_id, turn_idx from
event_id, op from event_type, a binlog envelope (seq, op, batch_id).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pyelt_spark.functions.hashing import hashdiff
from pyelt_spark.operators.dedup import latest_per_key
from pyelt_spark.operators.docdedup import simhash_oracle_sql
from pyelt_spark.plans.pipeline import TranscriptVault
from pyelt_spark.streaming.runner import MicrobatchRunner

# --------------------------------------------------------------------------
# shared table access
# --------------------------------------------------------------------------


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _dec(c: str, scale: int = 4) -> Column:
    return F.col(c).cast(f"decimal(18,{scale})")


# --------------------------------------------------------------------------
# derived transcript change-event stream (Spark + SQL twins)
# --------------------------------------------------------------------------

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

# payload content canonicalization twin of functions.hashing (SEP=\\x1f=chr(31),
# NULL_TOKEN=\\x00=chr(0))
SQL_CONTENT = (
    "concat(coalesce(role, chr(0)), chr(31), coalesce(text, chr(0)), "
    "chr(31), coalesce(tool, chr(0)))"
)


# --------------------------------------------------------------------------
# vault replay (memoized per sf_dir)
# --------------------------------------------------------------------------

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


# --------------------------------------------------------------------------
# CDC queries (engine replay vs SQL oracle)
# --------------------------------------------------------------------------


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


# --------------------------------------------------------------------------
# relational coverage (TPC-H-shaped; decimal-exact aggregates)
# --------------------------------------------------------------------------


def q_pricing_summary(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1999-12-01").cast("timestamp")
    )
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            # sums run in DECIMAL (exact, order-independent) and only the
            # final projection casts to double — the driver value-hashes raw
            # cell renderings and DECIMAL stringifies differently across
            # engines, while identical IEEE doubles render identically
            F.round(F.sum(_dec("l_quantity")).cast("double"), 6).alias("sum_qty"),
            F.round(F.sum(_dec("l_extendedprice")).cast("double"), 6).alias("sum_base_price"),
            F.round(
                F.sum(
                    _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))
                ).cast("double"),
                6,
            ).alias("sum_disc_price"),
            F.count("*").alias("count_order"),
            F.round(
                F.sum(_dec("l_quantity")).cast("double") / F.count("*"), 6
            ).alias("avg_qty"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 6) AS sum_qty,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 6) AS sum_base_price,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 6) AS sum_disc_price,
  count(*) AS count_order,
  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*), 6) AS avg_qty
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1999-12-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_shipping_priority(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            # order/limit on the EXACT decimal sum (ties at the cutoff must
            # resolve identically in both engines), project rounded double
            F.sum(
                _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))
            ).alias("_revenue_exact")
        )
        .orderBy(F.desc("_revenue_exact"), "l_orderkey")
        .limit(10)
        .select(
            "l_orderkey",
            "o_orderdate",
            "o_orderpriority",
            F.round(F.col("_revenue_exact").cast("double"), 6).alias("revenue"),
        )
    )


SQL_SHIPPING_PRIORITY = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
  round(CAST(revenue_exact AS DOUBLE), 6) AS revenue
FROM (
  SELECT l_orderkey, o_orderdate, o_orderpriority,
    sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS revenue_exact
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment = 'BUILDING'
  GROUP BY l_orderkey, o_orderdate, o_orderpriority
  ORDER BY revenue_exact DESC, l_orderkey
  LIMIT 10
)
"""


def q_nation_revenue(spark, sf_dir):
    """Broadcast-join chain over the dimension tables (small dims are
    broadcast — no shuffle of lineitem beyond the final agg)."""
    r = F.broadcast(_t(spark, sf_dir, "region"))
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(
                F.sum(
                    _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))
                ).cast("double"),
                6,
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("r_name", "n_name")
    )


SQL_NATION_REVENUE = """
SELECT r_name, n_name,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 6) AS revenue,
  count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name
"""


def q_top_orders_per_customer(spark, sf_dir):
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rank_in_cust", F.row_number().over(w))
        .filter(F.col("rank_in_cust") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank_in_cust")
    )


SQL_TOP_ORDERS_PER_CUSTOMER = """
SELECT o_custkey, o_orderkey, o_totalprice, rank_in_cust FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank_in_cust
  FROM orders
) WHERE rank_in_cust <= 3
"""


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


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

QUERIES = {
    "cdc_current_turns": q_cdc_current_turns,
    "cdc_scd2_history": q_cdc_scd2_history,
    "cdc_hub_conversations": q_cdc_hub_conversations,
    "cdc_tool_link": q_cdc_tool_link,
    "cdc_latest_per_key": q_cdc_latest_per_key,
    "cdc_changed_rows": q_cdc_changed_rows,
    "cdc_dup_key_validation": q_cdc_dup_key_validation,
    "cdc_delete_detection": q_cdc_delete_detection,
    "q1_pricing_summary": q_pricing_summary,
    "q3_shipping_priority": q_shipping_priority,
    "q5_nation_revenue": q_nation_revenue,
    "top_orders_per_customer": q_top_orders_per_customer,
    "events_hourly_rollup": q_events_hourly_rollup,
    "events_sessionize": q_events_sessionize,
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
    "q1_pricing_summary": SQL_PRICING_SUMMARY,
    "q3_shipping_priority": SQL_SHIPPING_PRIORITY,
    "q5_nation_revenue": SQL_NATION_REVENUE,
    "top_orders_per_customer": SQL_TOP_ORDERS_PER_CUSTOMER,
    "events_hourly_rollup": SQL_EVENTS_HOURLY,
    "events_sessionize": SQL_EVENTS_SESSIONIZE,
}


# --------------------------------------------------------------------------
# training-data pipeline: documents (text analysis + dedup)
# --------------------------------------------------------------------------

# SQL twin of functions.text.normalized
SQL_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_EN = "['the','a','of','and','to','in','is','that','it','for']"
_DE = "['der','die','das','und','ist','ein','zu','mit','von','nicht']"
_FR = "['le','la','les','et','est','un','une','de','que','pour']"
_ES = "['el','la','los','y','es','un','una','de','que','por']"


def q_doc_token_count(spark, sf_dir):
    from pyelt_spark.functions.text import token_count

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", token_count("text").alias("n_tokens"))


SQL_DOC_TOKEN_COUNT = """
SELECT doc_id, len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
FROM documents
"""


def q_doc_quality(spark, sf_dir):
    from pyelt_spark.functions.text import quality_score

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", quality_score("text").alias("quality"))


SQL_DOC_QUALITY = f"""
WITH t AS (
  SELECT doc_id, text,
    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) AS n_tok,
    CAST(len(text) - len(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) AS n_punct,
    CAST(len(list_filter(string_split({SQL_NORM}, ' '), x -> list_contains({_EN}, x))) AS DOUBLE) AS n_stop
  FROM documents
)
SELECT doc_id,
  round((
    least(n_tok / 100.0, 1.0)
    + (1.0 - least(n_punct / greatest(CAST(len(text) AS DOUBLE), 1.0) * 5, 1.0))
    + least(n_stop / greatest(n_tok, 1.0) * 4, 1.0)
  ) / 3, 6) AS quality
FROM t
"""


def q_doc_langid(spark, sf_dir):
    from pyelt_spark.functions.text import langid

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", langid("text").alias("lang_guess"))


SQL_DOC_LANGID = f"""
WITH t AS (
  SELECT doc_id, lang, string_split({SQL_NORM}, ' ') AS w FROM documents
),
h AS (
  SELECT doc_id, lang,
    len(list_filter(w, x -> list_contains({_EN}, x))) AS en,
    len(list_filter(w, x -> list_contains({_DE}, x))) AS de,
    len(list_filter(w, x -> list_contains({_FR}, x))) AS fr,
    len(list_filter(w, x -> list_contains({_ES}, x))) AS es
  FROM t
)
SELECT doc_id, lang,
  CASE
    WHEN en > 0 AND en = greatest(en, de, fr, es) THEN 'en'
    WHEN de > 0 AND de = greatest(en, de, fr, es) THEN 'de'
    WHEN fr > 0 AND fr = greatest(en, de, fr, es) THEN 'fr'
    WHEN es > 0 AND es = greatest(en, de, fr, es) THEN 'es'
    ELSE 'und' END AS lang_guess
FROM h
"""


def q_doc_fingerprint(spark, sf_dir):
    from pyelt_spark.functions.text import fingerprint

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint("text").alias("fingerprint"))


SQL_DOC_FINGERPRINT = f"""
SELECT doc_id, sha256({SQL_NORM}) AS fingerprint FROM documents
"""


def q_dedup_exact(spark, sf_dir):
    from pyelt_spark.operators.docdedup import exact_dedup

    return exact_dedup(_t(spark, sf_dir, "documents"))


SQL_DEDUP_EXACT = f"""
SELECT sha256({SQL_NORM}) AS fingerprint,
  min(doc_id) AS canonical_id, count(*) AS n_docs
FROM documents GROUP BY 1
"""

# shared SQL fragment: distinct word-3-gram shingles per doc
SQL_SHINGLES3 = f"""
norm AS (SELECT doc_id, {SQL_NORM} AS t FROM documents),
toks AS (SELECT doc_id, string_split(t, ' ') AS w FROM norm),
sh AS (
  SELECT doc_id,
    list_distinct(list_transform(
      range(0, greatest(len(w) - 3, 0) + 1),
      i -> array_to_string(list_slice(w, i + 1, i + 3), ' ')
    )) AS s
  FROM toks
)
"""


def q_dedup_ngram_jaccard(spark, sf_dir):
    from pyelt_spark.operators.docdedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), n=3, threshold=0.12, max_docfreq=50
    )


SQL_DEDUP_NGRAM_JACCARD = f"""
WITH {SQL_SHINGLES3},
inv AS (SELECT doc_id, unnest(s) AS sg FROM sh),
rare AS (SELECT sg, list(doc_id) AS ids FROM inv GROUP BY sg HAVING count(*) <= 50),
p1 AS (SELECT unnest(ids) AS a, ids FROM rare),
pairs AS (
  SELECT a, unnest(ids) AS b FROM p1
),
cand AS (SELECT a, b FROM pairs WHERE a < b GROUP BY a, b),
sz AS (SELECT doc_id, len(s) AS n FROM sh)
SELECT c.a AS doc_a, c.b AS doc_b,
  round(CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
        / CAST(za.n + zb.n - len(list_intersect(sa.s, sb.s)) AS DOUBLE), 6) AS jaccard
FROM cand c
JOIN sh sa ON sa.doc_id = c.a
JOIN sh sb ON sb.doc_id = c.b
JOIN sz za ON za.doc_id = c.a
JOIN sz zb ON zb.doc_id = c.b
WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
      / CAST(za.n + zb.n - len(list_intersect(sa.s, sb.s)) AS DOUBLE) >= 0.12
"""


def q_dedup_minhash_lsh(spark, sf_dir):
    from pyelt_spark.operators.docdedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), num_perm=12, bands=4, n=3, threshold=0.12
    )


_MINHASH_COLS = ",\n    ".join(
    f"list_min(list_transform(hx, h -> substr(h, {1 + 10 * i}, 10))) AS m{i}"
    for i in range(12)
)
_BAND_SELECTS = "\nUNION ALL\n".join(
    f"SELECT doc_id, {b} AS band, concat_ws('|', m{b * 3}, m{b * 3 + 1}, m{b * 3 + 2}) AS key FROM sig"
    for b in range(4)
)

SQL_DEDUP_MINHASH_LSH = f"""
WITH {SQL_SHINGLES3},
hxt AS (
  SELECT doc_id, s, list_transform(s, x -> sha256(x) || sha256(x || '#')) AS hx
  FROM sh
),
sig AS (
  SELECT doc_id, s,
    {_MINHASH_COLS}
  FROM hxt
),
buckets AS (
  {_BAND_SELECTS}
),
cand AS (
  SELECT x.doc_id AS a, y.doc_id AS b
  FROM buckets x JOIN buckets y ON x.band = y.band AND x.key = y.key
  WHERE x.doc_id < y.doc_id
  GROUP BY 1, 2
),
sz AS (SELECT doc_id, len(s) AS n FROM sh)
SELECT c.a AS doc_a, c.b AS doc_b,
  round(CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
        / CAST(za.n + zb.n - len(list_intersect(sa.s, sb.s)) AS DOUBLE), 6) AS jaccard
FROM cand c
JOIN sh sa ON sa.doc_id = c.a
JOIN sh sb ON sb.doc_id = c.b
JOIN sz za ON za.doc_id = c.a
JOIN sz zb ON zb.doc_id = c.b
WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
      / CAST(za.n + zb.n - len(list_intersect(sa.s, sb.s)) AS DOUBLE) >= 0.12
"""


SQL_DEDUP_CLUSTERS = f"""
WITH RECURSIVE {SQL_SHINGLES3},
hxt AS (
  SELECT doc_id, s, list_transform(s, x -> sha256(x) || sha256(x || '#')) AS hx
  FROM sh
),
sig AS (
  SELECT doc_id, s,
    {_MINHASH_COLS}
  FROM hxt
),
buckets AS (
  {_BAND_SELECTS}
),
cand AS (
  SELECT x.doc_id AS a, y.doc_id AS b
  FROM buckets x JOIN buckets y ON x.band = y.band AND x.key = y.key
  WHERE x.doc_id < y.doc_id
  GROUP BY 1, 2
),
sz AS (SELECT doc_id, len(s) AS n FROM sh),
pairs AS (
  SELECT c.a, c.b
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.a
  JOIN sh sb ON sb.doc_id = c.b
  JOIN sz za ON za.doc_id = c.a
  JOIN sz zb ON zb.doc_id = c.b
  WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
        / CAST(za.n + zb.n - len(list_intersect(sa.s, sb.s)) AS DOUBLE) >= 0.12
),
e AS (SELECT a AS x, b AS y FROM pairs UNION SELECT b, a FROM pairs),
reach (node, r) AS (
  SELECT x, x FROM e
  UNION
  SELECT e.x, reach.r FROM e JOIN reach ON e.y = reach.node
)
SELECT CAST(node AS BIGINT) AS doc_id, CAST(min(r) AS BIGINT) AS canonical_id
FROM reach GROUP BY node
"""


SQL_DECONTAMINATE = f"""
WITH norm AS (SELECT doc_id, {SQL_NORM} AS t FROM documents),
toks AS (SELECT doc_id, string_split(t, ' ') AS w FROM norm),
sh8 AS (
  SELECT doc_id,
    list_distinct(list_transform(
      range(0, greatest(len(w) - 8, 0) + 1),
      i -> array_to_string(list_slice(w, i + 1, i + 8), ' ')
    )) AS s
  FROM toks
),
tr AS (SELECT doc_id, unnest(s) AS g FROM sh8 WHERE doc_id % 20 <> 0),
ev AS (SELECT DISTINCT unnest(s) AS g FROM sh8 WHERE doc_id % 20 = 0)
SELECT tr.doc_id, CAST(count(*) AS BIGINT) AS n_hits
FROM tr JOIN ev USING (g)
GROUP BY 1
"""


def q_dedup_clusters(spark, sf_dir):
    """Duplicate CLUSTERS from the minhash pair edges: connected components
    via iterative min-label propagation (docdedup.dedup_clusters) — the
    keep-one-per-cluster step a training pipeline runs after any pair
    operator. Oracle: DuckDB recursive CTE computing the transitive closure
    over the identical pair set."""
    from pyelt_spark.operators.docdedup import dedup_clusters, minhash_lsh_pairs

    pairs = minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), num_perm=12, bands=4, n=3, threshold=0.12
    )
    return dedup_clusters(pairs).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("canonical_id").cast("long").alias("canonical_id"),
    )


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination (n-gram-overlap test): training docs =
    doc_id % 20 != 0, eval set = doc_id % 20 == 0; flag train docs sharing
    any word 8-gram with the eval set."""
    from pyelt_spark.operators.docdedup import decontaminate

    d = _t(spark, sf_dir, "documents")
    return decontaminate(
        d.filter(F.col("doc_id") % 20 != 0),
        d.filter(F.col("doc_id") % 20 == 0),
        n=8,
    ).orderBy("doc_id")


def q_dedup_simhash(spark, sf_dir):
    """64-bit SimHash per document — all-JVM relational dataflow (explode →
    sha2 → 64 bit-sum aggregates), value-checked against a DuckDB twin that
    computes the identical signature. The Arrow pandas_udf variant
    (docdedup.simhash64) stays as the DbFunction-coverage path; bit-identity
    between the two is pytest-covered."""
    from pyelt_spark.operators.docdedup import simhash_hex

    return simhash_hex(_t(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# training-data pipeline: embeddings (similarity search)
# --------------------------------------------------------------------------


def q_ann_cosine_topk(spark, sf_dir):
    from pyelt_spark.operators.similarity import cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    return cosine_topk(emb, queries, k=5)


SQL_ANN_COSINE_TOPK = """
WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 8),
c AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS cv FROM embeddings),
scored AS (
  SELECT qid AS query_id, nid AS neighbor_id,
    round(list_dot_product(qv, cv)
          / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6) AS cosine
  FROM q, c WHERE nid <> qid
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 5
"""


def _dup_corpus(spark, sf_dir):
    """Derived near-dup corpus: every embedding plus a near-identical twin
    (vec_id + 100000, component 0 scaled ×1.001) — deterministic in both
    engines, so the LSH path has a real match set to recall (the raw table's
    only close pair sits at cosine ≈0.51, below the near-dup regime LSH is
    built for)."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v")
    )
    twin = emb.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            F.col("v"), lambda x, i: F.when(i == 0, x * F.lit(1.001)).otherwise(x)
        ).alias("v"),
    )
    return emb.unionByName(twin)


def q_embedding_dup_pairs(spark, sf_dir):
    """Cosine near-dup pairs via BANDED hyperplane LSH + exact verification
    (operators/docdedup.embedding_dup_pairs — the scale path: candidates
    meet only inside a (band, key) bucket, verified pairs ⊆ brute force).
    The brute-force SQL twin is the oracle: output must be IDENTICAL, i.e.
    the banding recalled every true pair."""
    from pyelt_spark.operators.docdedup import embedding_dup_pairs

    corpus = _dup_corpus(spark, sf_dir)
    return embedding_dup_pairs(
        corpus, id_col="vec_id", vec_col="v",
        threshold=0.98, bands=4, rows_per_band=8, dim=64,
    ).select(
        F.col("doc_a").alias("vec_a"), F.col("doc_b").alias("vec_b"), "cosine"
    )


SQL_EMBEDDING_DUP_PAIRS = """
WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
e AS (
  SELECT vec_id, v FROM base
  UNION ALL
  SELECT vec_id + 100000,
    list_transform(range(1, len(v) + 1),
                   i -> CASE WHEN i = 1 THEN v[i] * 1.001 ELSE v[i] END)
  FROM base
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
  round(list_dot_product(a.v, b.v)
        / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
FROM e a, e b
WHERE a.vec_id < b.vec_id
  AND list_dot_product(a.v, b.v)
      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.98
"""


def q_ann_ivf_topk(spark, sf_dir):
    """IVF-cell ANN (recall < 1 by design vs full-scan; EXACT within the
    probed cells). The oracle reproduces the cell assignment in SQL with the
    same literal hyperplane weights and brute-forces inside the cells, so
    this is a full value check of the IVF path."""
    from pyelt_spark.operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    return ivf_topk(emb, emb.filter(F.col("vec_id") < 8), k=5, planes=3, dim=64)


def _ivf_oracle_sql(planes: int = 3, dim: int = 64, k: int = 5) -> str:
    from pyelt_spark.operators.similarity import hyperplane_weights, weights_sql_literal

    lits = weights_sql_literal(hyperplane_weights(planes, dim))
    cell = "concat(" + ", ".join(
        f"CASE WHEN list_dot_product(v, {w}) > 0 THEN '1' ELSE '0' END" for w in lits
    ) + ")"
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
sig AS (SELECT vec_id, v, {cell} AS cell FROM e),
q AS (SELECT vec_id AS qid, v AS qv, cell FROM sig WHERE vec_id < 8),
scored AS (
  SELECT qid AS query_id, s.vec_id AS neighbor_id,
    round(list_dot_product(qv, s.v)
          / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(s.v, s.v))), 6) AS cosine
  FROM q JOIN sig s USING (cell) WHERE s.vec_id <> qid
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {k}
"""


SQL_ANN_IVF_TOPK = _ivf_oracle_sql()


def q_ann_ivf_multiprobe(spark, sf_dir):
    """Multi-probe IVF (probe the query's cell plus every Hamming-1 flip —
    the recall/cost dial). The oracle expands the same probe set in SQL,
    so this value-checks the multiprobe path end-to-end."""
    from pyelt_spark.operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    return ivf_topk(
        emb, emb.filter(F.col("vec_id") < 8), k=5, planes=3, dim=64, multiprobe=True
    )


def _ivf_multiprobe_oracle_sql(planes: int = 3, dim: int = 64, k: int = 5) -> str:
    from pyelt_spark.operators.similarity import hyperplane_weights, weights_sql_literal

    lits = weights_sql_literal(hyperplane_weights(planes, dim))
    cell = "concat(" + ", ".join(
        f"CASE WHEN list_dot_product(v, {w}) > 0 THEN '1' ELSE '0' END" for w in lits
    ) + ")"
    flips = ", ".join(
        "concat(substr(cell, 1, {p0}), CASE substr(cell, {p}, 1) WHEN '1' THEN '0' "
        "ELSE '1' END, substr(cell, {p1}, {rest}))".format(
            p0=p, p=p + 1, p1=p + 2, rest=planes - p - 1
        )
        for p in range(planes)
    )
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
sig AS (SELECT vec_id, v, {cell} AS cell FROM e),
q AS (
  SELECT vec_id AS qid, v AS qv, unnest([cell, {flips}]) AS cell
  FROM sig WHERE vec_id < 8
),
scored AS (
  SELECT qid AS query_id, s.vec_id AS neighbor_id,
    round(list_dot_product(qv, s.v)
          / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(s.v, s.v))), 6) AS cosine
  FROM q JOIN sig s USING (cell) WHERE s.vec_id <> qid
  GROUP BY 1, 2, 3
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {k}
"""


SQL_ANN_IVF_MULTIPROBE = _ivf_multiprobe_oracle_sql()


QUERIES.update(
    {
        "doc_token_count": q_doc_token_count,
        "doc_quality_score": q_doc_quality,
        "doc_langid": q_doc_langid,
        "doc_fingerprint": q_doc_fingerprint,
        "dedup_exact": q_dedup_exact,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_simhash": q_dedup_simhash,
        "dedup_clusters": q_dedup_clusters,
        "decontaminate": q_decontaminate,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "ann_ivf_multiprobe": q_ann_ivf_multiprobe,
        "embedding_dup_pairs": q_embedding_dup_pairs,
    }
)

ORACLES.update(
    {
        "doc_token_count": SQL_DOC_TOKEN_COUNT,
        "doc_quality_score": SQL_DOC_QUALITY,
        "doc_langid": SQL_DOC_LANGID,
        "doc_fingerprint": SQL_DOC_FINGERPRINT,
        "dedup_exact": SQL_DEDUP_EXACT,
        "dedup_ngram_jaccard": SQL_DEDUP_NGRAM_JACCARD,
        "dedup_minhash_lsh": SQL_DEDUP_MINHASH_LSH,
        "ann_cosine_topk": SQL_ANN_COSINE_TOPK,
        "embedding_dup_pairs": SQL_EMBEDDING_DUP_PAIRS,
        "ann_ivf_topk": SQL_ANN_IVF_TOPK,
        "ann_ivf_multiprobe": SQL_ANN_IVF_MULTIPROBE,
        "dedup_simhash": simhash_oracle_sql(),
        "dedup_clusters": SQL_DEDUP_CLUSTERS,
        "decontaminate": SQL_DECONTAMINATE,
    }
)


# --------------------------------------------------------------------------
# validation + snapshot-diff deletes (operator queries with SQL oracles)
# --------------------------------------------------------------------------


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

QUERIES.update(
    {
        "cdc_validation": q_cdc_validation,
        "cdc_snapshot_deletes": q_cdc_snapshot_deletes,
    }
)
ORACLES.update(
    {
        "cdc_validation": SQL_CDC_VALIDATION,
        "cdc_snapshot_deletes": SQL_CDC_SNAPSHOT_DELETES,
    }
)


def q_cdc_record_status(spark, sf_dir):
    """RecordStatusSat analog: currently-deleted keys with the deleting run
    (dv.py:85-86, etl.py:495-505)."""
    v = replayed_vault(spark, sf_dir)
    return v.record_status().select("conv_id", "turn_idx", "deleted_runid")


# a key is finally-deleted iff its latest applied (content) batch precedes a
# later delete candidate; the deleting run is the FIRST D after the last
# applied batch (later Ds hit an already-closed row and no-op)
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

QUERIES["cdc_record_status"] = q_cdc_record_status
ORACLES["cdc_record_status"] = SQL_CDC_RECORD_STATUS


# --------------------------------------------------------------------------
# mapping projection (JSON/array/string funcs), set difference, streaming
# --------------------------------------------------------------------------


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

QUERIES.update(
    {
        "mapping_projection": q_mapping_projection,
        "cdc_set_difference": q_cdc_set_difference,
        "stream_hourly_rollup": q_stream_hourly_rollup,
    }
)
ORACLES.update(
    {
        "mapping_projection": SQL_MAPPING_PROJECTION,
        "cdc_set_difference": SQL_CDC_SET_DIFFERENCE,
        "stream_hourly_rollup": SQL_STREAM_HOURLY,
    }
)


# --------------------------------------------------------------------------
# relational coverage round 2: semi/anti joins, distinct + conditional aggs
# --------------------------------------------------------------------------


def q_orders_with_returns(spark, sf_dir):
    """Semi join (EXISTS): order priorities of orders having at least one
    returned lineitem (q4 shape)."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


SQL_ORDERS_WITH_RETURNS = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q_customers_without_orders(spark, sf_dir):
    """Anti join (NOT EXISTS): customers with no orders, per segment."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("c_mktsegment")
    )


SQL_CUSTOMERS_WITHOUT_ORDERS = """
SELECT c_mktsegment, count(*) AS n_customers
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def q_supplier_diversity(spark, sf_dir):
    """COUNT(DISTINCT) per group (q16 shape): distinct suppliers and parts
    shipped per return flag."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.count("*").alias("n_items"),
        )
        .orderBy("l_returnflag")
    )


SQL_SUPPLIER_DIVERSITY = """
SELECT l_returnflag,
  count(DISTINCT l_suppkey) AS n_suppliers,
  count(DISTINCT l_partkey) AS n_parts,
  count(*) AS n_items
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def q_promo_revenue_share(spark, sf_dir):
    """Conditional aggregation over a join (q14 shape): revenue share of
    parts whose type starts with a given prefix, by line status."""
    l = _t(spark, sf_dir, "lineitem")
    p = F.broadcast(_t(spark, sf_dir, "part"))
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))
    joined = l.join(p, l.l_partkey == p.p_partkey)
    is_promo = F.col("p_type").startswith("STANDARD")
    return (
        joined.groupBy("l_linestatus")
        .agg(
            F.round(
                F.sum(F.when(is_promo, rev).otherwise(F.lit(0).cast("decimal(18,4)"))).cast(
                    "double"
                ),
                6,
            ).alias("promo_revenue"),
            F.round(F.sum(rev).cast("double"), 6).alias("total_revenue"),
        )
        .orderBy("l_linestatus")
    )


SQL_PROMO_REVENUE_SHARE = """
SELECT l_linestatus,
  round(CAST(sum(CASE WHEN p_type LIKE 'STANDARD%'
    THEN CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE), 6) AS promo_revenue,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 6) AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY l_linestatus ORDER BY l_linestatus
"""

QUERIES.update(
    {
        "q4_orders_with_returns": q_orders_with_returns,
        "customers_without_orders": q_customers_without_orders,
        "q16_supplier_diversity": q_supplier_diversity,
        "q14_promo_revenue_share": q_promo_revenue_share,
    }
)
ORACLES.update(
    {
        "q4_orders_with_returns": SQL_ORDERS_WITH_RETURNS,
        "customers_without_orders": SQL_CUSTOMERS_WITHOUT_ORDERS,
        "q16_supplier_diversity": SQL_SUPPLIER_DIVERSITY,
        "q14_promo_revenue_share": SQL_PROMO_REVENUE_SHARE,
    }
)


def q_corpus_clean_pipeline(spark, sf_dir):
    """A composed training-data cleaning pipeline as one declarative plan:
    quality gate → language filter → exact-dedup (keep canonical doc) →
    token statistics. Catalyst fuses the whole chain; the dedup is the only
    shuffle."""
    from pyspark.sql import Window

    from pyelt_spark.functions.text import fingerprint, langid, quality_score, token_count

    d = _t(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "text",
        quality_score("text").alias("quality"),
        langid("text").alias("lang_guess"),
        fingerprint("text").alias("fp"),
        token_count("text").alias("n_tokens"),
    ).filter((F.col("quality") >= 0.4) & (F.col("lang_guess") == "en"))
    w = Window.partitionBy("fp").orderBy("doc_id")
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc_id", "n_tokens", "quality")
    )


SQL_CORPUS_CLEAN = f"""
WITH t AS (
  SELECT doc_id, text,
    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) AS n_tok,
    CAST(len(text) - len(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) AS n_punct,
    CAST(len(list_filter(string_split({SQL_NORM}, ' '), x -> list_contains({_EN}, x))) AS DOUBLE) AS en,
    CAST(len(list_filter(string_split({SQL_NORM}, ' '), x -> list_contains({_DE}, x))) AS DOUBLE) AS de,
    CAST(len(list_filter(string_split({SQL_NORM}, ' '), x -> list_contains({_FR}, x))) AS DOUBLE) AS fr,
    CAST(len(list_filter(string_split({SQL_NORM}, ' '), x -> list_contains({_ES}, x))) AS DOUBLE) AS es,
    sha256({SQL_NORM}) AS fp
  FROM documents
),
scored AS (
  SELECT doc_id, fp,
    CAST(n_tok AS BIGINT) AS n_tokens,
    round((
      least(n_tok / 100.0, 1.0)
      + (1.0 - least(n_punct / greatest(CAST(len(text) AS DOUBLE), 1.0) * 5, 1.0))
      + least(en / greatest(n_tok, 1.0) * 4, 1.0)
    ) / 3, 6) AS quality,
    CASE
      WHEN en > 0 AND en = greatest(en, de, fr, es) THEN 'en'
      WHEN de > 0 AND de = greatest(en, de, fr, es) THEN 'de'
      WHEN fr > 0 AND fr = greatest(en, de, fr, es) THEN 'fr'
      WHEN es > 0 AND es = greatest(en, de, fr, es) THEN 'es'
      ELSE 'und' END AS lang_guess
  FROM t
),
gated AS (SELECT * FROM scored WHERE quality >= 0.4 AND lang_guess = 'en')
SELECT doc_id, n_tokens, quality FROM (
  SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM gated
) WHERE rn = 1
"""

QUERIES["corpus_clean_pipeline"] = q_corpus_clean_pipeline
ORACLES["corpus_clean_pipeline"] = SQL_CORPUS_CLEAN


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

QUERIES["datamart_fact_turn_versions"] = q_datamart_fact_turn_versions
ORACLES["datamart_fact_turn_versions"] = SQL_DATAMART_FACT


def q_doc_bpe_token_count(spark, sf_dir):
    """BPE-ish regex tokenization count (letters / digits / punctuation
    runs split apart — the pre-tokenizer shape of GPT-style BPE)."""
    d = _t(spark, sf_dir, "documents")
    pat = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
    return d.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(pat)).alias("n_bpe_tokens"),
    )


SQL_DOC_BPE_TOKENS = r"""
SELECT doc_id,
  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe_tokens
FROM documents
"""


def q_embedding_quantize(spark, sf_dir):
    """int8 symmetric quantization of the embedding column (the storage
    shape a 10^9-vector ANN index wants): per-vector max-abs scale,
    exploded to scalar rows so every engine hashes identically."""
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    scale = F.aggregate(v, F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x)))
    q = F.transform(v, lambda x: F.round(x * 127.0 / scale).cast("int"))
    out = emb.select(
        "vec_id", F.round(scale, 6).alias("scale"), F.posexplode(q).alias("dim", "q8")
    )
    return out.select("vec_id", "scale", "dim", "q8")


SQL_EMBEDDING_QUANTIZE = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 50
),
s AS (
  SELECT vec_id, v,
    list_reduce(list_transform(v, x -> abs(x)), (a, b) -> greatest(a, b)) AS scale
  FROM e
)
SELECT vec_id, round(scale, 6) AS scale,
  CAST(i - 1 AS INTEGER) AS dim,
  CAST(round(v[i] * 127.0 / scale) AS INTEGER) AS q8
FROM s, unnest(range(1, len(v) + 1)) AS t(i)
"""

QUERIES.update(
    {
        "doc_bpe_token_count": q_doc_bpe_token_count,
        "embedding_quantize": q_embedding_quantize,
    }
)
ORACLES.update(
    {
        "doc_bpe_token_count": SQL_DOC_BPE_TOKENS,
        "embedding_quantize": SQL_EMBEDDING_QUANTIZE,
    }
)


def q_doc_winnow_fingerprints(spark, sf_dir):
    """Winnowing (rolling-hash window-minima) fingerprint sets — the
    position-robust dedup fingerprint (MOSS scheme)."""
    from pyelt_spark.functions.text import winnow_fingerprints

    return winnow_fingerprints(_t(spark, sf_dir, "documents"), k=8, w=4)


SQL_DOC_WINNOW = f"""
WITH n AS (SELECT doc_id, {SQL_NORM} AS t FROM documents),
p AS (
  SELECT doc_id, t, unnest(range(1, greatest(len(t) - 8 + 1, 1) + 1)) AS pos
  FROM n
),
h AS (SELECT doc_id, pos, substr(sha256(substr(t, CAST(pos AS INTEGER), 8)), 1, 16) AS hh FROM p),
w AS (
  SELECT doc_id, min(hh) OVER (
    PARTITION BY doc_id ORDER BY pos ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING
  ) AS fp FROM h
)
SELECT DISTINCT doc_id, fp FROM w
"""

QUERIES["doc_winnow_fingerprints"] = q_doc_winnow_fingerprints
ORACLES["doc_winnow_fingerprints"] = SQL_DOC_WINNOW


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

QUERIES["events_value_percentiles"] = q_events_value_percentiles
ORACLES["events_value_percentiles"] = SQL_EVENTS_PERCENTILES


def q_doc_unigram_xent(spark, sf_dir):
    """Corpus-statistics quality filter: per-document cross-entropy against
    the corpus unigram distribution (cheap perplexity proxy — two
    relational passes; see functions/text.unigram_cross_entropy)."""
    from pyelt_spark.functions.text import unigram_cross_entropy

    return unigram_cross_entropy(_t(spark, sf_dir, "documents"))


SQL_DOC_UNIGRAM_XENT = f"""
WITH tok AS (
  SELECT doc_id, unnest(list_filter(string_split({SQL_NORM}, ' '), x -> x <> '')) AS w
  FROM documents
),
freq AS (SELECT w, count(*) AS cw FROM tok GROUP BY w),
tot AS (SELECT sum(cw) AS n_total FROM freq),
per AS (SELECT doc_id, w, count(*) AS k FROM tok GROUP BY 1, 2),
wt AS (
  SELECT per.doc_id, per.k,
    CAST(round(-ln(CAST(cw AS DOUBLE) / CAST(n_total AS DOUBLE)), 9) AS DECIMAL(18,9))
      * CAST(per.k AS DECIMAL(9,0)) AS t
  FROM per JOIN freq USING (w) CROSS JOIN tot
)
SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_tokens,
  round(CAST(sum(t) AS DOUBLE) / CAST(sum(k) AS DOUBLE), 6) AS xent
FROM wt GROUP BY doc_id
"""

QUERIES["doc_unigram_xent"] = q_doc_unigram_xent
ORACLES["doc_unigram_xent"] = SQL_DOC_UNIGRAM_XENT


# --------------------------------------------------------------------------
# declared second domain (orders/customers vault through the generic Pipe)
# --------------------------------------------------------------------------

from pyelt_spark.entry_domain import DOMAIN_ORACLES, DOMAIN_QUERIES  # noqa: E402

QUERIES.update(DOMAIN_QUERIES)
ORACLES.update(DOMAIN_ORACLES)
