"""Physical-plan quality gates — the 100 TB properties, asserted.

Correctness tests prove the small-scale answers; these lock in the plan
SHAPES that make the same code survive a 1000-executor / 100 TB run:
filters and column pruning reaching the parquet scan, small dimensions
broadcast instead of shuffled, map-side partial aggregation before
exchanges, and no row-at-a-time Python in any hot path. A regression in
any of these is invisible to value checks at sf0.001 — this file is where
it fails instead."""

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _t(spark, name):
    return spark.read.parquet(os.path.join(SF, f"{name}.parquet"))


def test_filter_and_column_pruning_reach_scan(spark):
    """q1 shape: the lineitem scan must read ONLY the 5 referenced columns
    and carry the shipdate predicate as a pushed filter."""
    from pyelt_spark.entry_queries import q_pricing_summary

    plan = _plan(q_pricing_summary(spark, SF))
    scan = [s for s in plan.split("(") if "Scan parquet" in s or "ReadSchema" in s]
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # ReadSchema must not contain un-referenced wide columns
    assert "l_partkey" not in plan.split("ReadSchema")[1].split("\n")[0]
    assert "l_tax" not in plan.split("ReadSchema")[1].split("\n")[0]


def test_small_dims_broadcast_not_shuffled(spark):
    """q5 shape: region/nation joins must be broadcast hash joins — a
    shuffle of lineitem keyed on a 5-row dimension is the classic 100 TB
    plan bug."""
    from pyelt_spark.entry_queries import q_nation_revenue

    plan = _plan(q_nation_revenue(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_q3_customer_side_broadcast(spark):
    """q3 shape: the segment-filtered customer side is broadcast-sized at
    any SF; the hint must be explicit (not AQE-dependent) so the plan is
    right even before runtime stats exist."""
    from pyelt_spark.entry_queries import q_shipping_priority

    plan = _plan(q_shipping_priority(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 1
    assert "CartesianProduct" not in plan


def test_latest_per_key_has_partial_aggregation(spark):
    """The dedup aggregate must run a map-side partial pass BEFORE the
    exchange (this is what makes hot keys collapse pre-shuffle — the skew
    design, SURVEY §4.1)."""
    from pyelt_spark.operators.dedup import latest_per_key

    ev = _t(spark, "events")
    df = latest_per_key(ev, ["user_id"], ["event_id"])
    plan = _plan(df)
    # partial agg appears as two aggregate nodes around one exchange
    pre_exchange = plan.split("Exchange")[0]
    assert "Aggregate" in pre_exchange, plan[:2000]


def test_no_python_udf_in_hot_queries(spark):
    """Every headline/bench query stays JVM-side: no BatchEvalPython /
    ArrowEvalPython nodes (Python is reserved for the multimodal mapInPandas
    path, which is not in this list)."""
    import pyelt_spark.entry_queries as EQ

    for name in [
        "q1_pricing_summary", "q5_nation_revenue", "events_sessionize",
        "dedup_exact", "dedup_minhash_lsh", "dedup_ngram_jaccard",
        "dedup_simhash", "ann_cosine_topk", "doc_token_count",
        "doc_quality_score", "doc_langid", "doc_winnow_fingerprints",
    ]:
        plan = _plan(EQ.QUERIES[name](spark, SF))
        assert "EvalPython" not in plan, f"{name} fell off the JVM path"


def test_ann_broadcasts_queries_not_corpus(spark):
    """Brute-force ANN must broadcast the small QUERY side; the corpus is
    scanned, never shuffled."""
    from pyelt_spark.operators.similarity import cosine_topk

    emb = _t(spark, "embeddings")
    plan = _plan(cosine_topk(emb, emb.filter(F.col("vec_id") < 8), k=5))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # the only exchange of corpus rows is the final per-query ranking
    assert plan.count("Exchange hashpartitioning") <= 1


def test_merge_head_read_is_bucket_pruned(spark, tmp_path):
    """A merge touching one bucket must open ONLY that bucket's files —
    the manifest prune is file-level, invisible to Catalyst, so assert on
    the table reader's input paths."""
    from pyelt_spark.operators.scd2 import Scd2Merge, Scd2Table

    t = Scd2Table(spark, str(tmp_path / "sat"), num_buckets=8)
    m = Scd2Merge(business_keys=["k"], payload_cols=["v"], order_by=["seq"], op_col=None)
    mk = lambda rows: spark.createDataFrame(rows, "k string, v string, seq long, ts timestamp")
    import datetime as dt

    ts = dt.datetime(2024, 1, 1)
    m.apply_batch(t, mk([(f"k{i}", "a", 1, ts) for i in range(50)]), 1)
    buckets_before = set(t.head.last_commit().buckets)
    # second batch touches one key → read must prune to that key's bucket
    m.apply_batch(t, mk([("k0", "b", 2, ts)]), 2)
    metrics = t.head.last_commit().metrics
    assert len(metrics["buckets_read"]) < len(buckets_before)
    assert len(metrics["buckets_written"]) == len(metrics["buckets_read"])
