"""Merge-on-read head mode — differential vs copy-on-write.

Motivated by the 16M-event profile: the CoW head rewrite is 12–23 s of a
34–43 s batch at dense update rates. MoR appends only changed keys' rows
(supersession-stamped) and collapses at read time; these tests hold the
TWO modes to identical logical contents on an adversarial stream, plus
MoR-specific properties (append-only head growth, compaction folding,
exactly-once)."""

import datetime as dt
import random

from pyspark.sql import functions as F

from pyelt_spark.operators.scd2 import Scd2Merge, Scd2Table

from tests.test_random_differential import _gen_stream

T0 = dt.datetime(2024, 1, 1)

_SCHEMA = (
    "seq long, conv_id string, turn_idx int, role string, text string, "
    "tool string, op string, ts timestamp, batch_id int"
)


def _merge():
    return Scd2Merge(
        business_keys=["conv_id", "turn_idx"],
        payload_cols=["role", "text", "tool"],
        order_by=["seq"],
    )


def _replay(spark, table, events):
    m = _merge()
    df = spark.createDataFrame(
        [tuple(e[c] for c in (
            "seq", "conv_id", "turn_idx", "role", "text", "tool", "op", "ts", "batch_id"
        )) for e in events],
        _SCHEMA,
    )
    for b in sorted({e["batch_id"] for e in events}):
        m.apply_batch(table, df.filter(F.col("batch_id") == b), int(b))
    return table


def _contents(df):
    cols = ["conv_id", "turn_idx", "role", "text", "tool",
            "_active", "_revision", "_seq", "_deleted_runid", "_runid"]
    return {tuple(r[c] for c in cols) for r in df.select(cols).collect()}


def test_mor_equals_cow_on_adversarial_stream(spark, tmp_path):
    events = _gen_stream(random.Random(77), n_events=400, n_keys=30, n_batches=5)
    cow = _replay(spark, Scd2Table(spark, str(tmp_path / "cow"), 8), events)
    mor = _replay(spark, Scd2Table(spark, str(tmp_path / "mor"), 8, mor=True), events)
    assert _contents(cow.head_read()) == _contents(mor.head_read())
    assert _contents(cow.read()) == _contents(mor.read())
    assert _contents(cow.current()) == _contents(mor.current())


def test_mor_head_is_append_only_and_compacts(spark, tmp_path):
    t = Scd2Table(spark, str(tmp_path / "sat"), num_buckets=4, mor=True)
    m = _merge()
    mk = lambda seq, text: spark.createDataFrame(
        [(seq, "c1", 0, "user", text, None, "U", T0 + dt.timedelta(seconds=seq), 0)],
        _SCHEMA,
    )
    for b in range(1, 7):
        m.apply_batch(t, mk(10 * b, f"v{b}"), b)
    # every batch appended a delta dir; no bucket was rewritten
    dirs = t.head.last_commit().buckets
    assert sum(len(d) for d in dirs.values()) >= 6
    assert t.current().first()["text"] == "v6"
    assert t.current().first()["_revision"] == 5
    assert t.read().count() == 6  # 5 closed in hist + 1 active

    t.compact_head(max_dirs_per_bucket=2)
    dirs_after = t.head.last_commit().buckets
    assert all(len(d) == 1 for d in dirs_after.values())
    # collapse result unchanged by compaction; later merges still supersede
    assert t.current().first()["text"] == "v6"
    m.apply_batch(t, mk(100, "v7"), 7)
    assert t.current().first()["text"] == "v7"
    assert t.current().first()["_revision"] == 6


def test_mor_idempotent_redelivery(spark, tmp_path):
    t = Scd2Table(spark, str(tmp_path / "sat"), num_buckets=4, mor=True)
    m = _merge()
    df = spark.createDataFrame(
        [(1, "c1", 0, "user", "a", None, "U", T0, 0)], _SCHEMA
    )
    m.apply_batch(t, df, 1)
    n_dirs = sum(len(d) for d in t.head.last_commit().buckets.values())
    assert m.apply_batch(t, df, 1) == {"skipped_duplicate_batch": 1}
    assert sum(len(d) for d in t.head.last_commit().buckets.values()) == n_dirs
    assert t.head_read().count() == 1
