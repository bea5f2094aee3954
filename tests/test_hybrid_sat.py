"""HybridSat parity: a satellite with a `type` discriminator in the PK
(reference: pyelt/datalayers/dv.py:71-83; e.g. one phone sat storing
telefoon/mobiel rows per patient, tests/_domainmodel.py:36-41).

In this engine a hybrid sat is just an Scd2Merge whose business keys
include the type column — each (entity, type) pair gets an independent
SCD2 history."""

import datetime as dt

from pyelt_spark.operators.scd2 import Scd2Merge, Scd2Table

TS = dt.datetime(2024, 1, 1)
SCHEMA = (
    "seq long, conv_id string, turn_idx int, ann_type string, value string, "
    "op string, ts timestamp"
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_hybrid_sat_independent_histories_per_type(spark, tmp_path):
    t = Scd2Table(spark, str(tmp_path / "hybrid"), num_buckets=4)
    m = Scd2Merge(
        business_keys=["conv_id", "turn_idx", "ann_type"],
        payload_cols=["value"],
        order_by=["seq"],
    )
    # one turn, two annotation types — the hybrid fan-out
    b1 = _mk(spark, [
        (1, "c1", 0, "sentiment", "positive", "U", TS),
        (2, "c1", 0, "toxicity", "low", "U", TS),
    ])
    met = m.apply_batch(t, b1, 1)
    assert met["inserted"] == 2

    # updating ONE type must not touch the other's history
    b2 = _mk(spark, [(10, "c1", 0, "sentiment", "negative", "U", TS)])
    met = m.apply_batch(t, b2, 2)
    assert met["updated"] == 1
    cur = {r["ann_type"]: r for r in t.current().collect()}
    assert cur["sentiment"]["value"] == "negative" and cur["sentiment"]["_revision"] == 1
    assert cur["toxicity"]["value"] == "low" and cur["toxicity"]["_revision"] == 0
    assert t.read().count() == 3  # 2 current + 1 closed sentiment version

    # deleting one type closes only that type
    b3 = _mk(spark, [(20, "c1", 0, "toxicity", None, "D", TS)])
    m.apply_batch(t, b3, 3)
    assert {r["ann_type"] for r in t.current().collect()} == {"sentiment"}
