"""Object-style read-back parity (reference orm/dv_objects.py:36-369,
usage shapes orm/test_orm.py): hub load() → id-keyed rows, lazy sat
attribute access with an _active filter, new()/save() with NOT-EXISTS
hub insert and sat revision-increment semantics — here routed through
the set-based merges."""

import datetime as dt

import pytest

from pyelt_spark.plans.domain import Col, HubEntity, Sat
from pyelt_spark.plans.orm import EntityData
from pyelt_spark.plans.pipe import Pipe, SorToEntityMapping

TS = dt.datetime(2020, 1, 1)


class Patient(HubEntity):
    __bk__ = ["patient_id"]

    class Default(Sat):
        naam = Col()


_SCHEMA = "seq long, patient_id string, naam string, op string, ts timestamp"


def _pipe(spark, tmp_path):
    pipe = Pipe(
        spark, str(tmp_path / "dv"), [SorToEntityMapping(entity=Patient)], num_buckets=4
    )
    b1 = spark.createDataFrame(
        [
            (1, "p1", "Jan", "U", TS),
            (2, "p2", "Piet", "U", TS),
        ],
        _SCHEMA,
    )
    pipe.run(b1, batch_id=1)
    return pipe


def test_load_and_lazy_sat_access(spark, tmp_path):
    pipe = _pipe(spark, tmp_path)
    data = EntityData(pipe, Patient)
    rows = data.load()
    assert len(rows) == 2
    by_bk = {r.patient_id: r for r in rows.values()}
    assert set(by_bk) == {"p1", "p2"}
    # sat attribute loads lazily (one collect for the whole set), serves
    # the current active version, and repeats from cache
    assert by_bk["p1"].default.naam == "Jan"
    assert by_bk["p2"].default.naam == "Piet"
    assert by_bk["p1"].default._revision == 0


def test_load_filter(spark, tmp_path):
    pipe = _pipe(spark, tmp_path)
    rows = EntityData(pipe, Patient).load(filter="patient_id = 'p1'")
    assert len(rows) == 1
    assert next(iter(rows.values())).patient_id == "p1"


def test_new_save_reload(spark, tmp_path):
    pipe = _pipe(spark, tmp_path)
    data = EntityData(pipe, Patient)
    row = data.new(patient_id="p3")
    row.set_sat("default", naam="Kees")
    out = data.save()
    assert out["saved"] == 1
    assert out["patient_hub"]["new_keys"] == 1

    fresh = EntityData(pipe, Patient)
    rows = fresh.load()
    by_bk = {r.patient_id: r for r in rows.values()}
    assert set(by_bk) == {"p1", "p2", "p3"}
    assert by_bk["p3"].default.naam == "Kees"


def test_save_existing_bk_increments_revision(spark, tmp_path):
    pipe = _pipe(spark, tmp_path)
    data = EntityData(pipe, Patient)
    row = data.new(patient_id="p1")
    row.set_sat("default", naam="Jantje")
    out = data.save()
    # hub: NOT-EXISTS semantics — p1 already registered
    assert out["patient_hub"]["new_keys"] == 0
    assert out["patient_sat"]["updated"] == 1

    rows = EntityData(pipe, Patient).load(filter="patient_id = 'p1'")
    sat = next(iter(rows.values())).default
    assert sat.naam == "Jantje"
    assert sat._revision == 1


def test_save_unchanged_payload_is_noop(spark, tmp_path):
    pipe = _pipe(spark, tmp_path)
    data = EntityData(pipe, Patient)
    data.new(patient_id="p2").set_sat("default", naam="Piet")
    out = data.save()
    assert out["patient_sat"]["updated"] == 0
    assert out["patient_sat"]["unchanged"] == 1


def test_deleted_entity_has_no_active_sat(spark, tmp_path):
    pipe = _pipe(spark, tmp_path)
    b2 = pipe.spark.createDataFrame([(3, "p2", None, "D", TS)], _SCHEMA)
    pipe.run(b2, batch_id=2)
    rows = EntityData(pipe, Patient).load()
    by_bk = {r.patient_id: r for r in rows.values()}
    # hub keeps the registry row; the sat read is _active-filtered
    assert by_bk["p2"].default is None
    assert by_bk["p1"].default.naam == "Jan"


def test_new_requires_business_key(spark, tmp_path):
    pipe = _pipe(spark, tmp_path)
    with pytest.raises(ValueError):
        EntityData(pipe, Patient).new(naam="x")
