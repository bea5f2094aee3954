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


def test_hub_only_row_does_not_clobber_sat(spark, tmp_path):
    """A pending row that never set_sat() must not reach the sat merge:
    mixed into the batch it would arrive as an all-null payload, which the
    hashdiff treats as a change — writing a spurious null revision over
    the existing key's active data (ADVICE r4, medium)."""
    pipe = _pipe(spark, tmp_path)
    data = EntityData(pipe, Patient)
    data.new(patient_id="p1")  # hub-only re-registration of an existing key
    data.new(patient_id="p5").set_sat("default", naam="Neel")
    out = data.save()
    assert out["patient_sat"]["inserted"] == 1  # only p5
    assert out["patient_sat"]["updated"] == 0
    by_bk = {
        r.patient_id: r for r in EntityData(pipe, Patient).load().values()
    }
    assert by_bk["p1"].default.naam == "Jan"  # untouched
    assert by_bk["p1"].default._revision == 0
    assert by_bk["p5"].default.naam == "Neel"


def test_reload_invalidates_sat_cache(spark, tmp_path):
    pipe = _pipe(spark, tmp_path)
    data = EntityData(pipe, Patient)
    rows = data.load()
    assert {r.patient_id: r for r in rows.values()}["p1"].default.naam == "Jan"
    # another writer revises p1 behind this reader's back
    b2 = spark.createDataFrame([(5, "p1", "Johannes", "U", TS)], _SCHEMA)
    pipe.run(b2, batch_id=2)
    rows = data.load()  # re-load = request for CURRENT state
    assert {r.patient_id: r for r in rows.values()}["p1"].default.naam == "Johannes"


def test_batch_id_respects_runs_registry(spark, tmp_path):
    """A run that committed nothing to this entity's tables still occupies
    its batch id (the runs registry records it); save() must not reuse it."""
    pipe = _pipe(spark, tmp_path)
    pipe.run(None, batch_id=7)  # registry-only run, no table commits
    data = EntityData(pipe, Patient)
    data.new(patient_id="p6").set_sat("default", naam="Truus")
    out = data.save()
    assert out["batch_id"] == 8


def test_concurrent_writer_raises(spark, tmp_path):
    """Two writers computing the same next id: the loser must raise, not
    silently no-op through the merge's idempotence (single-writer guard)."""
    pipe = _pipe(spark, tmp_path)
    data = EntityData(pipe, Patient)
    stale = data._next_batch_id()
    # rival writer wins the race after this writer derived its id
    pipe.hub_table(Patient).commit(None, [], batch_id=stale)
    data._next_batch_id = lambda: stale
    data.new(patient_id="p9").set_sat("default", naam="X")
    with pytest.raises(RuntimeError, match="another writer"):
        data.save()
