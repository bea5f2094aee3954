"""Declarative domain-model layer + generic Pipe orchestration tests.

Mirrors the reference's model tests (tests/unit_test_model/test02_dv.py:29-50
for name derivation / member order; tests/unit_tests_basic/_domainmodel.py:
82-131 for subtype entities, HybridLink with LinkReference +
DynamicLinkReference) and its pipeline run-order contract
(pyelt/pipeline.py:657-744)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from pyelt_spark.plans.domain import (
    Col,
    DynamicLinkReference,
    HubEntity,
    HybridLink,
    HybridSat,
    Link,
    LinkEntity,
    LinkReference,
    Sat,
    camel_to_snake,
)
from pyelt_spark.plans.pipe import (
    EntityViewToEntityMapping,
    Pipe,
    SorToEntityMapping,
    SorToLinkMapping,
    SorToValueSetMapping,
)

TS = dt.datetime(2024, 1, 1)


# --------------------------------------------------------------------------
# declared test domain (reference _domainmodel.py shape, transcript-free)
# --------------------------------------------------------------------------


class Foo(HubEntity):
    __bk__ = ["foo_id"]

    class Default(Sat):
        test1 = Col()
        test1a = Col()

    class Bar(Sat):
        test2 = Col()


class Baz(Foo):
    """Subtype entity: shares foo's hub (reference Organisatie →
    Zorginstelling pattern)."""

    class Qux(Sat):
        test4 = Col()


class Patient(HubEntity):
    __bk__ = ["patient_id"]

    class Default(Sat):
        naam = Col()

    class Adres(HybridSat):
        class Types:
            postadres = "postadres"
            bezoekadres = "bezoekadres"

        straat = Col()


class Handeling(HubEntity):
    __bk__ = ["handeling_id"]

    class Default(Sat):
        naam = Col()


class PatientHandelingLink(LinkEntity):
    class Link(HybridLink):
        class Types:
            hulpverlener = "hulpverlener"
            locatie = "locatie"

        patient = LinkReference(Patient)
        handeling = LinkReference(Handeling)
        dynamic = DynamicLinkReference(type_col="dyn_type", key_col="dyn_key")


# --------------------------------------------------------------------------
# name derivation / member order (test02_dv.py parity)
# --------------------------------------------------------------------------


def test_sat_names():
    assert Foo.Default.cls_get_name() == "foo_sat"
    assert Foo.Bar.cls_get_name() == "foo_sat_bar"
    assert Baz.Qux.cls_get_name() == "foo_sat_qux"
    assert Baz.Default.cls_get_name() == "foo_sat"
    assert Foo.__hub_name__ == "foo_hub"
    assert Baz.__hub_name__ == "foo_hub"  # subtype shares the base hub


def test_sat_short_names():
    assert Foo.Default.cls_get_short_name() == "default"
    assert Foo.Bar.cls_get_short_name() == "bar"
    assert Baz.Qux.cls_get_short_name() == "qux"


def test_subtype_marker():
    assert Foo.__subtype__ == ""
    assert Baz.__subtype__ == "baz"


def test_ordered_columns_across_mro():
    cols = Foo.Default.cls_get_columns()
    assert [c.name for c in cols] == ["test1", "test1a"]
    # subtype entity inherits base sats plus its own
    assert list(Baz.__sats__) == ["foo_sat", "foo_sat_bar", "foo_sat_qux"]


def test_camel_to_snake():
    assert camel_to_snake("PatientAdres") == "patient_adres"
    assert camel_to_snake("ZorgverlenerHub") == "zorgverlener_hub"


def test_hybrid_sat_grain_and_types():
    assert Patient.Adres.cls_get_name() == "patient_sat_adres"
    assert Patient.Adres.grain_cols() == ["type"]
    assert sorted(Patient.Adres.cls_get_types()) == ["bezoekadres", "postadres"]


def test_hybrid_link_declaration():
    assert PatientHandelingLink.__dbname__ == "patient_handeling_link"
    link = PatientHandelingLink.__link__
    refs = link.cls_get_link_refs()
    assert list(refs) == ["patient", "handeling"]
    assert refs["patient"].key_cols == ["patient_id"]
    dyns = link.cls_get_dynamic_refs()
    assert list(dyns) == ["dynamic"]
    assert sorted(link.cls_get_types()) == ["hulpverlener", "locatie"]


# --------------------------------------------------------------------------
# end-to-end Pipe over a declared multi-entity domain
# --------------------------------------------------------------------------


def _ev(seq, pid, naam, op="U", handeling=None, dyn_type=None, dyn_key=None,
        straat=None, adres_type=None):
    return (
        seq, pid, naam, op, handeling, dyn_type, dyn_key, straat, adres_type,
        TS + dt.timedelta(seconds=seq),
    )


_SCHEMA = (
    "seq long, patient_id string, naam string, op string, handeling_id string, "
    "dyn_type string, dyn_key string, straat string, type string, ts timestamp"
)


def _mappings():
    return [
        SorToEntityMapping(entity=Patient),
        SorToEntityMapping(
            entity=Handeling,
            field_map={"naam": "concat('handeling ', handeling_id)"},
            filter="handeling_id IS NOT NULL",
        ),
        SorToLinkMapping(
            link=PatientHandelingLink,
            filter="handeling_id IS NOT NULL",
            type_expr="coalesce(dyn_type, 'hulpverlener')",
        ),
        SorToValueSetMapping(valueset_name="adres_type", code="type", descr="upper(type)"),
    ]


def test_pipe_multi_entity_replay(spark, tmp_path):
    pipe = Pipe(spark, str(tmp_path / "dv"), _mappings(), num_buckets=4)

    b1 = spark.createDataFrame(
        [
            _ev(1, "p1", "Jan", straat="Dam 1", adres_type="postadres"),
            _ev(2, "p2", "Piet", handeling="h1", dyn_type="locatie", dyn_key="loc9"),
            _ev(3, "p1", "Jan", handeling="h2"),
        ],
        _SCHEMA,
    )
    out1 = pipe.run(b1, batch_id=1)
    assert out1["patient_hub"]["new_keys"] == 2
    assert out1["handeling_hub"]["new_keys"] == 2
    assert out1["patient_sat"]["inserted"] == 2
    assert out1["patient_handeling_link"]["new_keys"] == 2

    # batch 2: update p1's naam, delete p2, new hybrid-sat row
    b2 = spark.createDataFrame(
        [
            _ev(10, "p1", "Jan Jansen"),
            _ev(11, "p2", None, op="D"),
            _ev(12, "p3", "Kees", straat="Kade 3", adres_type="bezoekadres"),
        ],
        _SCHEMA,
    )
    out2 = pipe.run(b2, batch_id=2)
    assert out2["patient_sat"]["updated"] == 1
    assert out2["patient_sat"]["deleted"] == 1
    assert out2["patient_sat"]["inserted"] == 1

    sat = pipe.sat_table(Patient.Default)
    cur = {r["patient_id"]: r["naam"] for r in sat.current().collect()}
    assert cur == {"p1": "Jan Jansen", "p3": "Kees"}
    hist = sat.read()
    assert hist.count() == 4  # p1 v0+v1, p2 tombstone, p3 v0

    # hybrid sat: type is part of the grain
    adres = pipe.sat_table(Patient.Adres)
    rows = {(r["patient_id"], r["type"]): r["straat"] for r in adres.current().collect()}
    assert rows == {("p1", "postadres"): "Dam 1", ("p3", "bezoekadres"): "Kade 3"}

    # hybrid link: type + both leg FKs + dynamic leg key in the row
    link_rows = pipe.link_table(PatientHandelingLink).read().collect()
    types = sorted(r["type"] for r in link_rows)
    assert types == ["hulpverlener", "locatie"]
    for r in link_rows:
        assert r["fk_patient"] is not None and r["fk_handeling"] is not None
        assert r["fk_dynamic"] is not None

    # valueset registry: distinct codes, insert-only
    vs = pipe.valuesets["adres_type"].read().collect()
    assert {(r["code"], r["omschrijving"]) for r in vs} == {
        ("postadres", "POSTADRES"),
        ("bezoekadres", "BEZOEKADRES"),
    }

    # field_map applied to the handeling entity
    h = {r["handeling_id"]: r["naam"] for r in pipe.sat_table(Handeling.Default).current().collect()}
    assert h == {"h1": "handeling h1", "h2": "handeling h2"}


def test_pipe_idempotent_rerun(spark, tmp_path):
    """Torn-run resume: re-running an applied batch is a no-op everywhere."""
    pipe = Pipe(spark, str(tmp_path / "dv"), _mappings(), num_buckets=4)
    b1 = spark.createDataFrame(
        [_ev(1, "p1", "Jan", handeling="h1")], _SCHEMA
    )
    pipe.run(b1, batch_id=1)
    before = pipe.sat_table(Patient.Default).read().count()
    out = pipe.run(b1, batch_id=1)  # crash-replay of the same batch
    assert out["patient_sat"] == {"skipped_duplicate_batch": 1}
    assert out["patient_hub"] == {"skipped_duplicate_batch": 1}
    assert pipe.sat_table(Patient.Default).read().count() == before

    # a fresh Pipe over the same root resumes from the commit logs
    pipe2 = Pipe(spark, str(tmp_path / "dv"), _mappings(), num_buckets=4)
    out2 = pipe2.run(b1, batch_id=1)
    assert out2["patient_sat"] == {"skipped_duplicate_batch": 1}


# --------------------------------------------------------------------------
# view_to_entity promotion (pipeline.py:710-717)
# --------------------------------------------------------------------------


class PatientSummary(HubEntity):
    __bk__ = ["patient_id"]

    class Default(Sat):
        n_handelingen = Col("long")


def _summary_view(pipe: Pipe):
    """A DV view over the loaded vault: handeling count per patient from the
    link table — promoted into its own entity."""
    link = pipe.link_table(PatientHandelingLink).read()
    return link.groupBy("patient_id").agg(F.count("*").alias("n_handelingen"))


def test_view_to_entity_promotion(spark, tmp_path):
    mappings = _mappings() + [
        EntityViewToEntityMapping(view=_summary_view, entity=PatientSummary)
    ]
    pipe = Pipe(spark, str(tmp_path / "dv"), mappings, num_buckets=4)
    b1 = spark.createDataFrame(
        [
            _ev(1, "p1", "Jan", handeling="h1"),
            _ev(2, "p1", "Jan", handeling="h2"),
            _ev(3, "p2", "Piet", handeling="h1"),
        ],
        _SCHEMA,
    )
    # views run BEFORE links inside one run (reference body order,
    # pipeline.py:711 vs :721) so a view over the link table promotes in the
    # run AFTER the links load — same as the reference
    pipe.run(b1, batch_id=1, parts=["sor", "valuesets", "hubs", "links"])
    pipe.run(None, batch_id=2, parts=["views"])

    cur = {
        r["patient_id"]: r["n_handelingen"]
        for r in pipe.sat_table(PatientSummary.Default).current().collect()
    }
    assert cur == {"p1": 2, "p2": 1}
    hub = pipe.hub_table(PatientSummary).read()
    assert hub.count() == 2

    # a later run revises the promoted entity like any SCD2 source
    b2 = spark.createDataFrame([_ev(10, "p2", "Piet", handeling="h3")], _SCHEMA)
    pipe.run(b2, batch_id=3, parts=["sor", "hubs", "links"])
    pipe.run(None, batch_id=4, parts=["views"])
    sat = pipe.sat_table(PatientSummary.Default)
    cur = {r["patient_id"]: r["n_handelingen"] for r in sat.current().collect()}
    assert cur == {"p1": 2, "p2": 2}
    p2_hist = sat.read().filter(F.col("patient_id") == "p2")
    assert p2_hist.count() == 2  # revised: v0 (1 handeling) closed + v1 active


def test_pipe_streaming_tail(spark, tmp_path):
    """Structured Streaming through the GENERIC pipe: foreachBatch feeds
    pipe.run with offset epoch ids; idempotent per-table commits upgrade
    the stream's at-least-once redelivery to exactly-once, and the final
    state equals a plain batch replay of the same files."""
    rows = [
        _ev(1, "p1", "Jan", handeling="h1"),
        _ev(2, "p2", "Piet", handeling="h2"),
        _ev(3, "p1", "Jan J."),
    ]
    src = str(tmp_path / "src")
    events = spark.createDataFrame(rows, _SCHEMA)
    events.write.mode("overwrite").parquet(src)

    pipe = Pipe(spark, str(tmp_path / "dv"), _mappings(), num_buckets=4)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda df, eid: None if df.isEmpty() else pipe.run(df, 1_000_000_000 + int(eid))
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    sat = pipe.sat_table(Patient.Default)
    cur = {r["patient_id"]: r["naam"] for r in sat.current().collect()}
    assert cur == {"p1": "Jan J.", "p2": "Piet"}
    n_commits = len(sat.commits())

    # restart over the SAME checkpoint: no new files -> no new commits
    q = (
        stream.writeStream.foreachBatch(
            lambda df, eid: None if df.isEmpty() else pipe.run(df, 1_000_000_000 + int(eid))
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert len(sat.commits()) == n_commits

    # same end state as a one-shot batch replay through a fresh pipe
    pipe2 = Pipe(spark, str(tmp_path / "dv2"), _mappings(), num_buckets=4)
    pipe2.replay(events.withColumn("batch_id", F.lit(1)))
    cur2 = {
        r["patient_id"]: r["naam"]
        for r in pipe2.sat_table(Patient.Default).current().collect()
    }
    assert cur2 == cur


def test_every_driver_query_has_an_oracle():
    """The correctness gate only bites where an oracle exists — keep the
    oracle set total so no query silently degrades to a rows-only check."""
    import __spark_entry__ as entry

    q, o = entry.queries(), entry.oracle_sql()
    assert set(q) == set(o), sorted(set(q) ^ set(o))
    assert len(q) >= 47


def test_pipe_snapshot_mapping(spark, tmp_path):
    """Full-snapshot loads through the generic pipe (snapshot=True): rows
    upsert, keys absent from the snapshot tombstone (the reference's
    file-load path through the declared domain)."""
    pipe = Pipe(
        spark, str(tmp_path / "dv"),
        [SorToEntityMapping(entity=Patient, snapshot=True)],
        num_buckets=4,
    )
    schema = "patient_id string, naam string, ts timestamp"
    snap1 = spark.createDataFrame(
        [("p1", "Jan", TS), ("p2", "Piet", TS)], schema
    )
    out1 = pipe.run(snap1, batch_id=1)
    assert out1["patient_sat"]["inserted"] == 2

    snap2 = spark.createDataFrame(
        [("p1", "Jan Jansen", TS), ("p3", "Kees", TS)], schema
    )
    out2 = pipe.run(snap2, batch_id=2)
    assert out2["patient_sat"]["updated"] == 1
    assert out2["patient_sat"]["deleted"] == 1      # p2 missing → tombstone
    assert out2["patient_sat"]["inserted"] == 1

    sat = pipe.sat_table(Patient.Default)
    cur = {r["patient_id"]: r["naam"] for r in sat.current().collect()}
    assert cur == {"p1": "Jan Jansen", "p3": "Kees"}
    dead = sat.head.read().filter("NOT _active").collect()
    assert [r["patient_id"] for r in dead] == ["p2"]


class Organisatie(HubEntity):
    __bk__ = ["org_id"]

    class Default(Sat):
        naam = Col()


class Zorginstelling(Organisatie):
    class Zorginstelling(Sat):
        agb = Col()


class Zorgverzekeraar(Organisatie):
    class Zorgverzekeraar(Sat):
        nummer = Col()


def test_two_mappings_one_hub_union(spark, tmp_path):
    """Two subtype-entity mappings share ONE hub (the reference's
    Organisatie pattern): their projections must UNION into a single hub
    merge per batch — two concurrent jobs on one table would race its
    single-writer commit log, and idempotence would silently drop the
    loser's keys."""
    mappings = [
        SorToEntityMapping(entity=Zorginstelling, filter="kind = 'zi'"),
        SorToEntityMapping(entity=Zorgverzekeraar, filter="kind = 'zv'"),
    ]
    pipe = Pipe(spark, str(tmp_path / "dv"), mappings, num_buckets=4)
    schema = "org_id string, kind string, naam string, agb string, nummer string, seq long, op string, ts timestamp"
    b1 = spark.createDataFrame(
        [
            ("o1", "zi", "Ziekenhuis A", "agb1", None, 1, "U", TS),
            ("o2", "zv", "Verzekeraar B", None, "n2", 2, "U", TS),
        ],
        schema,
    )
    out = pipe.run(b1, batch_id=1)
    # ONE hub job saw BOTH mappings' keys
    assert out["organisatie_hub"]["new_keys"] == 2
    hub_rows = pipe.hub_table(Organisatie).read().collect()
    assert {r["org_id"] for r in hub_rows} == {"o1", "o2"}
    # each subtype's sat got only its own rows
    zi = pipe.sat_table(Zorginstelling.Zorginstelling).current().collect()
    assert [(r["org_id"], r["agb"]) for r in zi] == [("o1", "agb1")]
    zv = pipe.sat_table(Zorgverzekeraar.Zorgverzekeraar).current().collect()
    assert [(r["org_id"], r["nummer"]) for r in zv] == [("o2", "n2")]
    # the shared Default sat (inherited by both subtypes) unioned both rows
    d = pipe.sat_table(Organisatie.Default).current().collect()
    assert {r["org_id"]: r["naam"] for r in d} == {
        "o1": "Ziekenhuis A", "o2": "Verzekeraar B"
    }


def test_link_reference_explicit_name_survives_class_binding():
    class A(HubEntity):
        __bk__ = ["a_id"]

    class L(LinkEntity):
        class Link(Link):
            subject = LinkReference(A, name="patient_subject")
            other = LinkReference(A)

    refs = L.__link__.cls_get_link_refs()
    assert refs["subject"].name == "patient_subject"  # explicit name kept
    assert refs["other"].name == "other"              # attribute name used
