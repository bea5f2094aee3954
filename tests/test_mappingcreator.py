"""Mapping codegen parity (reference helpers/mappingcreator.py:1-115):
reflect a source schema, emit entity + mapping boilerplate, and prove the
generated code actually compiles into a usable declaration."""

from pyspark.sql import types as T

from pyelt_spark.helpers.mappingcreator import entity_code, mapping_code

SCHEMA = T.StructType(
    [
        T.StructField("patient_id", T.StringType()),
        T.StructField("naam", T.StringType()),
        T.StructField("geboren", T.TimestampType()),
        T.StructField("gewicht", T.DoubleType()),
        T.StructField("_runid", T.LongType()),
    ]
)


def test_entity_code_declares_bk_and_typed_cols():
    src = entity_code(SCHEMA, "Patient", bk=["patient_id"])
    assert "class Patient(HubEntity):" in src
    assert "__bk__ = ['patient_id']" in src
    assert "naam = Col()" in src
    assert "geboren = Col('timestamp')" in src
    assert "gewicht = Col('double')" in src
    assert "_runid" not in src  # system columns are never reflected

    ns = {}
    exec(
        "from pyelt_spark.plans.domain import Col, HubEntity, Sat\n" + src, ns
    )
    ent = ns["Patient"]
    assert ent.__bk__ == ["patient_id"]
    assert list(ent.Default.__cols__) == ["naam", "geboren", "gewicht"]
    assert ent.Default.__cols__["gewicht"].dtype == "double"


def test_entity_code_exclude_and_empty_payload():
    src = entity_code(SCHEMA, "Empty", bk=["patient_id"], exclude=["naam", "geboren", "gewicht"])
    assert "pass" in src
    ns = {}
    exec("from pyelt_spark.plans.domain import Col, HubEntity, Sat\n" + src, ns)
    assert list(ns["Empty"].Default.__cols__) == []


def test_mapping_code_lists_fields_and_casts(spark):
    df = spark.createDataFrame([], SCHEMA)
    src = mapping_code(df, "Patient", source_name="sor_patient")
    assert "def sor_patient_to_patient_mappings():" in src
    assert "# patient_id, naam, geboren, gewicht" in src
    assert "'geboren': 'CAST(geboren AS timestamp)'" in src
    assert "'naam': 'naam'" in src

    ns = {}
    exec(
        "from pyelt_spark.plans.pipe import SorToEntityMapping\n"
        "from pyelt_spark.plans.domain import Col, HubEntity, Sat\n"
        "class Patient(HubEntity):\n"
        "    __bk__ = ['patient_id']\n"
        "    class Default(Sat):\n"
        "        naam = Col()\n" + src,
        ns,
    )
    mappings = ns["sor_patient_to_patient_mappings"]()
    assert len(mappings) == 1
    assert mappings[0].entity is ns["Patient"]
    assert mappings[0].field_map["geboren"] == "CAST(geboren AS timestamp)"
