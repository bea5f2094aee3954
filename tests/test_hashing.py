import hashlib

from pyspark.sql import functions as F

from pyelt_spark.functions.hashing import (
    NULL_TOKEN,
    SEP,
    HashRecipe,
    business_key,
    hash_key,
    hashdiff,
)


def test_hash_key_matches_reference_sha256(spark):
    df = spark.createDataFrame([("conv-1", 3)], ["conv_id", "turn_idx"])
    got = df.select(hash_key("conv_id", "turn_idx").alias("k")).first()["k"]
    expect = hashlib.sha256(f"conv-1{SEP}3".encode()).hexdigest()
    assert got == expect


def test_null_vs_empty_string_distinct(spark):
    df = spark.createDataFrame([(None, ""), ("", None)], ["a", "b"])
    out = df.select(hashdiff(["a", "b"]).alias("h")).collect()
    assert out[0]["h"] != out[1]["h"]
    expect0 = hashlib.sha256(f"{NULL_TOKEN}{SEP}".encode()).hexdigest()
    assert out[0]["h"] == expect0


def test_business_key_join(spark):
    df = spark.createDataFrame([("p1", "t9")], ["p", "t"])
    assert df.select(business_key("p", "t").alias("bk")).first()["bk"] == "p1.t9"


def test_recipe_evolution_roundtrip():
    r = HashRecipe.initial(["role", "text", "tool"])
    assert r.current_version == 1
    v2 = r.evolve(["role", "text", "tool", "meta"])
    assert v2 == 2 and r.current_cols[-1] == "meta"
    # no-op evolve
    assert r.evolve(["role", "text"]) == 2
    r2 = HashRecipe.from_json(r.to_json())
    assert r2.versions == r.versions


def test_recipe_hashdiff_versions_differ(spark):
    r = HashRecipe.initial(["a"])
    r.evolve(["a", "b"])
    df = spark.createDataFrame([("x", "y")], ["a", "b"])
    row = df.select(
        r.hashdiff_for(1).alias("h1"), r.hashdiff_for(2).alias("h2")
    ).first()
    assert row["h1"] != row["h2"]
    assert row["h1"] == hashlib.sha256(b"x").hexdigest()
