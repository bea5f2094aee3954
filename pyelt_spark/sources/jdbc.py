"""JDBC database extract — SourceTable / SourceQuery analog.

The reference's primary source type is a live database table pulled with
generated SQL (pyelt/sources/databases.py:92-169: ``SourceTable.load`` with
``filter`` + ``ignore_fields``, ``SourceQuery`` wrapping arbitrary SQL, and
an ``md5_only`` mode that computes the row hash INSIDE the source database
so only (key, hash) crosses the wire).

Spark-first shape: the extract is a ``spark.read.jdbc`` scan —

* column pruning (ignore_fields) and the row filter are pushed into the
  source via a dbtable SUBQUERY, so the database does the cutting;
* the scan parallelizes with ``partitionColumn`` bounds (N concurrent
  range-bounded SELECTs — the 100 TB extract path; the reference is a
  single cursor);
* hash-only extracts push the digest into the subquery per dialect
  (postgres ``md5(coalesce(c::text,'')||…)``, reference parity) so the
  transfer is (keys, hash) only.

This sandbox ships no JDBC driver jar, so ``DbSource(parquet_dir=…)`` is a
stand-in backend: the same API runs every downstream path against a
directory of ``{table}.parquet`` files (filters/pruning applied by
Catalyst instead of the remote engine). The SQL generators are pure
functions and unit-tested directly; the jdbc branch is exercised the day a
driver jar is on the classpath, with no caller change.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class DbSource:
    """A database (or its parquet stand-in) to extract from."""

    url: str | None = None                      # jdbc:postgresql://…
    properties: dict = field(default_factory=dict)  # user/password/driver
    dialect: str = "postgres"
    parquet_dir: str | None = None              # sandbox stand-in backend

    @property
    def is_jdbc(self) -> bool:
        return self.url is not None


# --------------------------------------------------------------------- SQL


def select_sql(
    table: str,
    columns: list[str] | None = None,
    ignore_fields: list[str] | None = None,
    filter: str = "",
) -> str:
    """The pushdown subquery (databases.py:150-162 shape): explicit column
    list minus ignore_fields, optional WHERE."""
    cols = "*"
    if columns:
        keep = [c for c in columns if c not in set(ignore_fields or [])]
        cols = ", ".join(keep)
    sql = f"SELECT {cols} FROM {table}"
    if filter:
        sql += " WHERE " + filter.replace("WHERE", "").strip()
    return sql


def hash_only_sql(
    table: str,
    keys: list[str],
    columns: list[str],
    ignore_fields: list[str] | None = None,
    dialect: str = "postgres",
) -> str:
    """(keys, _hash) extract with the digest computed AT THE SOURCE
    (databases.py:119-141): only key + hash cross the wire.

    Deliberate divergence from the reference: fields are joined with an
    explicit unit separator (U+001F) so a boundary shift like
    ('ab','c')→('a','bc') changes the digest, and the Oracle branch
    NVL-coalesces each field so one NULL doesn't null the whole concat —
    the reference's databases.py concatenates bare fields, inheriting both
    collision surfaces silently (ADVICE r2)."""
    fields = [c for c in columns if c not in set(ignore_fields or [])]
    sep = "\x1f"  # unit separator: unambiguous field boundary
    if dialect == "postgres":
        concat = f"||'{sep}'||".join(f"coalesce({c}::text, '')" for c in fields)
        h = f"md5({concat})"
    elif dialect == "sqlserver":
        concat = f"+'{sep}'+".join(
            f"rtrim(coalesce(convert(varchar(max), {c}), ''))" for c in fields
        )
        h = f"CONVERT(NVARCHAR(32), HashBytes('MD5', {concat}), 2)"
    else:  # oracle
        concat = f"||'{sep}'||".join(f"NVL(TO_CHAR({c}), '')" for c in fields)
        h = (
            "RAWTOHEX(UTL_RAW.CAST_TO_RAW("
            f"sys.dbms_obfuscation_toolkit.md5(INPUT_STRING => {concat})))"
        )
    return f"SELECT {', '.join(keys)}, {h} AS _hash FROM {table}"


# ------------------------------------------------------------------ extract


def _jdbc_reader(spark: SparkSession, src: DbSource, dbtable: str):
    r = spark.read.format("jdbc").option("url", src.url).option("dbtable", dbtable)
    for k, v in src.properties.items():
        r = r.option(k, v)
    return r


def read_table(
    spark: SparkSession,
    src: DbSource,
    table: str,
    filter: str = "",
    ignore_fields: list[str] | None = None,
    partition_col: str | None = None,
    num_partitions: int = 8,
    lower_bound=None,
    upper_bound=None,
) -> DataFrame:
    """Full-extract a table (SourceTable.load analog). With
    ``partition_col`` + bounds the jdbc scan splits into ``num_partitions``
    concurrent range queries."""
    if src.is_jdbc:
        dbtable = f"({select_sql(table, None, ignore_fields, filter)}) AS _x"
        r = _jdbc_reader(spark, src, dbtable)
        if partition_col is not None:
            r = (
                r.option("partitionColumn", partition_col)
                .option("numPartitions", str(num_partitions))
                .option("lowerBound", str(lower_bound))
                .option("upperBound", str(upper_bound))
            )
        return r.load()
    df = spark.read.parquet(os.path.join(src.parquet_dir, f"{table}.parquet"))
    if ignore_fields:
        df = df.drop(*ignore_fields)
    if filter:
        df = df.filter(F.expr(filter.replace("WHERE", "").strip()))
    return df


def read_query(spark: SparkSession, src: DbSource, sql: str, name: str = "q") -> DataFrame:
    """SourceQuery analog: extract an arbitrary SELECT."""
    if src.is_jdbc:
        return _jdbc_reader(spark, src, f"({sql}) AS {name}").load()
    for t in os.listdir(src.parquet_dir):
        if t.endswith(".parquet"):
            n = t[: -len(".parquet")]
            spark.read.parquet(os.path.join(src.parquet_dir, t)).createOrReplaceTempView(n)
    return spark.sql(sql)


def hash_only_extract(
    spark: SparkSession,
    src: DbSource,
    table: str,
    keys: list[str],
    ignore_fields: list[str] | None = None,
) -> DataFrame:
    """(keys, _hash) change-probe extract (md5_only analog). jdbc: digest
    computed in the source database (hash_only_sql). Stand-in: the engine's
    canonical sha-256 hashdiff computed Spark-side over the same fields —
    different digest function, same contract (any value change flips the
    hash; the merge only ever compares hashes it produced itself)."""
    if src.is_jdbc:
        # column list comes from a 0-row probe so the subquery can name them
        probe = _jdbc_reader(spark, src, f"(SELECT * FROM {table} WHERE 1=0) AS _p").load()
        dbtable = f"({hash_only_sql(table, keys, probe.columns, ignore_fields, src.dialect)}) AS _h"
        return _jdbc_reader(spark, src, dbtable).load()
    from pyelt_spark.functions.hashing import hashdiff

    df = spark.read.parquet(os.path.join(src.parquet_dir, f"{table}.parquet"))
    fields = [c for c in df.columns if c not in set(ignore_fields or [])]
    return df.select(*keys, hashdiff([c for c in fields if c not in keys]).alias("_hash"))
