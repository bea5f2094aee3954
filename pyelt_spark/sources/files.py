"""File sources: CSV with header reflection, fixed-length records, queries.

Reference parity:
* CSV reflect — header-infer + cleaned column names
  (pyelt/sources/files.py:61-70; name cleaning pyelt/datalayers/
  database.py:305-317): lowercase, spaces and separators → underscore,
  non-alphanumerics stripped, leading digits prefixed.
* Fixed-length files — column defs (name, start, length) projected with
  ``substring`` (pyelt/sources/files.py:73-96).
* SourceQuery — arbitrary SQL against registered views
  (pyelt/sources/databases.py:172-248); Spark-side this is just
  ``spark.sql`` after ``createOrReplaceTempView``.

All SOR-bound columns arrive as strings (reference contract,
pyelt/process/ddl.py:350-365); typing happens at sat projection via casts.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def clean_name(name: str) -> str:
    """Column-name cleaning (database.py:305-317 semantics): lowercase,
    whitespace/dots/dashes → underscore, other non-alnum dropped, names
    starting with a digit get a leading underscore."""
    n = name.strip().lower()
    n = re.sub(r"[\s.\-/]+", "_", n)
    n = re.sub(r"[^a-z0-9_]", "", n)
    if not n:
        n = "col"
    if n[0].isdigit():
        n = "_" + n
    return n


def read_csv(
    spark: SparkSession,
    path: str,
    delimiter: str = ";",
    header: bool = True,
    encoding: str = "UTF-8",
) -> DataFrame:
    """CSV source with header reflection + cleaned names; all columns
    stay strings (SOR contract)."""
    df = (
        spark.read.option("header", str(header).lower())
        .option("sep", delimiter)
        .option("encoding", encoding)
        .option("inferSchema", "false")
        .csv(path)
    )
    seen: dict[str, int] = {}
    cols = []
    for c in df.columns:
        base = clean_name(c)
        k = seen.get(base, 0)
        seen[base] = k + 1
        cols.append(f"{base}_{k}" if k else base)
    return df.toDF(*cols)


@dataclass
class FixedWidthField:
    name: str
    start: int   # 1-based, like the reference's import defs
    length: int


def read_fixed_width(
    spark: SparkSession, path: str, fields: list[FixedWidthField]
) -> DataFrame:
    """Fixed-length records: one substring projection per declared field
    (files.py:73-96). Trims right-padding; empty → NULL."""
    raw = spark.read.text(path)
    cols = [
        F.nullif(F.rtrim(F.substring(F.col("value"), f.start, f.length)), F.lit("")).alias(
            clean_name(f.name)
        )
        for f in fields
    ]
    return raw.select(*cols)


def source_query(spark: SparkSession, sql: str, views: dict[str, DataFrame] | None = None) -> DataFrame:
    """Arbitrary-SQL source (SourceQuery analog): register the given frames
    as temp views, run the query, return the reflected DataFrame."""
    for name, df in (views or {}).items():
        df.createOrReplaceTempView(name)
    return spark.sql(sql)
