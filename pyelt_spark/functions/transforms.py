"""Field-transformation pipeline — the reference's transformation DSL.

Reference parity:
* chained step pipelines with ``{fld}`` / ``{stepN}`` substitution
  composing nested SQL (pyelt/mappings/transformations.py:13-63; test
  tests/unit_tests_basic/test06_transformations.py:6-32)
* lookup transform — scalar-subquery code lookup
  (transformations.py:130-164)
* constant values (pyelt/mappings/base.py:146-159) and inline casts
  (pyelt/mappings/sor_to_dv_mappings.py:104-108)

Spark shape: a transform step is ``Column -> Column``; chains compose
functions instead of string-formatting SQL. Lookups become broadcast
joins (no per-row subqueries)."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Step = Callable[[Column], Column]


@dataclass
class FieldTransform:
    """Ordered step pipeline over one source column.

    >>> t = FieldTransform([lambda c: F.lower(c),
    ...                     lambda c: F.concat(c, F.lit('01'))])
    >>> df.select(t('id').alias('bk'))
    """

    steps: list[Step] = field(default_factory=list)

    def then(self, step: Step) -> "FieldTransform":
        return FieldTransform(self.steps + [step])

    def __call__(self, col: str | Column) -> Column:
        c = F.col(col) if isinstance(col, str) else col
        for s in self.steps:
            c = s(c)
        return c


def apply_sql_chain(df: DataFrame, src_col: str, templates: list[str], out_col: str) -> DataFrame:
    """Apply a chain of SQL-fragment templates (``{fld}`` = previous step's
    result) — direct analog of the reference's ``{fld}``/``{stepN}``
    composition, evaluated as one nested expression by Catalyst."""
    expr = src_col
    for t in templates:
        expr = t.format(fld=expr)
    return df.withColumn(out_col, F.expr(expr))


def lookup(
    df: DataFrame,
    lookup_df: DataFrame,
    on: str,
    value_col: str,
    out_col: str,
    default: str | None = None,
) -> DataFrame:
    """Code lookup as a broadcast join (replaces the reference's scalar
    subquery at transformations.py:130-164)."""
    lk = F.broadcast(lookup_df.select(F.col(on), F.col(value_col).alias(out_col)))
    out = df.join(lk, on, "left")
    if default is not None:
        out = out.withColumn(out_col, F.coalesce(F.col(out_col), F.lit(default)))
    return out


def constant(value) -> Column:
    """ConstantValue (base.py:146-159)."""
    return F.lit(value)
