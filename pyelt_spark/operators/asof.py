"""As-of (point-in-time) join — the SCD-lookup operator Spark lacks.

The reference's datamart layer resolves each fact row against the
dimension version valid at the fact's event time (pygrametl ``scdensure``
/ ``lookupasof`` delegated from pyelt/datalayers/dm.py:1-110). Spark has
no asof join, and the naive formulation —

    fact JOIN dim ON key AND valid_from <= ts AND ts < valid_to

— is an equi-join on the key followed by a per-key interval filter. That
is fine when versions-per-key is small, but at 100 TB a hot key with many
versions fans every fact row out across ALL its versions before the range
filter kills them (versions × facts intermediate rows).

``asof_join`` here is the UNION + WINDOW formulation instead: tag right
(version-start) rows and left (fact) rows, union them, and per key take
``last(<packed right row>, ignorenulls=True)`` over an ordered running
window. One shuffle, intermediate size = |facts| + |versions|, never their
product; hot keys cost their own row count, not a cross product. Right
columns travel as ONE struct so legitimately-null right attributes cannot
leak an older version's value through ignorenulls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    allow_exact: bool = True,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the most recent right row per ``keys`` with
    ``right_ts <= left_ts`` (or strictly ``<`` when ``allow_exact=False``).
    Left rows with no earlier right row get nulls. Output = left columns +
    the requested right columns (suffixed on collision).
    """
    right_cols = right_cols or [
        c for c in right.columns if c not in keys and c != right_ts
    ]
    out_names = {
        c: (c + suffix if c in left.columns else c) for c in right_cols
    }
    packed = F.struct(*[F.col(c) for c in right_cols])
    r = right.select(
        *keys,
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0 if allow_exact else 1).alias("_asof_side"),
        packed.alias("_asof_r"),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1 if allow_exact else 0).alias("_asof_side"),
        F.lit(None).cast(r.schema["_asof_r"].dataType).alias("_asof_r"),
    )
    extra = [c for c in left.columns if c not in keys]
    r_aligned = r.select(
        *keys,
        "_asof_ts",
        "_asof_side",
        "_asof_r",
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in extra],
    )
    unioned = l.select(
        *keys, "_asof_ts", "_asof_side", "_asof_r", *extra
    ).unionByName(r_aligned)
    # at equal ts: with allow_exact the right row sorts first (side 0 < 1)
    # and is visible to the left row; without, the left row sorts first.
    # Two RIGHT rows tying on (keys, ts) would otherwise attach
    # nondeterministically across runs/partitionings — xxhash64 of the
    # packed right struct is the deterministic tiebreak (same rule as the
    # dedup operators' payload-hash tiebreak; ADVICE r2): last() takes the
    # max-hash version. Left rows hash a constant null struct, and their
    # relative order never matters (they contribute only nulls the
    # ignorenulls window skips).
    w = (
        Window.partitionBy(*keys)
        .orderBy("_asof_ts", "_asof_side", F.xxhash64("_asof_r"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    resolved = unioned.withColumn("_asof_hit", F.last("_asof_r", ignorenulls=True).over(w))
    is_left = F.col("_asof_side") == F.lit(1 if allow_exact else 0)
    return resolved.filter(is_left).select(
        *keys,
        *extra,
        *[F.col("_asof_hit")[c].alias(out_names[c]) for c in right_cols],
    )
