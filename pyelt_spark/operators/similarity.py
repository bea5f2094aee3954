"""Approximate-nearest-neighbor search over an embedding column.

* ``cosine_topk``      — exact brute force: broadcast the (small) query set
                         against the corpus, fold the dot product with
                         ``zip_with``/``aggregate`` (JVM, codegen — no
                         Python), rank with a per-query window. The
                         baseline and the verifier for the ANN paths.
* ``ivf_topk``         — IVF-style scale path: corpus vectors are assigned
                         to deterministic hyperplane-signature cells
                         (coarse quantizer); each query probes only its own
                         cell ± nearest cells, turning O(N·Q) into
                         O(N·Q / cells · probes). Exact cosine inside the
                         probed cells.

Cosine is computed in double precision with a sequential left-to-right
fold, which makes the score bit-reproducible across engines (the DuckDB
oracle computes the identical expression).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(vec_col: str | Column) -> Column:
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.transform(c, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, x: s + x * x))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Exact top-k by cosine for each query vector (self-matches excluded).

    Queries are broadcast — the corpus is scanned once, never shuffled;
    ranking shuffles only Q·N candidate rows keyed by query id.
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), _as_double(vec_col).alias("_qv")
        ).withColumn("_qn", _norm(F.col("_qv")))
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("_cv")
    ).withColumn("_cn", _norm(F.col("_cv")))
    scored = (
        c.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(_dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn")), round_to),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def hyperplane_weights(planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplane weights, driver-side constants.

    weight(p, j) = first-nibble(sha256("p_j")) - 7.5 ∈ {-7.5 … 7.5}: no RNG
    state, exactly representable doubles, and — because they are embedded as
    LITERALS in both the Spark plan and the DuckDB oracle SQL — zero
    cross-engine transcendental-function risk (a sin()-based plane sign can
    flip between libm implementations when a projection sits near zero)."""
    import hashlib

    return [
        [
            int(hashlib.sha256(f"{p}_{j}".encode()).hexdigest()[0], 16) - 7.5
            for j in range(dim)
        ]
        for p in range(planes)
    ]


def weights_sql_literal(w: list[list[float]]) -> list[str]:
    """The same weights as DuckDB list literals (one per plane)."""
    return ["[" + ", ".join(repr(x) for x in row) + "]" for row in w]


def _cell_sig(v: Column, dim: int, planes: int) -> Column:
    """Deterministic hyperplane cell id (coarse quantizer)."""
    w = hyperplane_weights(planes, dim)
    exprs = [
        F.aggregate(
            F.zip_with(
                v,
                F.array(*[F.lit(x) for x in w[p]]),
                lambda x, wj: x * wj,
            ),
            F.lit(0.0),
            lambda s, x: s + x,
        )
        for p in range(planes)
    ]
    return F.concat_ws("", *[F.when(e > 0, "1").otherwise("0") for e in exprs])


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 4,
    round_to: int = 6,
    multiprobe: bool = False,
    dim: int | None = None,
) -> DataFrame:
    """ANN top-k: probe the query's hyperplane cell (single-probe IVF), or
    with ``multiprobe`` also every cell at Hamming distance 1 (flip each
    plane bit) — the classic recall/cost dial: probes × N/2^planes
    candidates per query instead of a full scan. Exact cosine + ranking
    inside the probed cells. ``dim`` (the embedding width) is required:
    the hyperplane weights are plan LITERALS, and probing the data for the
    width would cost a driver-blocking job before submit."""
    if dim is None:
        raise ValueError(
            "ivf_topk requires dim= (embedding width); the hyperplane "
            "weights are embedded as plan literals"
        )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("_cv")
    )
    c = c.withColumn("_cn", _norm(F.col("_cv"))).withColumn(
        "_cell", _cell_sig(F.col("_cv"), dim, planes)
    )
    q = (
        queries.select(F.col(id_col).alias("query_id"), _as_double(vec_col).alias("_qv"))
        .withColumn("_qn", _norm(F.col("_qv")))
        .withColumn("_cell", _cell_sig(F.col("_qv"), dim, planes))
    )
    if multiprobe:
        flips = [F.col("_cell")] + [
            F.concat(
                F.substring("_cell", 1, p),
                F.when(F.substring("_cell", p + 1, 1) == "1", "0").otherwise("1"),
                F.substring("_cell", p + 2, planes - p - 1),
            )
            for p in range(planes)
        ]
        q = q.withColumn("_cell", F.explode(F.array(*flips)))
    q = F.broadcast(q)
    scored = (
        c.join(q, "_cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(_dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn")), round_to),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
