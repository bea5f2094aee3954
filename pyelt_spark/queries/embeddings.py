"""Embedding driver queries: brute-force and IVF ANN top-k, hyperplane
LSH near-duplicates, int8 quantization — oracles carry the identical
literal hyperplane weights so both engines compute the same cells."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyelt_spark.queries.common import _t


def q_ann_cosine_topk(spark, sf_dir):
    from pyelt_spark.operators.similarity import cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    return cosine_topk(emb, queries, k=5)


SQL_ANN_COSINE_TOPK = """
WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 8),
c AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS cv FROM embeddings),
scored AS (
  SELECT qid AS query_id, nid AS neighbor_id,
    round(list_dot_product(qv, cv)
          / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6) AS cosine
  FROM q, c WHERE nid <> qid
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 5
"""


def _dup_corpus(spark, sf_dir):
    """Derived near-dup corpus: every embedding plus a near-identical twin
    (vec_id + 100000, component 0 scaled ×1.001) — deterministic in both
    engines, so the LSH path has a real match set to recall (the raw table's
    only close pair sits at cosine ≈0.51, below the near-dup regime LSH is
    built for)."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v")
    )
    twin = emb.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            F.col("v"), lambda x, i: F.when(i == 0, x * F.lit(1.001)).otherwise(x)
        ).alias("v"),
    )
    return emb.unionByName(twin)


def q_embedding_dup_pairs(spark, sf_dir):
    """Cosine near-dup pairs via BANDED hyperplane LSH + exact verification
    (operators/docdedup.embedding_dup_pairs — the scale path: candidates
    meet only inside a (band, key) bucket, verified pairs ⊆ brute force).
    The brute-force SQL twin is the oracle: output must be IDENTICAL, i.e.
    the banding recalled every true pair."""
    from pyelt_spark.operators.docdedup import embedding_dup_pairs

    corpus = _dup_corpus(spark, sf_dir)
    return embedding_dup_pairs(
        corpus, id_col="vec_id", vec_col="v",
        threshold=0.98, bands=4, rows_per_band=8, dim=64,
    ).select(
        F.col("doc_a").alias("vec_a"), F.col("doc_b").alias("vec_b"), "cosine"
    )


SQL_EMBEDDING_DUP_PAIRS = """
WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
e AS (
  SELECT vec_id, v FROM base
  UNION ALL
  SELECT vec_id + 100000,
    list_transform(range(1, len(v) + 1),
                   i -> CASE WHEN i = 1 THEN v[i] * 1.001 ELSE v[i] END)
  FROM base
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
  round(list_dot_product(a.v, b.v)
        / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
FROM e a, e b
WHERE a.vec_id < b.vec_id
  AND list_dot_product(a.v, b.v)
      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.98
"""


def q_ann_ivf_topk(spark, sf_dir):
    """IVF-cell ANN (recall < 1 by design vs full-scan; EXACT within the
    probed cells). The oracle reproduces the cell assignment in SQL with the
    same literal hyperplane weights and brute-forces inside the cells, so
    this is a full value check of the IVF path."""
    from pyelt_spark.operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    return ivf_topk(emb, emb.filter(F.col("vec_id") < 8), k=5, planes=3, dim=64)


def _ivf_oracle_sql(planes: int = 3, dim: int = 64, k: int = 5) -> str:
    from pyelt_spark.operators.similarity import hyperplane_weights, weights_sql_literal

    lits = weights_sql_literal(hyperplane_weights(planes, dim))
    cell = "concat(" + ", ".join(
        f"CASE WHEN list_dot_product(v, {w}) > 0 THEN '1' ELSE '0' END" for w in lits
    ) + ")"
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
sig AS (SELECT vec_id, v, {cell} AS cell FROM e),
q AS (SELECT vec_id AS qid, v AS qv, cell FROM sig WHERE vec_id < 8),
scored AS (
  SELECT qid AS query_id, s.vec_id AS neighbor_id,
    round(list_dot_product(qv, s.v)
          / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(s.v, s.v))), 6) AS cosine
  FROM q JOIN sig s USING (cell) WHERE s.vec_id <> qid
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {k}
"""


SQL_ANN_IVF_TOPK = _ivf_oracle_sql()


def q_ann_ivf_multiprobe(spark, sf_dir):
    """Multi-probe IVF (probe the query's cell plus every Hamming-1 flip —
    the recall/cost dial). The oracle expands the same probe set in SQL,
    so this value-checks the multiprobe path end-to-end."""
    from pyelt_spark.operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    return ivf_topk(
        emb, emb.filter(F.col("vec_id") < 8), k=5, planes=3, dim=64, multiprobe=True
    )


def _ivf_multiprobe_oracle_sql(planes: int = 3, dim: int = 64, k: int = 5) -> str:
    from pyelt_spark.operators.similarity import hyperplane_weights, weights_sql_literal

    lits = weights_sql_literal(hyperplane_weights(planes, dim))
    cell = "concat(" + ", ".join(
        f"CASE WHEN list_dot_product(v, {w}) > 0 THEN '1' ELSE '0' END" for w in lits
    ) + ")"
    flips = ", ".join(
        "concat(substr(cell, 1, {p0}), CASE substr(cell, {p}, 1) WHEN '1' THEN '0' "
        "ELSE '1' END, substr(cell, {p1}, {rest}))".format(
            p0=p, p=p + 1, p1=p + 2, rest=planes - p - 1
        )
        for p in range(planes)
    )
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
sig AS (SELECT vec_id, v, {cell} AS cell FROM e),
q AS (
  SELECT vec_id AS qid, v AS qv, unnest([cell, {flips}]) AS cell
  FROM sig WHERE vec_id < 8
),
scored AS (
  SELECT qid AS query_id, s.vec_id AS neighbor_id,
    round(list_dot_product(qv, s.v)
          / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(s.v, s.v))), 6) AS cosine
  FROM q JOIN sig s USING (cell) WHERE s.vec_id <> qid
  GROUP BY 1, 2, 3
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {k}
"""


SQL_ANN_IVF_MULTIPROBE = _ivf_multiprobe_oracle_sql()


def q_embedding_quantize(spark, sf_dir):
    """int8 symmetric quantization of the embedding column (the storage
    shape a 10^9-vector ANN index wants): per-vector max-abs scale,
    exploded to scalar rows so every engine hashes identically."""
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    scale = F.aggregate(v, F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x)))
    q = F.transform(v, lambda x: F.round(x * 127.0 / scale).cast("int"))
    out = emb.select(
        "vec_id", F.round(scale, 6).alias("scale"), F.posexplode(q).alias("dim", "q8")
    )
    return out.select("vec_id", "scale", "dim", "q8")


SQL_EMBEDDING_QUANTIZE = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 50
),
s AS (
  SELECT vec_id, v,
    list_reduce(list_transform(v, x -> abs(x)), (a, b) -> greatest(a, b)) AS scale
  FROM e
)
SELECT vec_id, round(scale, 6) AS scale,
  CAST(i - 1 AS INTEGER) AS dim,
  CAST(round(v[i] * 127.0 / scale) AS INTEGER) AS q8
FROM s, unnest(range(1, len(v) + 1)) AS t(i)
"""


QUERIES = {
    "ann_cosine_topk": q_ann_cosine_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "ann_ivf_multiprobe": q_ann_ivf_multiprobe,
    "embedding_dup_pairs": q_embedding_dup_pairs,
    "embedding_quantize": q_embedding_quantize,
}

ORACLES = {
    "ann_cosine_topk": SQL_ANN_COSINE_TOPK,
    "ann_ivf_topk": SQL_ANN_IVF_TOPK,
    "ann_ivf_multiprobe": SQL_ANN_IVF_MULTIPROBE,
    "embedding_dup_pairs": SQL_EMBEDDING_DUP_PAIRS,
    "embedding_quantize": SQL_EMBEDDING_QUANTIZE,
}
