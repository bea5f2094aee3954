"""Document deduplication operators for training-data pipelines.

Four families, each chosen for a different scale/accuracy point:

* ``exact_dedup``          — SHA-256 fingerprint groupBy. One shuffle of
                             (hash, id); map-side combine collapses dups early.
* ``ngram_jaccard_pairs``  — exact word-shingle Jaccard over an inverted
                             index (explode → self-join on shingle). Rare
                             shingles only (docfreq cap) to bound the join
                             fan-out; exact verification included.
* ``minhash_lsh_pairs``    — MinHash signatures + banded LSH: candidate
                             pairs meet only inside a band bucket, so the
                             quadratic blowup never materializes; candidates
                             are verified with exact Jaccard. The scale path
                             for 10^9+ docs.
* ``simhash64``            — 64-bit SimHash per document via a vectorized
                             Arrow pandas_udf (numpy bit-bucketing), plus
                             ``simhash_dup_pairs`` joining on exact signature
                             equality.
* ``embedding_dup_pairs``  — cosine near-duplicates over an embedding
                             column; random-hyperplane LSH bucketing with
                             exact cosine verification.

MinHash uses lexicographic MIN over SHA-256 hex digests of ``shingle:perm``
— deterministic, engine-portable (the DuckDB oracle computes the identical
signature), and free of any Python-side RNG.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from pyelt_spark.functions.text import fingerprint, normalized, shingles


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (after normalization) documents:
    (fingerprint, canonical_id, n_docs). Hash-groupBy — fully map-side
    combinable, no skew risk beyond genuinely duplicated content."""
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("canonical_id"), F.count("*").alias("n_docs"))
    )


def _doc_shingles(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    return df.select(F.col(id_col).alias("_id"), shingles(text_col, n).alias("_sh"))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.4,
    max_docfreq: int = 50,
) -> DataFrame:
    """Exact Jaccard near-dup pairs via an inverted shingle index.

    Shingles shared by more than ``max_docfreq`` docs are dropped from the
    index (stopword-shingle fan-out guard — at web scale one hot shingle
    otherwise produces a quadratic bucket). Pair Jaccard uses full shingle
    sets, so the cap only bounds candidate GENERATION, not verification.
    """
    docs = _doc_shingles(df, id_col, text_col, n).persist()
    sizes = docs.select("_id", F.size("_sh").alias("_n"))
    inv = docs.select("_id", F.explode("_sh").alias("_s"))
    rare = (
        inv.groupBy("_s")
        .agg(F.count("*").alias("_df"), F.collect_list("_id").alias("_ids"))
        .filter(F.col("_df") <= max_docfreq)
    )
    pairs = (
        rare.select(F.explode("_ids").alias("a"), F.col("_ids"))
        .select("a", F.explode("_ids").alias("b"))
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("_common_rare"))
    )
    # exact verification on full shingle sets
    sa = sizes.select(F.col("_id").alias("a"), F.col("_n").alias("_na"))
    sb = sizes.select(F.col("_id").alias("b"), F.col("_n").alias("_nb"))
    da = docs.select(F.col("_id").alias("a"), F.col("_sh").alias("_sha_"))
    db = docs.select(F.col("_id").alias("b"), F.col("_sh").alias("_shb_"))
    out = (
        pairs.join(da, "a").join(db, "b").join(sa, "a").join(sb, "b")
        .withColumn("_inter", F.size(F.array_intersect("_sha_", "_shb_")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("_inter").cast("double")
                / (F.col("_na") + F.col("_nb") - F.col("_inter")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("a").alias("doc_a"), F.col("b").alias("doc_b"), F.col("jaccard")
        )
    )
    return out


def minhash_signature(text_col: str | Column, num_perm: int = 12, n: int = 5) -> Column:
    """MinHash signature: for perm i, min over shingles of
    sha256(shingle || ':' || i) (lexicographic min over hex — deterministic
    and reproducible in any engine with sha256)."""
    sh = shingles(text_col, n)
    return F.array(
        *[
            F.array_min(
                F.transform(sh, lambda s: F.sha2(F.concat_ws(":", s, F.lit(str(i))), 256))
            )
            for i in range(num_perm)
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 12,
    bands: int = 4,
    n: int = 5,
    threshold: float = 0.4,
) -> DataFrame:
    """Banded-LSH candidate generation + exact Jaccard verification.

    ``num_perm/bands`` rows per band; two docs become candidates iff some
    band's sub-signature matches exactly. Candidates are then verified with
    exact Jaccard over full shingle sets — output equals the exact pair set
    restricted to LSH-recalled candidates.
    """
    rows_per_band = num_perm // bands
    sig = df.select(
        F.col(id_col).alias("_id"),
        minhash_signature(text_col, num_perm, n).alias("_sig"),
        shingles(text_col, n).alias("_sh"),
    ).persist()

    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws("|", *[F.col("_sig")[b * rows_per_band + r] for r in range(rows_per_band)]).alias("key"),
        )
        for b in range(bands)
    ]
    buckets = sig.select("_id", F.explode(F.array(*band_cols)).alias("_b")).select(
        "_id", F.col("_b.band").alias("_band"), F.col("_b.key").alias("_key")
    )
    cand = (
        buckets.alias("x")
        .join(buckets.alias("y"), ["_band", "_key"])
        .filter(F.col("x._id") < F.col("y._id"))
        .select(F.col("x._id").alias("a"), F.col("y._id").alias("b"))
        .distinct()
    )
    da = sig.select(F.col("_id").alias("a"), F.col("_sh").alias("_sha_"))
    db = sig.select(F.col("_id").alias("b"), F.col("_sh").alias("_shb_"))
    return (
        cand.join(da, "a").join(db, "b")
        .withColumn("_inter", F.size(F.array_intersect("_sha_", "_shb_")))
        .withColumn("_union", F.size("_sha_") + F.size("_shb_") - F.col("_inter"))
        .withColumn(
            "jaccard",
            F.round(F.col("_inter").cast("double") / F.col("_union").cast("double"), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(F.col("a").alias("doc_a"), F.col("b").alias("doc_b"), "jaccard")
    )


@pandas_udf(T.LongType())
def _simhash64(texts: pd.Series) -> pd.Series:
    """Vectorized 64-bit SimHash (Arrow batches; numpy inside)."""
    import hashlib

    import numpy as np

    out = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        if t is None:
            continue
        toks = str(t).lower().split()
        if not toks:
            continue
        acc = np.zeros(64, dtype=np.int64)
        shifts = np.arange(64, dtype=np.uint64)
        for tok in toks:
            h = np.uint64(
                int.from_bytes(hashlib.sha256(tok.encode()).digest()[:8], "big")
            )
            bits = ((h >> shifts) & np.uint64(1)).astype(np.int64)
            acc += bits * 2 - 1
        sig = np.uint64(0)
        sig = (((acc > 0).astype(np.uint64)) << shifts).sum(dtype=np.uint64)
        out[i] = np.int64(sig.astype(np.int64))
    return pd.Series(out)


def simhash64(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return df.select(F.col(id_col), _simhash64(F.col(text_col)).alias("simhash"))


def simhash_dup_pairs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Pairs with identical SimHash (hamming distance 0 — bucket join;
    hamming<=k variants bucket on signature chunks the same way)."""
    s = simhash64(df, id_col, text_col)
    a = s.select(F.col(id_col).alias("doc_a"), F.col("simhash"))
    b = s.select(F.col(id_col).alias("doc_b"), F.col("simhash"))
    return a.join(b, "simhash").filter(F.col("doc_a") < F.col("doc_b")).select(
        "doc_a", "doc_b", "simhash"
    )


def embedding_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    planes: int = 8,
) -> DataFrame:
    """Cosine near-duplicates via random-hyperplane LSH + exact verify.

    Hyperplanes are pseudo-random but fully deterministic: component j of
    plane p is sin(1 + p*dim + j) — reproducible anywhere, no RNG state.
    """
    dim = len(df.select(vec_col).first()[0])
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    planes_expr = [
        F.aggregate(
            F.zip_with(
                v,
                F.transform(
                    F.sequence(F.lit(0), F.lit(dim - 1)),
                    lambda j: F.sin(F.lit(1.0) + F.lit(float(p * dim)) + j.cast("double")),
                ),
                lambda x, w: x * w,
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        for p in range(planes)
    ]
    sig = F.concat_ws(
        "", *[F.when(pe > 0, F.lit("1")).otherwise(F.lit("0")) for pe in planes_expr]
    )
    base = df.select(
        F.col(id_col).alias("_id"), v.alias("_v"), norm.alias("_n"), sig.alias("_sig")
    ).persist()
    a = base.select(
        F.col("_id").alias("doc_a"), F.col("_v").alias("_va"), F.col("_n").alias("_na"), "_sig"
    )
    b = base.select(
        F.col("_id").alias("doc_b"), F.col("_v").alias("_vb"), F.col("_n").alias("_nb"), "_sig"
    )
    dot = F.aggregate(
        F.zip_with(F.col("_va"), F.col("_vb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.join(b, "_sig")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("cosine", F.round(dot / (F.col("_na") * F.col("_nb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("doc_a", "doc_b", "cosine")
    )
