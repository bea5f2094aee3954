"""Training-data document queries: text analysis (tokens, quality,
language id, fingerprints, BPE-ish counts, winnowing, unigram
cross-entropy) and the dedup family (exact, n-gram Jaccard, MinHash+LSH,
SimHash, clusters, decontamination) — each with a DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyelt_spark.operators.docdedup import simhash_oracle_sql
from pyelt_spark.queries.common import _t


SQL_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


_EN = "['the','a','of','and','to','in','is','that','it','for']"


_DE = "['der','die','das','und','ist','ein','zu','mit','von','nicht']"


_FR = "['le','la','les','et','est','un','une','de','que','pour']"


_ES = "['el','la','los','y','es','un','una','de','que','por']"


def q_doc_token_count(spark, sf_dir):
    from pyelt_spark.functions.text import token_count

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", token_count("text").alias("n_tokens"))


SQL_DOC_TOKEN_COUNT = """
SELECT doc_id, len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
FROM documents
"""


def q_doc_quality(spark, sf_dir):
    from pyelt_spark.functions.text import quality_score

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", quality_score("text").alias("quality"))


SQL_DOC_QUALITY = f"""
WITH t AS (
  SELECT doc_id, text,
    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) AS n_tok,
    CAST(len(text) - len(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) AS n_punct,
    CAST(len(list_filter(string_split({SQL_NORM}, ' '), x -> list_contains({_EN}, x))) AS DOUBLE) AS n_stop
  FROM documents
)
SELECT doc_id,
  round((
    least(n_tok / 100.0, 1.0)
    + (1.0 - least(n_punct / greatest(CAST(len(text) AS DOUBLE), 1.0) * 5, 1.0))
    + least(n_stop / greatest(n_tok, 1.0) * 4, 1.0)
  ) / 3, 6) AS quality
FROM t
"""


def q_doc_langid(spark, sf_dir):
    from pyelt_spark.functions.text import langid

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", langid("text").alias("lang_guess"))


SQL_DOC_LANGID = f"""
WITH t AS (
  SELECT doc_id, lang, string_split({SQL_NORM}, ' ') AS w FROM documents
),
h AS (
  SELECT doc_id, lang,
    len(list_filter(w, x -> list_contains({_EN}, x))) AS en,
    len(list_filter(w, x -> list_contains({_DE}, x))) AS de,
    len(list_filter(w, x -> list_contains({_FR}, x))) AS fr,
    len(list_filter(w, x -> list_contains({_ES}, x))) AS es
  FROM t
)
SELECT doc_id, lang,
  CASE
    WHEN en > 0 AND en = greatest(en, de, fr, es) THEN 'en'
    WHEN de > 0 AND de = greatest(en, de, fr, es) THEN 'de'
    WHEN fr > 0 AND fr = greatest(en, de, fr, es) THEN 'fr'
    WHEN es > 0 AND es = greatest(en, de, fr, es) THEN 'es'
    ELSE 'und' END AS lang_guess
FROM h
"""


def q_doc_fingerprint(spark, sf_dir):
    from pyelt_spark.functions.text import fingerprint

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint("text").alias("fingerprint"))


SQL_DOC_FINGERPRINT = f"""
SELECT doc_id, sha256({SQL_NORM}) AS fingerprint FROM documents
"""


def q_dedup_exact(spark, sf_dir):
    from pyelt_spark.operators.docdedup import exact_dedup

    return exact_dedup(_t(spark, sf_dir, "documents"))


SQL_DEDUP_EXACT = f"""
SELECT sha256({SQL_NORM}) AS fingerprint,
  min(doc_id) AS canonical_id, count(*) AS n_docs
FROM documents GROUP BY 1
"""


SQL_SHINGLES3 = f"""
norm AS (SELECT doc_id, {SQL_NORM} AS t FROM documents),
toks AS (SELECT doc_id, string_split(t, ' ') AS w FROM norm),
sh AS (
  SELECT doc_id,
    list_distinct(list_transform(
      range(0, greatest(len(w) - 3, 0) + 1),
      i -> array_to_string(list_slice(w, i + 1, i + 3), ' ')
    )) AS s
  FROM toks
)
"""


def q_dedup_ngram_jaccard(spark, sf_dir):
    from pyelt_spark.operators.docdedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), n=3, threshold=0.12, max_docfreq=50
    )


SQL_DEDUP_NGRAM_JACCARD = f"""
WITH {SQL_SHINGLES3},
inv AS (SELECT doc_id, unnest(s) AS sg FROM sh),
rare AS (SELECT sg, list(doc_id) AS ids FROM inv GROUP BY sg HAVING count(*) <= 50),
p1 AS (SELECT unnest(ids) AS a, ids FROM rare),
pairs AS (
  SELECT a, unnest(ids) AS b FROM p1
),
cand AS (SELECT a, b FROM pairs WHERE a < b GROUP BY a, b),
sz AS (SELECT doc_id, len(s) AS n FROM sh)
SELECT c.a AS doc_a, c.b AS doc_b,
  round(CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
        / CAST(za.n + zb.n - len(list_intersect(sa.s, sb.s)) AS DOUBLE), 6) AS jaccard
FROM cand c
JOIN sh sa ON sa.doc_id = c.a
JOIN sh sb ON sb.doc_id = c.b
JOIN sz za ON za.doc_id = c.a
JOIN sz zb ON zb.doc_id = c.b
WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
      / CAST(za.n + zb.n - len(list_intersect(sa.s, sb.s)) AS DOUBLE) >= 0.12
"""


def q_dedup_minhash_lsh(spark, sf_dir):
    from pyelt_spark.operators.docdedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), num_perm=12, bands=4, n=3, threshold=0.12
    )


_MINHASH_COLS = ",\n    ".join(
    f"list_min(list_transform(hx, h -> substr(h, {1 + 10 * i}, 10))) AS m{i}"
    for i in range(12)
)


_BAND_SELECTS = "\nUNION ALL\n".join(
    f"SELECT doc_id, {b} AS band, concat_ws('|', m{b * 3}, m{b * 3 + 1}, m{b * 3 + 2}) AS key FROM sig"
    for b in range(4)
)


SQL_DEDUP_MINHASH_LSH = f"""
WITH {SQL_SHINGLES3},
hxt AS (
  SELECT doc_id, s, list_transform(s, x -> sha256(x) || sha256(x || '#')) AS hx
  FROM sh
),
sig AS (
  SELECT doc_id, s,
    {_MINHASH_COLS}
  FROM hxt
),
buckets AS (
  {_BAND_SELECTS}
),
cand AS (
  SELECT x.doc_id AS a, y.doc_id AS b
  FROM buckets x JOIN buckets y ON x.band = y.band AND x.key = y.key
  WHERE x.doc_id < y.doc_id
  GROUP BY 1, 2
),
sz AS (SELECT doc_id, len(s) AS n FROM sh)
SELECT c.a AS doc_a, c.b AS doc_b,
  round(CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
        / CAST(za.n + zb.n - len(list_intersect(sa.s, sb.s)) AS DOUBLE), 6) AS jaccard
FROM cand c
JOIN sh sa ON sa.doc_id = c.a
JOIN sh sb ON sb.doc_id = c.b
JOIN sz za ON za.doc_id = c.a
JOIN sz zb ON zb.doc_id = c.b
WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
      / CAST(za.n + zb.n - len(list_intersect(sa.s, sb.s)) AS DOUBLE) >= 0.12
"""


SQL_DEDUP_CLUSTERS = f"""
WITH RECURSIVE {SQL_SHINGLES3},
hxt AS (
  SELECT doc_id, s, list_transform(s, x -> sha256(x) || sha256(x || '#')) AS hx
  FROM sh
),
sig AS (
  SELECT doc_id, s,
    {_MINHASH_COLS}
  FROM hxt
),
buckets AS (
  {_BAND_SELECTS}
),
cand AS (
  SELECT x.doc_id AS a, y.doc_id AS b
  FROM buckets x JOIN buckets y ON x.band = y.band AND x.key = y.key
  WHERE x.doc_id < y.doc_id
  GROUP BY 1, 2
),
sz AS (SELECT doc_id, len(s) AS n FROM sh),
pairs AS (
  SELECT c.a, c.b
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.a
  JOIN sh sb ON sb.doc_id = c.b
  JOIN sz za ON za.doc_id = c.a
  JOIN sz zb ON zb.doc_id = c.b
  WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
        / CAST(za.n + zb.n - len(list_intersect(sa.s, sb.s)) AS DOUBLE) >= 0.12
),
e AS (SELECT a AS x, b AS y FROM pairs UNION SELECT b, a FROM pairs),
reach (node, r) AS (
  SELECT x, x FROM e
  UNION
  SELECT e.x, reach.r FROM e JOIN reach ON e.y = reach.node
)
SELECT CAST(node AS BIGINT) AS doc_id, CAST(min(r) AS BIGINT) AS canonical_id
FROM reach GROUP BY node
"""


SQL_DECONTAMINATE = f"""
WITH norm AS (SELECT doc_id, {SQL_NORM} AS t FROM documents),
toks AS (SELECT doc_id, string_split(t, ' ') AS w FROM norm),
sh8 AS (
  SELECT doc_id,
    list_distinct(list_transform(
      range(0, greatest(len(w) - 8, 0) + 1),
      i -> array_to_string(list_slice(w, i + 1, i + 8), ' ')
    )) AS s
  FROM toks
),
tr AS (SELECT doc_id, unnest(s) AS g FROM sh8 WHERE doc_id % 20 <> 0),
ev AS (SELECT DISTINCT unnest(s) AS g FROM sh8 WHERE doc_id % 20 = 0)
SELECT tr.doc_id, CAST(count(*) AS BIGINT) AS n_hits
FROM tr JOIN ev USING (g)
GROUP BY 1
"""


def q_dedup_clusters(spark, sf_dir):
    """Duplicate CLUSTERS from the minhash pair edges: connected components
    via iterative min-label propagation (docdedup.dedup_clusters) — the
    keep-one-per-cluster step a training pipeline runs after any pair
    operator. Oracle: DuckDB recursive CTE computing the transitive closure
    over the identical pair set."""
    from pyelt_spark.operators.docdedup import dedup_clusters, minhash_lsh_pairs

    pairs = minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), num_perm=12, bands=4, n=3, threshold=0.12
    )
    return dedup_clusters(pairs).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("canonical_id").cast("long").alias("canonical_id"),
    )


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination (n-gram-overlap test): training docs =
    doc_id % 20 != 0, eval set = doc_id % 20 == 0; flag train docs sharing
    any word 8-gram with the eval set."""
    from pyelt_spark.operators.docdedup import decontaminate

    d = _t(spark, sf_dir, "documents")
    return decontaminate(
        d.filter(F.col("doc_id") % 20 != 0),
        d.filter(F.col("doc_id") % 20 == 0),
        n=8,
    ).orderBy("doc_id")


def q_dedup_simhash(spark, sf_dir):
    """64-bit SimHash per document — all-JVM relational dataflow (explode →
    sha2 → 64 bit-sum aggregates), value-checked against a DuckDB twin that
    computes the identical signature. The Arrow pandas_udf variant
    (docdedup.simhash64) stays as the DbFunction-coverage path; bit-identity
    between the two is pytest-covered."""
    from pyelt_spark.operators.docdedup import simhash_hex

    return simhash_hex(_t(spark, sf_dir, "documents"))


def q_corpus_clean_pipeline(spark, sf_dir):
    """A composed training-data cleaning pipeline as one declarative plan:
    quality gate → language filter → exact-dedup (keep canonical doc) →
    token statistics. Catalyst fuses the whole chain; the dedup is the only
    shuffle."""
    from pyspark.sql import Window

    from pyelt_spark.functions.text import fingerprint, langid, quality_score, token_count

    d = _t(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "text",
        quality_score("text").alias("quality"),
        langid("text").alias("lang_guess"),
        fingerprint("text").alias("fp"),
        token_count("text").alias("n_tokens"),
    ).filter((F.col("quality") >= 0.4) & (F.col("lang_guess") == "en"))
    w = Window.partitionBy("fp").orderBy("doc_id")
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc_id", "n_tokens", "quality")
    )


SQL_CORPUS_CLEAN = f"""
WITH t AS (
  SELECT doc_id, text,
    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) AS n_tok,
    CAST(len(text) - len(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) AS n_punct,
    CAST(len(list_filter(string_split({SQL_NORM}, ' '), x -> list_contains({_EN}, x))) AS DOUBLE) AS en,
    CAST(len(list_filter(string_split({SQL_NORM}, ' '), x -> list_contains({_DE}, x))) AS DOUBLE) AS de,
    CAST(len(list_filter(string_split({SQL_NORM}, ' '), x -> list_contains({_FR}, x))) AS DOUBLE) AS fr,
    CAST(len(list_filter(string_split({SQL_NORM}, ' '), x -> list_contains({_ES}, x))) AS DOUBLE) AS es,
    sha256({SQL_NORM}) AS fp
  FROM documents
),
scored AS (
  SELECT doc_id, fp,
    CAST(n_tok AS BIGINT) AS n_tokens,
    round((
      least(n_tok / 100.0, 1.0)
      + (1.0 - least(n_punct / greatest(CAST(len(text) AS DOUBLE), 1.0) * 5, 1.0))
      + least(en / greatest(n_tok, 1.0) * 4, 1.0)
    ) / 3, 6) AS quality,
    CASE
      WHEN en > 0 AND en = greatest(en, de, fr, es) THEN 'en'
      WHEN de > 0 AND de = greatest(en, de, fr, es) THEN 'de'
      WHEN fr > 0 AND fr = greatest(en, de, fr, es) THEN 'fr'
      WHEN es > 0 AND es = greatest(en, de, fr, es) THEN 'es'
      ELSE 'und' END AS lang_guess
  FROM t
),
gated AS (SELECT * FROM scored WHERE quality >= 0.4 AND lang_guess = 'en')
SELECT doc_id, n_tokens, quality FROM (
  SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM gated
) WHERE rn = 1
"""


def q_doc_bpe_token_count(spark, sf_dir):
    """BPE-ish regex tokenization count (letters / digits / punctuation
    runs split apart — the pre-tokenizer shape of GPT-style BPE)."""
    d = _t(spark, sf_dir, "documents")
    pat = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
    return d.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(pat)).alias("n_bpe_tokens"),
    )


SQL_DOC_BPE_TOKENS = r"""
SELECT doc_id,
  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe_tokens
FROM documents
"""


def q_doc_winnow_fingerprints(spark, sf_dir):
    """Winnowing (rolling-hash window-minima) fingerprint sets — the
    position-robust dedup fingerprint (MOSS scheme)."""
    from pyelt_spark.functions.text import winnow_fingerprints

    return winnow_fingerprints(_t(spark, sf_dir, "documents"), k=8, w=4)


SQL_DOC_WINNOW = f"""
WITH n AS (SELECT doc_id, {SQL_NORM} AS t FROM documents),
p AS (
  SELECT doc_id, t, unnest(range(1, greatest(len(t) - 8 + 1, 1) + 1)) AS pos
  FROM n
),
h AS (SELECT doc_id, pos, substr(sha256(substr(t, CAST(pos AS INTEGER), 8)), 1, 16) AS hh FROM p),
w AS (
  SELECT doc_id, min(hh) OVER (
    PARTITION BY doc_id ORDER BY pos ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING
  ) AS fp FROM h
)
SELECT DISTINCT doc_id, fp FROM w
"""


def q_doc_unigram_xent(spark, sf_dir):
    """Corpus-statistics quality filter: per-document cross-entropy against
    the corpus unigram distribution (cheap perplexity proxy — two
    relational passes; see functions/text.unigram_cross_entropy)."""
    from pyelt_spark.functions.text import unigram_cross_entropy

    return unigram_cross_entropy(_t(spark, sf_dir, "documents"))


SQL_DOC_UNIGRAM_XENT = f"""
WITH tok AS (
  SELECT doc_id, unnest(list_filter(string_split({SQL_NORM}, ' '), x -> x <> '')) AS w
  FROM documents
),
freq AS (SELECT w, count(*) AS cw FROM tok GROUP BY w),
tot AS (SELECT sum(cw) AS n_total FROM freq),
per AS (SELECT doc_id, w, count(*) AS k FROM tok GROUP BY 1, 2),
wt AS (
  SELECT per.doc_id, per.k,
    CAST(round(-ln(CAST(cw AS DOUBLE) / CAST(n_total AS DOUBLE)), 9) AS DECIMAL(18,9))
      * CAST(per.k AS DECIMAL(9,0)) AS t
  FROM per JOIN freq USING (w) CROSS JOIN tot
)
SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_tokens,
  round(CAST(sum(t) AS DOUBLE) / CAST(sum(k) AS DOUBLE), 6) AS xent
FROM wt GROUP BY doc_id
"""


QUERIES = {
    "doc_token_count": q_doc_token_count,
    "doc_quality_score": q_doc_quality,
    "doc_langid": q_doc_langid,
    "doc_fingerprint": q_doc_fingerprint,
    "doc_bpe_token_count": q_doc_bpe_token_count,
    "doc_winnow_fingerprints": q_doc_winnow_fingerprints,
    "doc_unigram_xent": q_doc_unigram_xent,
    "dedup_exact": q_dedup_exact,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_simhash": q_dedup_simhash,
    "dedup_clusters": q_dedup_clusters,
    "decontaminate": q_decontaminate,
    "corpus_clean_pipeline": q_corpus_clean_pipeline,
}

ORACLES = {
    "doc_token_count": SQL_DOC_TOKEN_COUNT,
    "doc_quality_score": SQL_DOC_QUALITY,
    "doc_langid": SQL_DOC_LANGID,
    "doc_fingerprint": SQL_DOC_FINGERPRINT,
    "doc_bpe_token_count": SQL_DOC_BPE_TOKENS,
    "doc_winnow_fingerprints": SQL_DOC_WINNOW,
    "doc_unigram_xent": SQL_DOC_UNIGRAM_XENT,
    "dedup_exact": SQL_DEDUP_EXACT,
    "dedup_ngram_jaccard": SQL_DEDUP_NGRAM_JACCARD,
    "dedup_minhash_lsh": SQL_DEDUP_MINHASH_LSH,
    "dedup_simhash": simhash_oracle_sql(),
    "dedup_clusters": SQL_DEDUP_CLUSTERS,
    "decontaminate": SQL_DECONTAMINATE,
    "corpus_clean_pipeline": SQL_CORPUS_CLEAN,
}
