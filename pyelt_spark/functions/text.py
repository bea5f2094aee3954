"""Text-analysis column functions for large-scale corpus pipelines.

All pure JVM column expressions (whole-stage codegen; no Python per row):
token counting, quality scoring, language-ID heuristic, document
fingerprinting. Used by the ``documents``-table queries and by the dedup
operators in ``operators/docdedup.py``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword-hit language
# heuristic — deliberately small and deterministic
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "mit", "von", "nicht"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "de", "que", "pour"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "de", "que", "por"],
}


def tokens(col: str | Column) -> Column:
    """Whitespace tokenization of trimmed text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count(col: str | Column) -> Column:
    return F.size(tokens(col))


def normalized(col: str | Column) -> Column:
    """Canonical text form: lowercase, whitespace runs collapsed, trimmed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def fingerprint(col: str | Column) -> Column:
    """SHA-256 document fingerprint over the normalized text."""
    return F.sha2(normalized(col), 256)


def punct_count(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    # Java regex: \p{Punct} is the ASCII punct set (POSIX [[:punct:]] is NOT
    # supported by java.util.regex); the DuckDB oracle's RE2 [[:punct:]]
    # matches the identical ASCII set
    return F.length(c) - F.length(F.regexp_replace(c, r"\p{Punct}", ""))


def stopword_hits(col: str | Column, lang: str = "en") -> Column:
    words = STOPWORDS[lang]
    toks = F.split(normalized(col), " ")
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def quality_score(col: str | Column) -> Column:
    """Heuristic quality score in [0,1]: rewards reasonable length,
    moderate punctuation, and a natural stopword ratio."""
    c = F.col(col) if isinstance(col, str) else col
    n_tok = token_count(c).cast("double")
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    punct_ratio = punct_count(c).cast("double") / F.greatest(
        F.length(c).cast("double"), F.lit(1.0)
    )
    punct_score = F.lit(1.0) - F.least(punct_ratio * 5, F.lit(1.0))
    stop_ratio = stopword_hits(c).cast("double") / F.greatest(n_tok, F.lit(1.0))
    stop_score = F.least(stop_ratio * 4, F.lit(1.0))
    return F.round((len_score + punct_score + stop_score) / 3, 6)


def langid(col: str | Column) -> Column:
    """Stopword-hit language guess over {en,de,fr,es}, 'und' if no hits.

    Ties break in fixed en > de > fr > es order (deterministic).
    """
    hits = {lang: stopword_hits(col, lang) for lang in STOPWORDS}
    best = F.greatest(*hits.values())
    expr = F.lit("und")
    for lang in reversed(list(STOPWORDS)):  # en wins ties (checked last)
        expr = F.when((hits[lang] > 0) & (hits[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def shingles(col: str | Column, n: int = 5) -> Column:
    """Word n-gram shingles over normalized text (distinct)."""
    toks = F.split(normalized(col), " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    )


def winnow_fingerprints(
    df, id_col: str = "doc_id", text_col: str = "text", k: int = 8, w: int = 4
):
    """Winnowing document fingerprints (the MOSS rolling-hash scheme):
    hash every char k-gram of the normalized text, slide a w-window and
    keep each window's minimum — a position-robust fingerprint SET that
    survives local edits. Returns distinct (id, fp) rows.

    Relational dataflow (and the CollapseProject trap): the obvious shape
    — explode positions, then ``substring(normalized(text), pos, k)`` —
    gets the full regex normalization inlined through the Generate and
    re-run ONCE PER CHARACTER POSITION (~17 s of bench wall at sf0.1; the
    same trap docdedup._shingle_rows_raw documents). Instead the
    normalization runs once per doc inside the generator itself
    (posexplode of the char array), each k-gram is rebuilt from window
    ``lead`` chars — one exchange + one sort serve both the gram window
    and the fingerprint min window — and the sha runs post-filter on
    k-char strings, never on the whole document."""
    from pyspark.sql import Window

    norm = normalized(text_col)
    chars = F.split(norm, "")
    # Spark's split("", "") returns [''] (one empty element), which already
    # fingerprints an empty doc as sha("") — the size==0 branch is purely
    # defensive against an engine version changing that to [] (verified
    # empirically on 4.1; output matches the DuckDB oracle either way)
    gen = F.when(F.size(chars) == 0, F.array(F.lit(""))).otherwise(chars)
    base = df.select(F.col(id_col), F.posexplode(gen).alias("_pos", "_c"))
    win = Window.partitionBy(id_col).orderBy("_pos")
    gram = F.concat_ws("", F.col("_c"), *[F.lead("_c", i).over(win) for i in range(1, k)])
    # completeness from the window's own output (minhash idiom): a full
    # gram has its (k-1)th lead; _pos = 0 keeps the one short gram of a
    # document shorter than k chars (concat_ws skips the null leads)
    grams = base.select(
        F.col(id_col),
        "_pos",
        gram.alias("_g"),
        F.lead("_c", k - 1).over(win).alias("_full"),
    ).filter((F.col("_pos") == 0) | F.col("_full").isNotNull())
    h = grams.select(
        id_col,
        "_pos",
        F.substring(F.sha2(F.col("_g").cast("binary"), 256), 1, 16).alias("_h"),
    )
    fpwin = Window.partitionBy(id_col).orderBy("_pos").rowsBetween(0, w - 1)
    return (
        h.withColumn("fp", F.min("_h").over(fpwin))
        .select(id_col, "fp")
        .distinct()
    )


def unigram_cross_entropy(df, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document cross-entropy against the CORPUS unigram distribution —
    the classic cheap perplexity proxy for corpus quality filtering (high =
    tokens rare in this corpus = boilerplate/noise/outlier; low = typical
    text). Two relational passes, no model: token frequencies are one
    map-side-combinable aggregate over the exploded token stream, then each
    document's mean -ln(p(w)) folds per (doc, token) with counts.

    Cross-engine determinism: each token's -ln(c_w/N) term is rounded to 9
    decimals and summed in DECIMAL (exact, order-independent) so the DuckDB
    oracle reproduces the value bit-for-bit; only the final mean is a
    double. Returns (id, n_tokens, xent).
    """
    from pyspark.sql import functions as F

    tok = (
        df.select(F.col(id_col).alias("_id"),
                  F.explode(F.split(normalized(text_col), " ")).alias("_w"))
        .filter(F.col("_w") != "")
    )
    freq = tok.groupBy("_w").agg(F.count("*").alias("_cw"))
    total = freq.agg(F.sum("_cw").alias("_n_total"))
    # decimal(18,9) × decimal(9,0) → decimal(28,9): exact, and inside BOTH
    # engines' 38-digit cap (wider operands overflow DuckDB's multiply)
    term = F.round(
        -F.log(F.col("_cw").cast("double") / F.col("_n_total").cast("double")), 9
    ).cast("decimal(18,9)")
    weighted = (
        tok.groupBy("_id", "_w").agg(F.count("*").alias("_k"))
        .join(freq, "_w")
        .crossJoin(F.broadcast(total))
        .select("_id", "_k", (term * F.col("_k").cast("decimal(9,0)")).alias("_t"))
    )
    return (
        weighted.groupBy("_id")
        .agg(F.sum("_k").alias("n_tokens"), F.sum("_t").alias("_sum"))
        .select(
            F.col("_id").alias(id_col),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.round(
                F.col("_sum").cast("double") / F.col("n_tokens").cast("double"), 6
            ).alias("xent"),
        )
    )
