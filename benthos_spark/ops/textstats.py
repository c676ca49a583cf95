"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting. Pure Catalyst expressions with exact SQL oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .textprep import norm_text, tokens

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is"],
    "de": ["der", "die", "und", "das", "nicht", "ist"],
    "fr": ["le", "la", "et", "les", "des", "est"],
    "es": ["el", "los", "de", "la", "que", "es"],
}


def token_count(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return docs.select(
        F.col(id_col), F.size(tokens(F.col(text_col))).alias("n_tokens")
    )


BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count_bpe(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """BPE-ish pre-tokenizer count: alphabetic runs, digit runs, and single
    punctuation marks each count as one token (the GPT-2-style pre-split
    shape, minus byte-level merges — those need a learned vocab). Pure
    Catalyst, same regex reproduced by the DuckDB oracle."""
    return docs.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_RE), F.lit(0))).alias(
            "n_bpe_tokens"
        ),
    )


def _count_hits(toks, words):
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-vote language guess; deterministic tie-break by language
    code order, 'und' (undetermined) when no stopword hits at all."""
    toks = tokens(F.col(text_col))
    hit_cols = [
        _count_hits(toks, ws).alias(f"hits_{lang}") for lang, ws in sorted(STOPWORDS.items())
    ]
    scored = docs.select(F.col(id_col), *hit_cols)
    langs = sorted(STOPWORDS)
    best = F.greatest(*[F.col(f"hits_{l}") for l in langs])
    guess = F.when(best == 0, F.lit("und"))
    for l in langs:
        guess = guess.when(F.col(f"hits_{l}") == best, F.lit(l))
    return scored.select(F.col(id_col), guess.alias("lang_guess"), best.alias("n_hits"))


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality in [0,1]: length saturation + alpha ratio +
    stopword ratio (Gopher/C4-style signals, re-derived)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    alpha = F.length(F.regexp_replace(t, "[^a-zA-Z]", ""))
    toks = tokens(t)
    n_toks = F.size(toks)
    en_hits = _count_hits(toks, STOPWORDS["en"])
    len_score = F.least(n_chars.cast("double") / 500.0, F.lit(1.0))
    alpha_ratio = F.when(n_chars > 0, alpha.cast("double") / n_chars).otherwise(0.0)
    stop_ratio = F.when(n_toks > 0, en_hits.cast("double") / n_toks).otherwise(0.0)
    score = F.round(0.4 * len_score + 0.3 * alpha_ratio + 0.3 * F.least(stop_ratio * 5, F.lit(1.0)), 4)
    return docs.select(
        F.col(id_col),
        F.col(text_col).isNotNull().alias("has_text"),
        n_chars.alias("n_chars"),
        F.round(alpha_ratio, 4).alias("alpha_ratio"),
        score.alias("quality"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Content fingerprint: md5 of whitespace-normalized lowercase text.
    Dedupe-stable across formatting differences."""
    return docs.select(
        F.col(id_col),
        F.substring(F.md5(norm_text(F.col(text_col))), 1, 16).alias("fp"),
    )


def repetition_score(docs: DataFrame, n: int = 2, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Within-document repetition (Gopher-style quality signal): 1 - distinct
    n-grams / total n-grams. High values mean the document repeats itself.
    Pure Catalyst over the materialized token array; zero-gram docs score 0."""
    from .textprep import shingles_of, tokens

    toks = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
    total = F.greatest(F.size("__toks") - (n - 1), F.lit(0))
    distinct = F.size(shingles_of(F.col("__toks"), n))
    return toks.select(
        F.col(id_col),
        total.alias("n_ngrams"),
        F.when(total > 0, F.round(1.0 - distinct / total, 4)).otherwise(0.0).alias(
            "repetition"
        ),
    )


def textstats_wide(
    docs: DataFrame, n: int = 2, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """All six per-document text signals in ONE codegen projection:
    token_count, token_count_bpe, lang_id, quality_score, fingerprint and
    repetition_score, column-for-column identical to running each op
    separately (equality is test-enforced per column). The 100 TB point:
    every signal is a pure projection, so one pass over the corpus computes
    them all — six separate queries rescan the table six times, and a
    join-based composition would add five doc_id shuffles for what a single
    ``select`` expresses. Shared subexpressions (the token array feeds four
    of the six) are computed once per row by codegen's subexpression
    elimination."""
    from .textprep import shingles_of

    t = F.col(text_col)
    # stage 1 materializes the token array: HOF lambdas re-evaluate inlined
    # expressions per element (see shingles_of), a bound column only once
    base = docs.select(
        F.col(id_col),
        t.isNotNull().alias("has_text"),
        F.length(t).alias("n_chars"),
        F.length(F.regexp_replace(t, "[^a-zA-Z]", "")).alias("__alpha"),
        F.size(F.regexp_extract_all(t, F.lit(BPE_RE), F.lit(0))).alias("n_bpe_tokens"),
        F.substring(F.md5(norm_text(t)), 1, 16).alias("fp"),
        tokens(t).alias("__toks"),
    )
    toks = F.col("__toks")
    langs = sorted(STOPWORDS)
    hits = {lang: _count_hits(toks, STOPWORDS[lang]) for lang in langs}
    best = F.greatest(*[hits[lang] for lang in langs])
    guess = F.when(best == 0, F.lit("und"))
    for lang in langs:
        guess = guess.when(hits[lang] == best, F.lit(lang))
    n_chars = F.col("n_chars")
    n_toks = F.size(toks)
    en_hits = _count_hits(toks, STOPWORDS["en"])
    len_score = F.least(n_chars.cast("double") / 500.0, F.lit(1.0))
    alpha_ratio = F.when(
        n_chars > 0, F.col("__alpha").cast("double") / n_chars
    ).otherwise(0.0)
    stop_ratio = F.when(n_toks > 0, en_hits.cast("double") / n_toks).otherwise(0.0)
    score = F.round(
        0.4 * len_score + 0.3 * alpha_ratio + 0.3 * F.least(stop_ratio * 5, F.lit(1.0)), 4
    )
    total = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    distinct = F.size(shingles_of(toks, n))
    return base.select(
        F.col(id_col),
        n_toks.alias("n_tokens"),
        F.col("n_bpe_tokens"),
        guess.alias("lang_guess"),
        best.alias("n_hits"),
        F.col("has_text"),
        n_chars,
        F.round(alpha_ratio, 4).alias("alpha_ratio"),
        score.alias("quality"),
        F.col("fp"),
        total.alias("n_ngrams"),
        F.when(total > 0, F.round(1.0 - distinct / total, 4)).otherwise(0.0).alias(
            "repetition"
        ),
    )


def duplicate_line_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Cross-document duplicate-line signal (C4-style boilerplate detector):
    per document, the fraction of its distinct lines (sentence-ish units —
    split on '.') that also occur in some OTHER document. Shape: explode ->
    line-hash count (one hash agg) -> per-doc ratio; line text never
    shuffles, only 64-bit hashes."""
    lines = (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.col(text_col), r"\.")).alias("line"),
        )
        .select("id", F.trim("line").alias("line"))
        .filter(F.length("line") > 10)
        .select("id", F.xxhash64("line").alias("lh"))
        .distinct()
    )
    counts = lines.groupBy("lh").agg(F.count(F.lit(1)).alias("ndocs"))
    per_doc = (
        lines.join(counts, "lh")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.when(F.col("ndocs") > 1, 1).otherwise(0)).alias("n_shared"),
        )
        .withColumn("shared_ratio", F.round(F.col("n_shared") / F.col("n_lines"), 4))
    )
    return per_doc.select(F.col("id").alias(id_col), "n_lines", "n_shared", "shared_ratio")
