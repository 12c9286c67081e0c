"""Text-analysis operators for a training-data pipeline over `documents`.

All JVM-side Catalyst expressions (no Python in the hot path):
language-ID (stopword heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), and rolling-hash document fingerprinting.
These extend the reference's capability surface to the large-scale
training-data use case the graft targets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tiny per-language stopword lists for the n-gram/stopword heuristic.
#: Deliberately deterministic and dependency-free.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "los"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "dans", "pour"],
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "ein"],
    "pt": ["o", "a", "de", "que", "e", "do", "da", "em", "um", "para"],
}

#: BPE-ish tokenizer: words, numbers, or single non-space symbols.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization → array<string> (empty strings dropped)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda t: F.length(t) > 0)


def token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def bpe_token_count(col: Column | str) -> Column:
    """BPE-ish token count: count of word/number/symbol matches."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_REGEX), F.lit(0)))


def stopword_hits(col: Column | str, lang: str) -> Column:
    """Number of tokens that are stopwords of `lang`."""
    sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    toks = F.transform(tokens(col), lambda t: F.lower(t))
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))


def language_id(col: Column | str) -> Column:
    """Heuristic language ID: argmax over per-language stopword hit
    counts; 'und' when no stopword matches at all.

    Pure Catalyst: one pass building a (hits, lang) struct array, then
    array_max — scales linearly, no shuffle, no Python.
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = F.transform(tokens(c), lambda t: F.lower(t))
    scored = []
    for lang in sorted(LANG_STOPWORDS):
        sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        # tie-break deterministically by language code (desc struct sort
        # compares fields in order: hits, then lang)
        scored.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scored))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_score(col: Column | str) -> Column:
    """Composite quality score in [0,1] from cheap surface statistics:
    mean word length sanity, alpha ratio, and repetition ratio.
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    n_tok = F.size(toks)
    n_chars = F.length(c)
    alpha_chars = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    alpha_ratio = F.when(n_chars > 0, alpha_chars / n_chars).otherwise(F.lit(0.0))
    distinct_ratio = F.when(
        n_tok > 0, F.size(F.array_distinct(toks)) / n_tok
    ).otherwise(F.lit(0.0))
    mean_wl = F.when(n_tok > 0, n_chars / n_tok).otherwise(F.lit(0.0))
    wl_ok = F.when((mean_wl >= 3) & (mean_wl <= 12), F.lit(1.0)).otherwise(F.lit(0.5))
    return (alpha_ratio + distinct_ratio + wl_ok) / F.lit(3.0)


def fingerprint64(col: Column | str) -> Column:
    """64-bit document fingerprint (xxhash64 of NFC-ish normalized text).

    The rolling-hash fingerprint of the reference world becomes Spark's
    built-in xxhash64 over a canonicalized string — one JVM expression.
    """
    c = F.col(col) if isinstance(col, str) else col
    canon = F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))
    return F.xxhash64(canon)


def fingerprint_md5(col: Column | str) -> Column:
    """Oracle-friendly fingerprint twin of :func:`fingerprint64`: md5 of
    the same canonicalized text (md5 exists in Spark AND DuckDB, so this
    variant is value-checkable end to end; xxhash64 is the faster
    engine-internal one)."""
    c = F.col(col) if isinstance(col, str) else col
    canon = F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))
    return F.md5(canon)


def with_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """documents → documents + (token_count, bpe_tokens, lang_pred,
    quality, fingerprint).

    Tokenization is materialized ONCE into a temp column and every
    feature reads it — Catalyst's common-subexpression elimination does
    not fuse identical lambda-bearing expressions across independent
    projection items, so without this the regex split would run 4x.
    """
    toks = F.col("__toks")
    n_tok = F.size(toks)
    n_chars = F.length(text_col)
    alpha_chars = F.length(F.regexp_replace(text_col, r"[^A-Za-z]", ""))
    alpha_ratio = F.when(n_chars > 0, alpha_chars / n_chars).otherwise(F.lit(0.0))
    distinct_ratio = F.when(
        n_tok > 0, F.size(F.array_distinct(toks)) / n_tok
    ).otherwise(F.lit(0.0))
    mean_wl = F.when(n_tok > 0, n_chars / n_tok).otherwise(F.lit(0.0))
    wl_ok = F.when((mean_wl >= 3) & (mean_wl <= 12), F.lit(1.0)).otherwise(F.lit(0.5))

    lt = F.transform(toks, lambda t: F.lower(t))
    scored = []
    for lang in sorted(LANG_STOPWORDS):
        sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
        hits = F.size(F.filter(lt, lambda t: F.array_contains(sw, t)))
        scored.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scored))

    return (
        df.withColumn("__toks", tokens(text_col))
        .select(
            *df.columns,
            n_tok.alias("n_tokens"),
            bpe_token_count(text_col).alias("n_bpe_tokens"),
            F.when(best["hits"] > 0, best["lang"])
            .otherwise(F.lit("und"))
            .alias("lang_pred"),
            ((alpha_ratio + distinct_ratio + wl_ok) / F.lit(3.0)).alias("quality"),
            fingerprint64(text_col).alias("fingerprint"),
        )
    )
