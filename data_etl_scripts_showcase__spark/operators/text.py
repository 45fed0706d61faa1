"""Text-analysis operators: tokenization, quality scoring, language ID,
fingerprinting (BASELINE.json north star — training-data pipeline ops).

All pure column expressions (codegen, no UDFs): at 100 TB these run inside
the scan stage with zero shuffles.  Hashes are md5-derived so any ANSI-SQL
engine can reproduce them (the DuckDB oracle does).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A small deterministic English stopword list (public knowledge).
STOPWORDS = ["the", "a", "an", "of", "and", "or", "to", "in", "is", "it"]

# BPE-ish pre-tokenizer: letter runs, digit runs, single non-alnum marks.
BPE_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Marker words per language for the n-gram/marker language-ID heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "und", "die", "nicht", "das"],
    "en": ["the", "and", "of", "is", "to"],
    "es": ["el", "la", "que", "los", "y"],
    "fr": ["le", "la", "et", "les", "des"],
    "zh": ["de", "shi", "le", "bu", "wo"],
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalize(col: Column | str) -> Column:
    """Canonical text form: lowercase, collapsed whitespace, trimmed."""
    return F.trim(F.regexp_replace(F.lower(_c(col)), r"\s+", " "))


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of the normalized text."""
    return F.split(normalize(col), " ")


def token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def bpe_token_count(col: Column | str) -> Column:
    """BPE-ish sub-word token count via the pre-tokenizer regex."""
    return F.size(F.regexp_extract_all(_c(col), F.lit(BPE_REGEX), 0))


def punct_ratio(col: Column | str) -> Column:
    """Punctuation chars / total chars (0 for empty text)."""
    c = _c(col)
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return F.when(F.length(c) == 0, F.lit(0.0)).otherwise(
        n_punct.cast("double") / F.length(c)
    )


def stopword_ratio(col: Column | str) -> Column:
    """Stopword tokens / total tokens (0 for empty)."""
    toks = tokens(col)
    n_stop = F.size(F.filter(toks, lambda x: x.isin(STOPWORDS)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        n_stop.cast("double") / F.size(toks)
    )


def mean_token_len(col: Column | str) -> Column:
    """Mean token length in chars (0 for empty)."""
    toks = tokens(col)
    total = F.aggregate(
        F.transform(toks, lambda x: F.length(x).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        total.cast("double") / F.size(toks)
    )


def quality_score(col: Column | str) -> Column:
    """Deterministic [0,1] quality heuristic from length/stopword/punct signals.

    score = 0.4·min(tokens/100,1) + 0.3·(1−punct_ratio) + 0.3·min(stop_ratio·5,1)
    (real-content text has some stopwords, few punct runs, nontrivial length).
    """
    len_part = F.least(token_count(col).cast("double") / 100.0, F.lit(1.0))
    punct_part = F.lit(1.0) - punct_ratio(col)
    stop_part = F.least(stopword_ratio(col) * 5.0, F.lit(1.0))
    return len_part * 0.4 + punct_part * 0.3 + stop_part * 0.3


def marker_hits(col: Column | str, markers: list[str]) -> Column:
    """How many tokens are in the marker list."""
    return F.size(F.filter(tokens(col), lambda x: x.isin(markers)))


def language_id(col: Column | str) -> Column:
    """Marker-word language ID: argmax of per-language marker hits.

    Ties break alphabetically (deterministic); zero hits → 'und'
    (ISO 639-2 undetermined).
    """
    entries = F.array(
        *[
            F.struct(
                marker_hits(col, LANG_MARKERS[lang]).alias("hits"),
                F.lit(lang).alias("lang"),
            )
            for lang in sorted(LANG_MARKERS)
        ]
    )
    # array_max on struct: lexicographic (hits, lang) — but we want ties to
    # pick the alphabetically FIRST lang, so compare on (hits, reversed rank).
    best = F.aggregate(
        entries,
        F.struct(F.lit(-1).alias("hits"), F.lit("zz").alias("lang")),
        lambda acc, x: F.when(x.hits > acc.hits, x).otherwise(acc),
    )
    return F.when(best.hits <= 0, "und").otherwise(best.lang)


def fingerprint_md5(col: Column | str) -> Column:
    """Full document fingerprint: md5 of the normalized text."""
    return F.md5(normalize(col))


def fingerprint_int(col: Column | str) -> Column:
    """64-bit-ish integer fingerprint: first 8 md5 hex chars as a bigint
    (rolling-hash analog, reproducible in any SQL engine)."""
    return F.conv(F.substring(fingerprint_md5(col), 1, 8), 16, 10).cast("bigint")
