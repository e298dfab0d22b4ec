"""Text-analysis column functions for LLM-data-pipeline curation.

The reference's only text-touching code is the byte-suffix
append/strip transform pair (reference transform.go:32-52); everything
here is committed extension inventory (BASELINE.json north star): token
counting, quality signals, language ID, fingerprinting.

Every helper returns a *Column expression* built from JVM built-ins —
no Python UDFs — so they run inside WholeStageCodegen and can be used
identically in batch queries and streaming ``withColumn`` stages.  Each
has an exact DuckDB-SQL mirror (see plans/text_queries.py) so the whole
family is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish pre-tokenizer: letter runs | digit runs | single non-space symbol.
# Kept to character classes valid in both Java regex (Spark) and RE2 (DuckDB).
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
PUNCT_RE = r"[^A-Za-z0-9\s]"
WS_RE = r"\s+"

# Tiny per-language stopword inventories for the n-gram/stopword language
# heuristic.  Deliberately small + deterministic; tie order en>de>fr>es.
LANG_STOPWORDS: dict[str, str] = {
    "en": r"\b(the|and|of|to|in|is|that|it|for|was)\b",
    "de": r"\b(der|die|das|und|ist|von|nicht|mit|ein|zu)\b",
    "fr": r"\b(le|la|les|et|est|une|que|pour|dans|sur)\b",
    "es": r"\b(el|los|las|y|es|una|que|por|con|para)\b",
}


def words(c: Column) -> Column:
    """Whitespace tokenization (array of words)."""
    return F.split(F.trim(c), WS_RE)


def word_count(c: Column) -> Column:
    return F.size(words(c)).cast("long")


def token_count(c: Column) -> Column:
    """BPE-ish token count via the pre-tokenizer regex (JVM-side)."""
    return F.regexp_count(c, F.lit(TOKEN_RE)).cast("long")


def punct_count(c: Column) -> Column:
    return F.regexp_count(c, F.lit(PUNCT_RE)).cast("long")


def punct_ratio(c: Column) -> Column:
    return F.round(punct_count(c) / F.length(c), 6)


def stopword_count(c: Column, lang: str = "en") -> Column:
    return F.regexp_count(F.lower(c), F.lit(LANG_STOPWORDS[lang])).cast("long")


def stopword_ratio(c: Column) -> Column:
    return F.round(stopword_count(c) / word_count(c), 6)


def avg_word_len(c: Column) -> Column:
    # sum of word lengths / word count, on the whitespace tokenization
    return F.round(_word_len_sum(c) / word_count(c), 6)


def _word_len_sum(c: Column) -> Column:
    return F.aggregate(
        F.transform(words(c), lambda w: F.length(w).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def quality_score(c: Column) -> Column:
    """Composite heuristic quality in [0,1]: rewards stopword presence and
    moderate word length, penalizes punctuation soup.

    Semantics: 0.5 + 2*stop_ratio - 3*punct_ratio - |avg_word_len - 5|/20,
    clamped to [0,1].  Computed as ONE division of two exact integers so
    both engines divide the same BIGINTs and round the same double —
    summing separately-rounded doubles lands on .5e-6 boundaries where
    Spark (decimal-string HALF_UP) and DuckDB (binary) disagree.
    """
    wc = word_count(c)
    length = F.length(c).cast("long")
    sc = stopword_count(c)
    pc = punct_count(c)
    aww = _word_len_sum(c)
    num = (
        F.lit(10) * wc * length
        + F.lit(40) * sc * length
        - F.lit(60) * pc * wc
        - length * F.abs(aww - F.lit(5) * wc)
    )
    den = F.lit(20) * wc * length
    clamped = F.least(den, F.greatest(F.lit(0).cast("long"), num))
    # HALF_UP to 6 dp done in exact integer math: floor(1e6*n/d + 1/2) =
    # (2e6*n + d) div (2d).  round() on the double would hit exact .5e-6
    # boundaries (terminating-decimal ratios) where decimal-string HALF_UP
    # (Spark) and binary rounding (DuckDB) disagree.
    micro = (F.lit(2_000_000) * clamped + den) / (F.lit(2) * den)
    return F.floor(micro).cast("long") / F.lit(1_000_000.0)


def lang_scores(c: Column) -> dict[str, Column]:
    """Per-language stopword hit counts (the n-gram language heuristic)."""
    return {lang: stopword_count(c, lang) for lang in LANG_STOPWORDS}


def predicted_lang(c: Column) -> Column:
    """Argmax of lang_scores with deterministic tie order en>de>fr>es."""
    s = lang_scores(c)
    return (
        F.when((s["en"] >= s["de"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["es"]), "en")
        .when((s["de"] >= s["fr"]) & (s["de"] >= s["es"]), "de")
        .when(s["fr"] >= s["es"], "fr")
        .otherwise("es")
    )


def normalized(c: Column) -> Column:
    """Canonical text form for fingerprinting: lowercase, collapsed spaces."""
    return F.regexp_replace(F.lower(F.trim(c)), WS_RE, " ")


def fingerprint(c: Column) -> Column:
    """Content fingerprint: md5 of the normalized text (hex string)."""
    return F.md5(F.encode(normalized(c), "UTF-8"))


# PII-redaction patterns — kept to syntax valid in BOTH Java regex
# (Spark) and RE2 (DuckDB): character classes, bounded repeats, \b; no
# backreferences or lookaround, so the DuckDB differential test can run
# the identical pattern.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"(\+?[0-9]{1,3}[-. ])?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}"
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"


def redact_pii(c: Column) -> Column:
    """Replace emails, phone-shaped numbers and IPv4 literals with typed
    placeholder tags — the curation scrub step before training-data
    emission.  Pure JVM ``regexp_replace`` chain (global replace), runs
    in WholeStageCodegen; order matters (emails first so their digits
    never half-match the phone pattern)."""
    out = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, PHONE_RE, "<PHONE>")
    return F.regexp_replace(out, IPV4_RE, "<IP>")


# Markup/URL patterns — same dual-dialect discipline as the PII set
# (java.util.regex and RE2 subsets: classes + repeats only).
TAG_RE = r"<[^<>]*>"
URL_RE = r"https?://[A-Za-z0-9._~:/?#@!$&*+,;%=-]+"


def strip_markup(c: Column) -> Column:
    """Remove angle-bracket markup and collapse the freed whitespace —
    the first pass over crawled HTML before any text analysis."""
    return F.trim(F.regexp_replace(F.regexp_replace(c, TAG_RE, " "), WS_RE, " "))


def extract_urls(c: Column) -> Column:
    """All http(s) URLs in the text, document order."""
    return F.regexp_extract_all(c, F.lit(URL_RE), 0)
