"""Text-analysis expression builders (documents table).

All pure Column expressions (whole-stage codegen, no UDFs):
- token counting (whitespace + regex token classes),
- quality scoring (lexical-diversity / length / stopword ratios),
- language ID (marker-word scoring — an n-gram/stopword heuristic),
- document fingerprinting (md5 content hash + shingle fingerprints
  live in operators/dedup.py).

Ratios are computed as single double divisions of exact integer counts,
so results are bitwise-stable across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Marker stopwords per language — deliberately tiny; a production list
# would be per-language frequency tables. The *operator shape* (count
# marker hits per language, argmax with fixed precedence) is the point.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and"],
    "es": ["el", "la", "de", "y"],
    "fr": ["le", "la", "de", "et"],
    "de": ["der", "die", "das", "und"],
    "zh": ["de", "le", "shi", "he"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in"]


def tokens(text: Column) -> Column:
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def unique_token_count(text: Column) -> Column:
    return F.size(F.array_distinct(tokens(text))).cast("long")


def marker_hits(text: Column, markers: list[str]) -> Column:
    """How many tokens are in the marker list (duplicates counted)."""
    return F.size(
        F.filter(tokens(text), lambda t: t.isin(*markers))
    ).cast("long")


def avg_token_len(text: Column) -> Column:
    """(chars excluding separators) / tokens — one double division."""
    n_tok = token_count(text)
    n_sep = n_tok - F.lit(1)
    return (F.length(text).cast("long") - n_sep).cast("double") / n_tok.cast("double")


def lexical_diversity(text: Column) -> Column:
    return unique_token_count(text).cast("double") / token_count(text).cast("double")


def stopword_ratio(text: Column) -> Column:
    return marker_hits(text, STOPWORDS).cast("double") / token_count(text).cast(
        "double"
    )


def alpha_token_frac(text: Column) -> Column:
    """Fraction of tokens containing at least one ASCII letter."""
    hits = F.size(F.filter(tokens(text), lambda t: t.rlike("[A-Za-z]")))
    return hits.cast("double") / token_count(text).cast("double")


def symbol_to_word_ratio(text: Column) -> Column:
    """(# of '#' marks + '...' runs) per token — the Gopher symbol rule.

    Both counted with the same RE2-safe patterns on both engines.
    """
    n_sym = F.regexp_count(text, F.lit("#")) + F.regexp_count(
        text, F.lit(r"\.\.\.")
    )
    return n_sym.cast("double") / token_count(text).cast("double")


def distinct_stopword_hits(text: Column) -> Column:
    """How many DISTINCT stopwords from STOPWORDS appear in the text."""
    return F.size(
        F.array_intersect(
            F.array_distinct(tokens(text)),
            F.array(*[F.lit(s) for s in STOPWORDS]),
        )
    ).cast("long")


def lang_scores(text: Column) -> dict[str, Column]:
    return {lang: marker_hits(text, m) for lang, m in LANG_MARKERS.items()}


def lang_id(text: Column) -> Column:
    """Argmax language by marker hits; ties resolve by fixed precedence
    (dict order) so the result is deterministic."""
    scores = lang_scores(text)
    langs = list(scores)
    best = scores[langs[0]]
    for lang in langs[1:]:
        best = F.greatest(best, scores[lang])
    out = F.lit(None).cast("string")
    # First language (in precedence order) achieving the max wins.
    for lang in reversed(langs):
        out = F.when(scores[lang] == best, F.lit(lang)).otherwise(out)
    return out


def content_fingerprint(text: Column) -> Column:
    return F.md5(text)


# PII patterns: RE2-safe subset (no lookarounds/backrefs) so the same
# pattern strings run identically under Spark's Java regex and DuckDB's
# RE2 — the cross-engine contract the redaction oracle depends on.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "phone": (r"\+1-555-[0-9]{4}", "[PHONE]"),
    "ssn": (r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "[SSN]"),
}


def redact_pii(text: Column) -> Column:
    """Replace every email/phone/SSN match with its placeholder.

    Email runs first (its local part may contain digits-and-dashes
    runs the narrower patterns would nibble at); the remaining
    patterns are mutually non-overlapping.
    """
    out = text
    for pattern, placeholder in PII_PATTERNS.values():
        out = F.regexp_replace(out, pattern, placeholder)
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind match counts (BIGINT) over the *original* text."""
    return {
        kind: F.regexp_count(text, F.lit(pattern)).cast("long")
        for kind, (pattern, _) in PII_PATTERNS.items()
    }
