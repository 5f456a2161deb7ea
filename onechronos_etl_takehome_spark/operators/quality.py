"""Heuristic document-quality gates for corpus preparation.

Two filter families every large-scale LLM-data pipeline ships (Rae et
al. 2021, "Scaling Language Models: ... Gopher", §A1.1; reused by
MassiveText / RefinedWeb / Dolma):

- ``gopher_quality``: per-document lexical rules (word-count bounds,
  mean-word-length bounds, symbol-to-word ratio, alphabetic-token
  fraction, minimum distinct stopwords). Pure Column expressions —
  whole-stage codegen, no shuffle: the gate runs in the scan stage and
  at 100 TB is embarrassingly parallel.
- ``repetition_stats``: in-document repetition metrics (fraction of
  characters in the most frequent 2-gram; fraction of characters in
  duplicated 3-grams). One explode + groupBy per n — the shuffle key is
  (doc_id, gram), uniformly distributed, so no skew at scale.

Line-based Gopher rules (bullet-start / ellipsis-end line fractions)
are deliberately omitted: the corpus schema carries single-line text
(no '\\n'), so those rules are vacuously true and would be untestable.

Thresholds are the paper's where the testdata exercises them (word
count, mean word length, symbol ratio, alpha fraction, stopwords,
top-2-gram 0.20); the duplicated-n-gram family uses n=3 / 0.10 because
the synthetic vocabulary is tiny (the paper's n=5..10 never fires).

Character accounting for repetition follows the standard published
implementations: chars(gram) x occurrences, overlaps not collapsed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from . import text as tx

# Gopher rule thresholds (documented above).
MIN_WORDS, MAX_WORDS = 50, 100_000
MIN_MEAN_WORD_LEN, MAX_MEAN_WORD_LEN = 3.0, 10.0
MAX_SYMBOL_RATIO = 0.1
MIN_ALPHA_FRAC = 0.8
MIN_DISTINCT_STOPWORDS = 2
MAX_TOP2GRAM_FRAC = 0.20
MAX_DUP3GRAM_FRAC = 0.10


RULE_NAMES = ["ok_words", "ok_word_len", "ok_symbols", "ok_alpha", "ok_stopwords"]


def gopher_quality(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document Gopher lexical metrics, rule booleans, and verdict."""
    t = F.col(text_col)
    out = df.select(
        F.col(id_col),
        tx.token_count(t).alias("n_words"),
        tx.avg_token_len(t).alias("mean_word_len"),
        tx.symbol_to_word_ratio(t).alias("symbol_ratio"),
        tx.alpha_token_frac(t).alias("alpha_frac"),
        tx.distinct_stopword_hits(t).alias("n_stopwords"),
    )
    rules = {
        "ok_words": F.col("n_words").between(MIN_WORDS, MAX_WORDS),
        "ok_word_len": F.col("mean_word_len").between(
            MIN_MEAN_WORD_LEN, MAX_MEAN_WORD_LEN
        ),
        "ok_symbols": F.col("symbol_ratio") <= MAX_SYMBOL_RATIO,
        "ok_alpha": F.col("alpha_frac") >= MIN_ALPHA_FRAC,
        "ok_stopwords": F.col("n_stopwords") >= MIN_DISTINCT_STOPWORDS,
    }
    out = out.select("*", *[c.alias(n) for n, c in rules.items()])
    verdict = rules["ok_words"]
    for name in list(rules)[1:]:
        verdict = verdict & F.col(name)
    return out.withColumn("passes_gopher", verdict)


def gopher_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, q_score): number of Gopher rules passed, 0..len(RULE_NAMES)."""
    gated = gopher_quality(df, id_col, text_col)
    score = sum((F.col(r).cast("int") for r in RULE_NAMES), F.lit(0))
    return gated.select(F.col(id_col), score.cast("long").alias("q_score"))


def _gram_counts(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, gram, cnt, gram_chars) for every positional word n-gram.

    Docs shorter than n words contribute nothing (there is no complete
    n-gram to repeat). ``explode_outer`` for the same
    InferFiltersFromGenerate reason as dedup._exploded_shingles; the
    sequence is empty for short docs, so outer rows carry a NULL gram
    which the groupBy would keep — hence the explicit length filter.
    """
    w = F.split(F.col(text_col), " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(w) - F.lit(n)),
        lambda i: F.concat_ws(" ", F.slice(w, i + F.lit(1), n)),
    )
    return (
        df.filter(F.size(F.split(F.col(text_col), " ")) >= n)
        .select(F.col(id_col), F.explode_outer(grams).alias("gram"))
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            id_col,
            "cnt",
            F.length("gram").cast("long").alias("gram_chars"),
        )
    )


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Repetition metrics + pass flags per document.

    - top2gram_chars / frac: chars of the single most repeated 2-gram
      (cnt x len, 0 when nothing repeats);
    - dup3gram_chars / frac: chars across ALL duplicated 3-grams.
    """
    c2 = _gram_counts(df, id_col, text_col, 2)
    top2 = (
        c2.filter(F.col("cnt") >= 2)
        .groupBy(id_col)
        .agg(F.max(F.col("cnt") * F.col("gram_chars")).alias("top2gram_chars"))
    )
    c3 = _gram_counts(df, id_col, text_col, 3)
    dup3 = (
        c3.filter(F.col("cnt") >= 2)
        .groupBy(id_col)
        .agg(F.sum(F.col("cnt") * F.col("gram_chars")).alias("dup3gram_chars"))
    )
    base = df.select(
        F.col(id_col), F.length(text_col).cast("long").alias("n_chars_text")
    )
    out = (
        base.join(top2, id_col, "left")
        .join(dup3, id_col, "left")
        .select(
            id_col,
            "n_chars_text",
            F.coalesce("top2gram_chars", F.lit(0)).cast("long").alias(
                "top2gram_chars"
            ),
            F.coalesce("dup3gram_chars", F.lit(0)).cast("long").alias(
                "dup3gram_chars"
            ),
        )
    )
    return out.select(
        "*",
        (F.col("top2gram_chars").cast("double") / F.col("n_chars_text")).alias(
            "top2gram_frac"
        ),
        (F.col("dup3gram_chars").cast("double") / F.col("n_chars_text")).alias(
            "dup3gram_frac"
        ),
    ).select(
        "*",
        (F.col("top2gram_frac") <= MAX_TOP2GRAM_FRAC).alias("ok_top2gram"),
        (F.col("dup3gram_frac") <= MAX_DUP3GRAM_FRAC).alias("ok_dup3gram"),
    )
