"""Byte-pair-encoding tokenizer: sample-trained merges, Arrow-parallel
encoding.

The tokenizer a pretraining pipeline actually runs — not the
whitespace/regex *estimates* of t05, but a trained subword vocabulary:

- :func:`train_bpe` — classic BPE merge learning (Sennrich et al. 2016)
  on a **bounded, hash-ordered driver sample** of the corpus.  Same
  honest 100-TB posture as the IVF trainer
  (``similarity.train_ivf_centroids``): tokenizer training is a
  fixed-size statistical estimate, so it samples to the driver once
  instead of running one Spark job per merge (a 32k-merge vocab would
  otherwise be 32k shuffles).  Fully deterministic: the sample is
  ``ORDER BY xxhash64(text, seed)`` and merge ties break
  lexicographically.
- :func:`encode` — the standard greedy lowest-rank merge loop (the
  GPT-2 ``bpe()`` shape) for one word; pure python, used inside the
  Arrow batches and by tests as the single source of truth.
- :func:`bpe_token_stats` — distributed encoding over an Arrow
  ``pandas_udf``: merges broadcast once per executor (closure capture),
  per-batch word→token-count memoization (Zipf makes the cache hit rate
  enormous), and only *counts* leave Python — the scan, the stats
  arithmetic and everything downstream stays JVM-side.

SQL cannot express iterative merge training or the greedy encode loop,
so the catalog entry (t19) is rows-only by design; correctness is
pinned by a pure-python full-corpus model in the test suite instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

EOW = "</w>"  # end-of-word marker, merged like any other symbol


def _word_freqs(texts: list[str]) -> dict[tuple[str, ...], int]:
    freqs: dict[tuple[str, ...], int] = {}
    for t in texts:
        if not t:
            continue
        for w in t.split(" "):
            if not w:
                continue
            sym = (*w, EOW)
            freqs[sym] = freqs.get(sym, 0) + 1
    return freqs


def train_bpe(
    df: DataFrame,
    text_col: str,
    *,
    n_merges: int = 200,
    sample_n: int = 2000,
    seed: int = 42,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a bounded driver sample.

    Returns the ordered merge list (rank = position).  Deterministic:
    hash-ordered sample, and among equally-frequent pairs the
    lexicographically smallest merges first.
    """
    rows = (
        df.select(F.col(text_col).alias("_t"))
        .where(F.col("_t").isNotNull())
        .orderBy(F.xxhash64("_t", F.lit(seed)), "_t")
        .limit(sample_n)
        .collect()
    )
    freqs = _word_freqs([r._t for r in rows])
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for sym, n in freqs.items():
            for a, b in zip(sym, sym[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + n
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < 2:
            break  # nothing repeats — further merges are noise
        merges.append(best)
        joined = best[0] + best[1]
        nxt: dict[tuple[str, ...], int] = {}
        for sym, n in freqs.items():
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == best[0] and sym[i + 1] == best[1]:
                    out.append(joined)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            nxt[key] = nxt.get(key, 0) + n
        freqs = nxt
    return merges


def encode(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE encode of one word: repeatedly merge the present pair
    with the lowest training rank (the canonical GPT-2 loop)."""
    sym: list[str] = [*word, EOW]
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_token_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """(id, n_bpe_tokens, n_words, n_chars, chars_per_token) per doc.

    The merge table rides to executors in the UDF closure (a merge list
    is a few KB–MB — broadcast-sized by construction).  Each Arrow
    batch encodes with a word-level memo dict, so per-batch work is
    O(distinct words), not O(tokens).
    """
    ranks = {pair: i for i, pair in enumerate(merges)}

    @F.pandas_udf(LongType())
    def _n_bpe(texts):  # type: ignore[no-untyped-def]
        import pandas as pd

        memo: dict[str, int] = {}

        def count(t):  # noqa: ANN001
            if not isinstance(t, str) or not t:
                return 0
            total = 0
            for w in t.split(" "):
                if not w:
                    continue
                n = memo.get(w)
                if n is None:
                    n = len(encode(w, ranks))
                    memo[w] = n
                total += n
            return total

        return pd.Series([count(t) for t in texts], dtype="int64")

    # greatest(.., 0): size() is -1 for NULL text under the pinned
    # legacy sizeOfNull semantics; NULL and empty text both mean 0 words
    # (keeps n_words consistent with the n_bpe_tokens=0 the encoder
    # emits for NULL).
    n_words = F.greatest(
        F.size(F.filter(F.split(F.col(text_col), " "), lambda w: w != "")),
        F.lit(0),
    )
    return df.select(
        F.col(id_col),
        _n_bpe(F.col(text_col)).alias("n_bpe_tokens"),
        n_words.cast("long").alias("n_words"),
        F.coalesce(F.length(text_col), F.lit(0)).cast("long").alias("n_chars"),
    ).withColumn(
        "chars_per_token",
        F.when(
            F.col("n_bpe_tokens") > 0,
            F.col("n_chars").cast("double") / F.col("n_bpe_tokens").cast("double"),
        ).otherwise(F.lit(0.0)),
    )
