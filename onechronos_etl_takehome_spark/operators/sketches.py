"""Frequency-sketch operators (heavy hitters).

``heavy_hitters`` is the two-pass distributed Misra-Gries shape:

1. **Candidate pass** — per-Arrow-batch Misra-Gries summaries with
   ``k_counters`` counters (``mapInPandas``). The MG guarantee
   composes across batches: an item absent from every batch summary
   has global frequency <= n / (k_counters + 1), so the union of
   candidates is a superset of every item with frequency above
   ``n / threshold_denom`` whenever ``k_counters + 1 >= threshold_denom``.
2. **Recount pass** — exact counts of the (small) candidate set via a
   broadcast semi-join, filtered with exact integer math
   ``count * threshold_denom > n``.

The final answer is therefore *exact and deterministic* (the sketch
only prunes work), which is what makes it oracle-comparable. At 100 TB
pass 1 ships one tiny summary per batch instead of shuffling the full
token stream, and pass 2 shuffles only rows matching the few surviving
candidates.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_candidates(
    items: DataFrame, col: str, *, k_counters: int
) -> DataFrame:
    """Distinct candidate values that may exceed frequency n/(k+1).

    Per-batch summaries are built from vectorized ``value_counts`` and
    merged with the standard MG prune: when more than ``k_counters``
    counters exist, subtract the (k+1)-th largest count from all and
    drop the non-positive ones. Guarantee: any value with global
    frequency > n/(k_counters+1) survives in at least one batch
    summary.
    """

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[object, int] = {}
        for pdf in batches:
            for value, count in pdf[col].value_counts().items():
                counters[value] = counters.get(value, 0) + int(count)
            if len(counters) > k_counters:
                cutoff = sorted(counters.values(), reverse=True)[k_counters]
                counters = {
                    v: c - cutoff for v, c in counters.items() if c > cutoff
                }
        yield pd.DataFrame({col: list(counters.keys())})

    return items.mapInPandas(summarize, schema=f"{col} string").distinct()


def heavy_hitters(
    items: DataFrame,
    col: str,
    *,
    threshold_denom: int = 30,
    k_counters: int | None = None,
) -> DataFrame:
    """(value, n_occurrences) for every value with count*denom > n.

    Exact output (MG only prunes the recount to a candidate set);
    ``k_counters`` defaults to ``4 * threshold_denom`` which satisfies
    the k+1 >= denom guarantee with slack for skewed batches.
    """
    k = k_counters if k_counters is not None else 4 * threshold_denom
    if k + 1 < threshold_denom:
        raise ValueError(
            f"k_counters={k} too small for threshold 1/{threshold_denom}: "
            f"the MG guarantee needs k_counters + 1 >= threshold_denom"
        )
    candidates = misra_gries_candidates(items, col, k_counters=k)
    total = items.groupBy().agg(F.count(F.lit(1)).alias("_n_total"))
    return (
        items.join(F.broadcast(candidates), col)
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .join(F.broadcast(total))
        .filter(F.col("n_occurrences") * threshold_denom > F.col("_n_total"))
        .select(col, "n_occurrences")
    )
