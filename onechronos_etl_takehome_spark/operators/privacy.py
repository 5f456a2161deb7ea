"""Privacy / governance operators: k-anonymity over quasi-identifiers.

The release-gate complement of t10's direct-identifier redaction:
direct PII (emails, phones) is regex-scrubbable per row, but a row is
still re-identifiable through its QUASI-identifier combination
(nation × market-segment × birth-year …) when few rows share it.
k-anonymity requires every released quasi-identifier combination to
cover ≥ k rows; combinations below k are SUPPRESSED (quasi columns
nulled) rather than dropped, so row counts and non-quasi analytics
survive the release.

Scale shape: one window count over the quasi-identifier key (a single
hash exchange — the same cost as the groupBy any release audit runs
anyway); suppression is a scan-stage ``when``. No driver state, no
extra pass. Fully SQL-expressible, so the catalog witness (t23) is
hash-matched cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def quasi_group_sizes(df: DataFrame, quasi_cols: list[str]) -> DataFrame:
    """Append ``_k`` = size of the row's quasi-identifier group
    (NULL-safe: NULL quasi values group together, as released NULLs
    are indistinguishable too)."""
    return df.withColumn(
        "_k", F.count(F.lit(1)).over(Window.partitionBy(*quasi_cols))
    )


def k_anonymize(
    df: DataFrame, quasi_cols: list[str], *, k: int
) -> DataFrame:
    """Suppress (null out) the quasi-identifier columns of every row
    whose combination covers fewer than ``k`` rows; adds a boolean
    ``suppressed`` marker. All other columns pass through."""
    sized = quasi_group_sizes(df, quasi_cols)
    out = sized
    for c in quasi_cols:
        out = out.withColumn(
            c, F.when(F.col("_k") >= k, F.col(c))  # else NULL
        )
    return out.withColumn("suppressed", F.col("_k") < k).drop("_k")
