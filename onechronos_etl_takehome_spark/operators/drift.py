"""Distribution drift monitoring: histogram shift between two windows.

The missing-ops complement of x21's single-snapshot profiling and
x12's per-point anomaly scores: a continuously-trained pipeline needs
to know when a FEATURE'S DISTRIBUTION moves between ingestion windows
(new source mix, upstream schema change, seasonal shift) — the
classic PSI/KL drift monitor that gates retraining.

Metric: total variation distance between the two windows' binned
histograms, TVD = ½ Σ_b |p_A(b) − p_B(b)| ∈ [0, 1]. PSI/KL need a
log, and libm is exactly what the catalog's cross-engine exactness
rules ban from hash-matched results (see t08/t16's rational-idf
trick); TVD over common-denominator INTEGERS carries the same
decision signal and hash-matches bit-for-bit:

    l1_num = Σ_b |n_A(b)·N_B − n_B(b)·N_A|   (exact DECIMAL(38,0))
    tvd    = l1_num / (2·N_A·N_B)            (one double division)

The products are accumulated in DECIMAL(38,0) (Spark) / HUGEINT
(DuckDB) — at the documented 100-TB posture a window count N can pass
~3e9, where n(b)·N silently wraps int64 under the pinned non-ANSI
semantics; the 128-bit lattice is exact to 1e38. The reported
``l1_num`` is the final cast of that exact integer to DOUBLE per the
repo rule (functions/exact.py): converting the *same exact value* is
deterministic in both engines (and bit-exact below 2^53, i.e. any
test scale). ``tvd`` is NULL — identically on both engines — when a
group is entirely absent from one window (the ratio is undefined, and
unguarded it would be a Spark-NULL vs DuckDB-inf divergence).

Binning is integer arithmetic end-to-end: value → cents via the
x16-proven ``floor(value·100)`` (identical IEEE product in both
engines), then ``cents·n_bins div (max_cents+1)`` — shared global
max so both windows use the same grid.

Scale (the round-5 verdict's plan defect, fixed): the flagged-column
core scans the input ONCE — grouped conditional counts over
(group, cents) — and everything downstream operates on that
dimension-sized frame (groups × distinct cents, bounded by the cents
grid, never the row count). The counted frame is lineage-truncated so
the shared-grid max and the binning branch don't re-execute the scan
(the old two-frame form re-ran it ~6×: 12 scans / 8 BNLJ in PLANS.md
vs its own single-pass DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .util import truncate_lineage


def histogram_drift_flagged(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    flag_col: str = "is_b",
    *,
    n_bins: int = 10,
    cents_scale: int = 100,
) -> DataFrame:
    """Single-pass drift core: one frame carrying a boolean window
    flag (``flag_col`` false = window A, true = window B) → per-group
    report (group_cols..., n_a, n_b, bins_a, bins_b, l1_num, tvd).

    ``l1_num`` is the exact integer L1 numerator over the common
    denominator N_A·N_B (DECIMAL(38,0) accumulation, final DOUBLE);
    ``tvd = l1_num / (2·N_A·N_B)``, NULL when a group is absent from
    one window. ``bins_a``/``bins_b`` count populated bins per window
    (a collapse to one bin is itself a drift smell even at low TVD).
    """
    cents = F.floor(F.col(value_col) * cents_scale).cast("long")
    v = df.select(
        *group_cols,
        cents.alias("_cents"),
        F.col(flag_col).cast("boolean").alias("_is_b"),
    )
    # THE one pass over the input: conditional counts per (group,
    # cents) — map-side partial, result dimension-sized.
    counts = v.groupBy(*group_cols, "_cents").agg(
        F.sum(F.when(F.col("_is_b"), 0).otherwise(1))
        .cast("long")
        .alias("n_a_c"),
        F.sum(F.when(F.col("_is_b"), 1).otherwise(0))
        .cast("long")
        .alias("n_b_c"),
    )
    # cut lineage: the grid-max branch and the binning branch below
    # must both read these counts WITHOUT re-executing the input scan
    counts = truncate_lineage(counts)
    # shared grid: global max cents, one broadcast row off the counts
    mx = counts.agg(F.max("_cents").alias("_maxc"))
    bin_expr = F.least(
        F.lit(n_bins - 1),
        F.expr(f"_cents * {n_bins} div (_maxc + 1)"),
    )
    j = (
        counts.join(F.broadcast(mx))
        .select(
            *group_cols,
            F.greatest(F.lit(0), bin_expr).cast("long").alias("_bin"),
            "n_a_c",
            "n_b_c",
        )
        .groupBy(*group_cols, "_bin")
        .agg(
            F.sum("n_a_c").cast("long").alias("n_a_bin"),
            F.sum("n_b_c").cast("long").alias("n_b_bin"),
        )
    )
    return drift_from_binned(j, group_cols)


def drift_from_binned(j: DataFrame, group_cols: list[str]) -> DataFrame:
    """Report tail shared by the batch core and the streaming monitor:
    ``j`` carries one row per (group_cols..., _bin) with ``n_a_bin`` /
    ``n_b_bin`` counts (already complete per group — missing bins may
    simply be absent); returns the per-group drift report. Everything
    here is dimension-sized (groups × bins rows in, groups rows out)."""
    w = Window.partitionBy(*group_cols)
    j = j.select(
        *group_cols,
        "n_a_bin",
        "n_b_bin",
        F.sum("n_a_bin").over(w).alias("_na"),
        F.sum("n_b_bin").over(w).alias("_nb"),
    )

    def dec38(name: str) -> Column:
        return F.col(name).cast("decimal(38,0)")

    l1_term = F.abs(
        dec38("n_a_bin") * dec38("_nb") - dec38("n_b_bin") * dec38("_na")
    )
    return j.groupBy(*group_cols).agg(
        F.min("_na").cast("long").alias("n_a"),
        F.min("_nb").cast("long").alias("n_b"),
        F.sum((F.col("n_a_bin") > 0).cast("long")).cast("long").alias("bins_a"),
        F.sum((F.col("n_b_bin") > 0).cast("long")).cast("long").alias("bins_b"),
        F.sum(l1_term).cast("double").alias("l1_num"),
        F.when(
            (F.min("_na") > 0) & (F.min("_nb") > 0),
            F.sum(l1_term).cast("double")
            / (F.lit(2.0) * F.min("_na") * F.min("_nb")),
        ).alias("tvd"),
    )


def histogram_drift(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    group_cols: list[str],
    *,
    n_bins: int = 10,
    cents_scale: int = 100,
) -> DataFrame:
    """Two-frame public API: drift report between window ``a`` and
    window ``b`` — a thin wrapper that flags and unions the inputs
    and defers to :func:`histogram_drift_flagged`. When both windows
    are filters over ONE source, call the flagged form directly with a
    boolean window predicate instead: the union form necessarily scans
    each input once (2 scans), the flagged form exactly once.
    """
    cols = [*group_cols, value_col]
    u = a.select(*cols, F.lit(False).alias("_w_is_b")).unionByName(
        b.select(*cols, F.lit(True).alias("_w_is_b"))
    )
    return histogram_drift_flagged(
        u,
        value_col,
        group_cols,
        "_w_is_b",
        n_bins=n_bins,
        cents_scale=cents_scale,
    )
