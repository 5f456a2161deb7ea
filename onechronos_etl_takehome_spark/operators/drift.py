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

    l1_num = Σ_b |n_A(b)·N_B − n_B(b)·N_A|   (exact BIGINT)
    tvd    = l1_num / (2·N_A·N_B)            (one double division)

Binning is integer arithmetic end-to-end: value → cents via the
x16-proven ``floor(value·100)`` (identical IEEE product in both
engines), then ``cents·n_bins div (max_cents+1)`` — shared global
max so both windows use the same grid.

Scale: two grouped counts (map-side partial) + a full-outer join on
(group, bin) — the joined frame is groups×bins rows, so everything
after the two scans is dimension-sized. The global max is a 1-row
broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def histogram_drift(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    group_cols: list[str],
    *,
    n_bins: int = 10,
    cents_scale: int = 100,
) -> DataFrame:
    """Per-group drift report between window ``a`` and window ``b``:
    (group_cols..., n_a, n_b, bins_a, bins_b, l1_num, tvd).

    ``l1_num`` is the exact integer L1 numerator over the common
    denominator N_A·N_B; ``tvd = l1_num / (2·N_A·N_B)``. ``bins_a``/
    ``bins_b`` count populated bins per window (a collapse to one bin
    is itself a drift smell even at low TVD).
    """
    cents = F.floor(F.col(value_col) * cents_scale).cast("long")
    va = a.select(*group_cols, cents.alias("_cents"))
    vb = b.select(*group_cols, cents.alias("_cents"))
    # shared grid: global max over BOTH windows, one broadcast row
    mx = (
        va.select("_cents")
        .unionByName(vb.select("_cents"))
        .agg(F.max("_cents").alias("_maxc"))
    )

    def binned(v: DataFrame, out: str) -> DataFrame:
        bin_expr = F.least(
            F.lit(n_bins - 1),
            F.expr(f"_cents * {n_bins} div (_maxc + 1)"),
        )
        return (
            v.join(F.broadcast(mx))
            .select(
                *group_cols,
                F.greatest(F.lit(0), bin_expr).cast("long").alias("_bin"),
            )
            .groupBy(*group_cols, "_bin")
            .agg(F.count(F.lit(1)).cast("long").alias(out))
        )

    j = binned(va, "n_a_bin").join(
        binned(vb, "n_b_bin"), [*group_cols, "_bin"], "full_outer"
    )
    j = j.select(
        *group_cols,
        "_bin",
        F.coalesce("n_a_bin", F.lit(0)).cast("long").alias("n_a_bin"),
        F.coalesce("n_b_bin", F.lit(0)).cast("long").alias("n_b_bin"),
    )
    w = Window.partitionBy(*group_cols)
    j = j.select(
        *group_cols,
        "n_a_bin",
        "n_b_bin",
        F.sum("n_a_bin").over(w).alias("_na"),
        F.sum("n_b_bin").over(w).alias("_nb"),
    )
    return j.groupBy(*group_cols).agg(
        F.min("_na").cast("long").alias("n_a"),
        F.min("_nb").cast("long").alias("n_b"),
        F.sum((F.col("n_a_bin") > 0).cast("long")).cast("long").alias("bins_a"),
        F.sum((F.col("n_b_bin") > 0).cast("long")).cast("long").alias("bins_b"),
        F.sum(
            F.abs(
                F.col("n_a_bin") * F.col("_nb")
                - F.col("n_b_bin") * F.col("_na")
            )
        )
        .cast("long")
        .alias("l1_num"),
        (
            F.sum(
                F.abs(
                    F.col("n_a_bin") * F.col("_nb")
                    - F.col("n_b_bin") * F.col("_na")
                )
            ).cast("double")
            / (F.lit(2.0) * F.min("_na") * F.min("_nb"))
        ).alias("tvd"),
    )
