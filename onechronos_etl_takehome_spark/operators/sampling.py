"""Weighted sampling via a distributed prefix sum.

``t06`` (hash sampling) and ``t11`` (per-group quota sampling) cover
uniform and stratified-count selection; the missing member of the
family is **probability-proportional-to-size** sampling — "draw ~n
documents where a doc's chance is proportional to its weight (length,
quality score, spend)" — the standard way a training-data pipeline
downsamples a trillion-token corpus while preserving its weighted
composition.

The classical deterministic form is **systematic PPS sampling**: lay
every row's weight end-to-end on a number line (a prefix sum over a
pinned key order), cut the line into ``n`` equal strata, and take the
row under each cut. Exact integer arithmetic end-to-end → the whole
thing is SQL-expressible and hash-matches a DuckDB oracle (x16).

The interesting distributed piece is the prefix sum. A naive
``Window.orderBy(key)`` with no partition key funnels the entire table
through ONE task — the classic global-window scale cliff. The
two-pass prefix sum here is the textbook fix:

1. bucket rows by deterministic, order-respecting key ranges;
2. cumsum *within* each bucket (parallel window per bucket);
3. cumsum the (tiny, one-row-per-bucket) bucket totals and broadcast
   each bucket's exclusive offset back;
4. global prefix = local prefix + bucket offset.

Buckets derive from ``floor((key-lo)/span · nb)`` — a pure function of
the key (no sampled range partitioner), so the two lineage branches
can never disagree about bucket membership.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from .util import truncate_lineage


def prefix_sum(
    df: DataFrame,
    key_col: str,
    value_col: str,
    out: str = "cum",
    *,
    n_buckets: int = 32,
    tiebreak_cols: list[str] | None = None,
    partition_cols: list[str] | None = None,
    truncate: bool = True,
) -> DataFrame:
    """Add ``out`` = inclusive prefix sum of ``value_col`` in
    ``(key_col, *tiebreak_cols)`` order. ``key_col`` must be numeric
    and non-null; the composite order must be unique (within each
    partition when ``partition_cols`` is given). Without tiebreaks the
    key itself must be unique.

    Two-pass distributed shape (see module docstring): no global
    single-task window; the widest exchange is the per-bucket window,
    parallel across ``n_buckets``. Buckets derive from ``key_col``
    ranges — equal keys always share a bucket, so a non-unique key
    with tiebreaks still yields a well-defined global order. Bucket
    skew follows key-space skew (dense surrogate keys → near-uniform);
    crank ``n_buckets`` to the cluster's parallelism at scale.

    ``partition_cols``: independent prefix sums per group (e.g. one
    running token total per corpus domain). Bucket boundaries stay
    global (one broadcast range aggregate); the offset frame grows to
    |groups|·n_buckets rows — broadcast-small for dimension-like
    group counts, which is the intended regime.

    ``truncate`` (default True): the three internal branches (range
    aggregate, per-bucket window, bucket totals) each re-execute the
    input's lineage; when that lineage is expensive (t24's md5/conv
    priority subtree re-scanned `documents` 12×), the 3× re-derive is
    the dominant cost at scale, so the input is eagerly
    lineage-truncated ONCE up front and all three branches read the
    materialized frame. Pass False only when the input is already a
    checkpoint/cache leaf (x29 truncates its file inventory itself).
    """
    if truncate:
        df = truncate_lineage(df)
    parts = partition_cols or []
    order = [key_col, *(tiebreak_cols or [])]
    key = F.col(key_col)
    rng = df.agg(
        F.min(key).alias("_lo"), F.max(key).alias("_hi")
    )
    span = F.col("_hi").cast("double") - F.col("_lo").cast("double") + 1.0
    bucketed = df.crossJoin(F.broadcast(rng)).withColumn(
        "_bkt",
        F.least(
            F.floor(
                (key.cast("double") - F.col("_lo").cast("double"))
                / span
                * F.lit(float(n_buckets))
            ),
            F.lit(n_buckets - 1),
        ).cast("int"),
    ).drop("_lo", "_hi")
    w_local = (
        Window.partitionBy(*parts, "_bkt")
        .orderBy(*[F.col(c) for c in order])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = bucketed.withColumn("_cum_local", F.sum(value_col).over(w_local))
    totals = bucketed.groupBy(*parts, "_bkt").agg(
        F.sum(value_col).alias("_tot")
    )
    w_bkt = (
        (Window.partitionBy(*parts) if parts else Window)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # |groups|·n_buckets rows — the offset window is driver-small by
    # construction (and parallel across groups when partitioned).
    offsets = totals.select(
        *parts,
        "_bkt",
        (F.sum("_tot").over(w_bkt) - F.col("_tot")).alias("_off"),
    )
    return (
        local.join(F.broadcast(offsets), [*parts, "_bkt"])
        .withColumn(out, F.col("_cum_local") + F.col("_off"))
        .drop("_bkt", "_cum_local", "_off")
    )


def systematic_pps_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    n: int,
    *,
    n_buckets: int = 32,
) -> DataFrame:
    """Systematic PPS sample: ``(key, weight, multiplicity)`` rows
    whose weight interval contains at least one of the ``n`` stratum
    cuts; Σ multiplicity = n exactly.

    ``weight_col`` must be a non-negative BIGINT (pre-scale money to
    cents with ``floor(x*100)`` — floor, not cast, so Spark's
    truncating and DuckDB's rounding double→int casts can't diverge).
    All arithmetic is integer (cum·n ≤ ~9.2e18 bounds the BIGINT form
    to ~10^17 total weight; at 100 TB move both sides to
    DECIMAL(38,0) — same expressions, wider lattice).

    Row selected ⟺ floor(cum·n/total) > floor((cum−w)·n/total); the
    multiplicity (#cuts inside the row's interval) is their
    difference — a heavy row can legitimately be drawn into several
    strata, which is exactly PPS-with-replacement semantics.
    """
    cum = truncate_lineage(
        prefix_sum(df, key_col, weight_col, "_cum", n_buckets=n_buckets)
    )
    # non-negative weights → the inclusive cumsum is non-decreasing, so
    # max(_cum) IS Σweight; aggregating cum (not df) keeps the original
    # input lineage evaluated exactly once (inside prefix_sum's
    # truncation), not re-derived for a second total pass — and cum is
    # itself truncated so the total branch and the selection branch
    # share ONE window execution
    total = cum.agg(F.max("_cum").alias("_total"))
    sel_hi = F.expr(f"_cum * {n} div _total")
    sel_lo = F.expr(f"(_cum - {weight_col}) * {n} div _total")
    return (
        cum.crossJoin(F.broadcast(total))
        .withColumn("multiplicity", (sel_hi - sel_lo).cast("long"))
        .filter(F.col("multiplicity") > 0)
        .select(key_col, F.col(weight_col).alias("weight"), "multiplicity")
    )


def weighted_percentiles(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    percentiles: list[int],
    *,
    tiebreak_cols: list[str] | None = None,
    n_buckets: int = 32,
) -> DataFrame:
    """Exact weighted percentiles: ``(pct, value)`` — the smallest
    value whose cumulative weight reaches pct% of the total (weighted
    median at 50, tail latencies at 90/99, token-weighted length cuts
    in a corpus pipeline).

    ``value_col`` numeric non-null, ``weight_col`` non-negative BIGINT;
    ``(value, *tiebreaks)`` must be unique. All comparisons are integer
    (``cum·100 ≥ pct·total``) — no float percentile interpolation, so
    the result hash-matches a SQL-window oracle exactly.

    Because the prefix sum runs in value order, the qualifying set of
    each cut is an order-suffix, so the crossing row's value is simply
    ``MIN(value)`` over qualifying rows — one bucketed prefix sum
    (distributed, see ``prefix_sum``), one broadcast total, one tiny
    aggregate per cut. No global window, no sort of the full table.
    """
    cum = truncate_lineage(
        prefix_sum(
            df,
            value_col,
            weight_col,
            "_cum",
            n_buckets=n_buckets,
            tiebreak_cols=tiebreak_cols,
        )
    )
    # max of the inclusive cumsum == Σweight (weights non-negative);
    # see systematic_pps_sample — one window execution shared by the
    # total branch and the percentile filter
    total = cum.agg(F.max("_cum").alias("_total"))
    pcts = F.explode(
        F.array(*[F.lit(int(p)) for p in percentiles])
    ).alias("pct")
    return (
        cum.crossJoin(F.broadcast(total))
        .select(F.col(value_col), F.col("_cum"), F.col("_total"), pcts)
        .filter(F.col("_cum") * 100 >= F.col("pct") * F.col("_total"))
        .groupBy("pct")
        .agg(F.min(value_col).alias("value"))
    )
