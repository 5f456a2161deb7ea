"""Type-2 slowly-changing dimensions: build + incremental maintenance.

``scd2_build`` compresses a change log into one versioned row per
state RUN with half-open ``[valid_from, valid_to)`` ranges (open
version: ``valid_to`` NULL). ``scd2_apply`` merges an APPEND batch of
later changes into an existing dimension without rebuilding history —
the operational form every warehouse runs nightly: at 100 TB the
historical dimension is never rescanned, only the (small) increment
is windowed and only the touched keys' OPEN versions are joined.

Exactness contract (pinned by the x27 catalog row): for any split of
the log into (history, increment) with all increment rows strictly
later per key, ``scd2_apply(scd2_build(history), increment)`` equals
``scd2_build(history ∪ increment)`` row-for-row — including the
run-continuation edge where a key's open state persists into the
increment (the continuing change must extend the open run, not open
a duplicate version).

Scale: build = one lag() window over the log + the stitching windows
over the (much smaller) change frame, all under one per-key
partitioning. Apply = the same windows over the increment only, one
equi-join against the open slice of the dimension (dimension-sized,
and prunable to keys present in the increment), and a union; closed
historical versions stream through untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_build(
    log: DataFrame,
    key_col: str,
    state_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """(key, version, state, valid_from, valid_to) — typed timestamps,
    ``valid_to`` NULL on the open version. Consecutive equal states
    collapse into one run; ``(ts, tiebreak)`` must be unique per key."""
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    changes = log.select(
        key_col,
        F.col(state_col).alias("state"),
        F.col(ts_col).alias("valid_from"),
        F.col(tiebreak_col).alias("_tb"),
        F.lag(state_col).over(w).alias("_prev"),
    ).filter(F.coalesce(F.col("_prev") != F.col("state"), F.lit(True)))
    wc = Window.partitionBy(key_col).orderBy("valid_from", "_tb")
    return changes.select(
        key_col,
        F.row_number().over(wc).cast("long").alias("version"),
        "state",
        "valid_from",
        F.lead("valid_from").over(wc).alias("valid_to"),
    )


def scd2_apply(
    dim: DataFrame,
    inc: DataFrame,
    key_col: str,
    state_col: str,
    ts_col: str,
    tiebreak_col: str,
    *,
    truncate: bool = True,
) -> DataFrame:
    """Merge an append batch into an SCD2 dimension built by
    :func:`scd2_build`. Every ``inc`` row must order strictly after
    the key's open ``valid_from`` (append-only log contract).

    ``truncate`` (default True) lineage-truncates the kept-changes
    frame, which fans out into BOTH the close-stamp aggregate and the
    new-version rows — without the cut each branch re-derives the
    increment window AND the open-slice join against ``dim``, which is
    how the x27 composition reached 10 input scans. The frame is
    increment-sized (the nightly batch), so the materialization is
    cheap by contract."""
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    ic = inc.select(
        key_col,
        F.col(state_col).alias("state"),
        F.col(ts_col).alias("valid_from"),
        F.col(tiebreak_col).alias("_tb"),
        F.lag(state_col).over(w).alias("_prev"),
    ).filter(F.coalesce(F.col("_prev") != F.col("state"), F.lit(True)))

    # open slice of the dimension: exactly one row per existing key
    open_v = dim.filter(F.col("valid_to").isNull()).select(
        key_col,
        F.col("version").alias("_open_version"),
        F.col("state").alias("_open_state"),
    )
    ic = ic.join(open_v, key_col, "left")
    # run continuation: the increment's FIRST change carrying the same
    # state as the key's open version extends that run — drop it
    wi = Window.partitionBy(key_col).orderBy("valid_from", "_tb")
    kept = (
        ic.withColumn("_rn0", F.row_number().over(wi))
        .filter(
            ~(
                (F.col("_rn0") == 1)
                & F.col("state").eqNullSafe(F.col("_open_state"))
            )
        )
        .drop("_rn0")
    )
    if truncate:
        from .util import truncate_lineage

        kept = truncate_lineage(kept)
    # close each touched key's open version at its first KEPT change
    closes = kept.groupBy(key_col).agg(
        F.min(F.struct("valid_from", "_tb")).getField("valid_from").alias(
            "_close_ts"
        )
    )
    # closes is bounded by the increment's key count — AQE picks a
    # broadcast join whenever the batch is small (the nightly case)
    closed_dim = dim.join(closes, key_col, "left").select(
        key_col,
        "version",
        "state",
        "valid_from",
        # only the open version (valid_to NULL) takes the close stamp
        F.coalesce("valid_to", "_close_ts").alias("valid_to"),
    )
    wk = Window.partitionBy(key_col).orderBy("valid_from", "_tb")
    new_rows = kept.select(
        key_col,
        (
            F.coalesce(F.col("_open_version"), F.lit(0))
            + F.row_number().over(wk)
        )
        .cast("long")
        .alias("version"),
        "state",
        "valid_from",
        F.lead("valid_from").over(wk).alias("valid_to"),
    )
    return closed_dim.unionByName(new_rows)
