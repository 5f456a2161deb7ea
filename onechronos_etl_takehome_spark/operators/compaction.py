"""Lakehouse maintenance planners: small-file compaction + table stats.

Two metadata-plane operators every 100-TB table needs on a schedule:

- **Compaction planning** (``compaction_plan``): bin-pack a file
  inventory (one row per file with its byte size) into target-sized
  rewrite groups — the OPTIMIZE/rewrite-data-files planner shape from
  Delta/Iceberg. The assignment is a pure function of an exclusive
  running-byte prefix over the inventory's deterministic order:
  ``bin = prior_bytes div target`` — every file lands in exactly one
  bin, bins fill to ≥ target contiguously, and adjacent files (same
  partition / adjacent dates) stay together, preserving clustering.
  The prefix sum rides :func:`~.sampling.prefix_sum` (bucketed
  two-pass — no single-task global window), though the input is
  metadata-sized by construction: one row per FILE, ~1e6-1e8 rows for
  a 100-TB table, never the data itself.

- **Column statistics** (``column_stats``): ANALYZE-style per-column
  stats for the cost-based optimizer — row/null counts, exact NDV,
  min/max, and equi-depth quartile boundaries. Boundaries are exact
  over the catalog's integer cents grid (``floor(value·100)``, the
  x16/x25-proven construction: identical IEEE product both engines,
  lossless for 2-decimal data): per-column grouped counts (map-side
  partial, grid-sized result), ONE cumulative window over the
  grid — dimension-sized (distinct cents × columns), never the row
  count — then the boundary at depth ``ceil(q·n)`` in pure integer
  arithmetic. The same shape at any scale: no global row sort, no
  per-column scan (a single ``stack`` unpivot feeds every column from
  one pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .sampling import prefix_sum
from .util import truncate_lineage


def compaction_plan(
    files: DataFrame,
    *,
    file_col: str = "file_id",
    bytes_col: str = "bytes",
    order_key: str = "order_key",
    target_bytes: int,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Assign each inventory row a ``bin_id`` such that consecutive
    files (in ``order_key`` order — numeric, unique) are packed into
    bins of ≥ ``target_bytes`` (the last bin may be short).

    Returns the per-file assignment: (file_col, carry_cols...,
    bytes_col, bin_id). Summarize per bin downstream; keeping the
    per-file grain here is what a rewrite job actually consumes.
    """
    carry = carry_cols or []
    cum = prefix_sum(
        files.select(file_col, order_key, bytes_col, *carry),
        order_key,
        bytes_col,
        out="_cum",
    )
    return cum.select(
        file_col,
        *carry,
        bytes_col,
        ((F.col("_cum") - F.col(bytes_col)) / F.lit(target_bytes))
        .cast("long")
        .alias("bin_id"),
    )


def column_stats(
    df: DataFrame,
    columns: list[str],
    *,
    cents_scale: int = 100,
) -> DataFrame:
    """ANALYZE-style stats for numeric ``columns`` of ``df`` in one
    input pass: (col_name, n, n_null, ndv, min_value, max_value,
    p25, p50, p75).

    NDV/min/max/boundaries are exact over the ``floor(value·scale)``
    integer grid (lossless when the data carries ≤ log10(scale)
    decimals; otherwise grid-resolution, which is how engine
    histograms behave anyway). Boundary p_q is the smallest grid
    value whose cumulative count reaches ``ceil(q·n)`` — the
    equi-depth convention, integer arithmetic end-to-end.
    """
    pairs = ", ".join(f"'{c}', {c}" for c in columns)
    u = df.select(
        F.expr(f"stack({len(columns)}, {pairs}) as (col_name, value)")
    )
    cents = F.floor(F.col("value") * cents_scale).cast("long")
    g = (
        u.withColumn("_cents", cents)
        .groupBy("col_name", "_cents")
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
    )
    # grid-sized; cut lineage so the totals / nulls / cumulative
    # branches below reuse the counted grid instead of re-scanning the
    # input once each (the x25 lesson — see operators/drift.py)
    g = truncate_lineage(g)
    nn = g.filter(F.col("_cents").isNotNull())
    tot = nn.groupBy("col_name").agg(
        F.sum("_c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("ndv"),
        F.min("_cents").alias("_mn"),
        F.max("_cents").alias("_mx"),
    )
    nulls = g.groupBy("col_name").agg(
        F.sum(F.when(F.col("_cents").isNull(), F.col("_c")).otherwise(0))
        .cast("long")
        .alias("n_null")
    )
    # ONE window over the (columns × distinct cents) grid — dimension-
    # sized by construction, partitioned per column.
    w = (
        Window.partitionBy("col_name")
        .orderBy("_cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = nn.select("col_name", "_cents", F.sum("_c").over(w).alias("_cum"))

    def depth(pct: int) -> F.Column:  # ceil(pct·n/100) in integers
        return F.expr(f"(n * {pct} + 99) div 100")

    def boundary(pct: int) -> F.Column:
        return (
            F.min(
                F.when(F.col("_cum") >= depth(pct), F.col("_cents"))
            ).cast("double")
            / F.lit(float(cents_scale))
        ).alias(f"p{pct}")

    scale = F.lit(float(cents_scale))
    return (
        cum.join(tot, "col_name")
        .groupBy("col_name")
        .agg(
            F.min("n").alias("n"),
            F.min("ndv").alias("ndv"),
            (F.min("_mn").cast("double") / scale).alias("min_value"),
            (F.min("_mx").cast("double") / scale).alias("max_value"),
            boundary(25),
            boundary(50),
            boundary(75),
        )
        .join(nulls, "col_name")
        .select(
            "col_name",
            "n",
            "n_null",
            "ndv",
            "min_value",
            "max_value",
            "p25",
            "p50",
            "p75",
        )
    )


def compact_files(
    spark,
    assignments: list[tuple[str, int]],
    out_dir: str,
) -> None:
    """Execute a compaction plan: rewrite the planned parquet files as
    ``bin_id=<n>/`` directories with ONE file per bin.

    ``assignments`` is the materialized planner output — (file path,
    bin_id) pairs from :func:`compaction_plan` joined to the physical
    listing. One distributed read of all planned files, one shuffle
    keyed on bin_id (each task holds exactly one bin, so ``partitionBy``
    emits exactly one file per bin directory), one write. Row-level
    provenance rides ``input_file_name`` — no per-file driver loop, so
    a million-file backlog compacts as one job.
    """
    paths = [p for p, _ in assignments]
    bins = spark.createDataFrame(
        [(_norm_path(p), b) for p, b in assignments], "_file string, bin_id long"
    )
    df = (
        spark.read.parquet(*paths)
        .withColumn(
            "_file",
            F.regexp_replace(F.input_file_name(), "^file:/+", "/"),
        )
        .join(F.broadcast(bins), "_file")
        .drop("_file")
    )
    df.repartition("bin_id").write.mode("overwrite").partitionBy(
        "bin_id"
    ).parquet(out_dir)


def _norm_path(p: str) -> str:
    p = p.removeprefix("file:")
    return "/" + p.lstrip("/")
