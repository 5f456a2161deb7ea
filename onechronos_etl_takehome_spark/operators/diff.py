"""Snapshot diff — the CDC classification primitive.

Given two snapshots of a keyed table, classify every key as
insert / update / delete / unchanged and carry both versions of the
compared columns — the operator behind incremental publish auditing,
MERGE planning (sources/upsert.py applies changes; this one REPORTS
them), and reverse-ETL change feeds.

One full-outer join on the key, null-safe column comparison
(``eqNullSafe`` — NULL→NULL is 'unchanged', NULL→value is 'update'),
everything whole-stage codegen'd. At scale both snapshots shuffle on
the key once; pre-bucketed snapshot tables join with no exchange.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    *,
    compare_cols: list[str] | None = None,
    include_unchanged: bool = True,
) -> DataFrame:
    """(keys..., change_type, <col>_old, <col>_new ...).

    ``compare_cols`` defaults to every non-key column of ``new``
    (which must exist in ``old`` too).
    """
    if compare_cols is None:
        compare_cols = [c for c in new.columns if c not in keys]
    o = old.select(
        *keys,
        *[F.col(c).alias(f"{c}_old") for c in compare_cols],
        F.lit(1).alias("_in_old"),
    )
    n = new.select(
        *keys,
        *[F.col(c).alias(f"{c}_new") for c in compare_cols],
        F.lit(1).alias("_in_new"),
    )
    j = o.join(n, list(keys), "full_outer")
    changed = reduce(
        lambda a, b: a | b,
        [
            ~F.col(f"{c}_old").eqNullSafe(F.col(f"{c}_new"))
            for c in compare_cols
        ],
    )
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("insert"))
        .when(F.col("_in_new").isNull(), F.lit("delete"))
        .when(changed, F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(
        *keys,
        change.alias("change_type"),
        *[
            c
            for col in compare_cols
            for c in (f"{col}_old", f"{col}_new")
        ],
    )
    if not include_unchanged:
        out = out.filter(F.col("change_type") != "unchanged")
    return out
