"""Ordered-step funnel analysis over an event stream.

``window_funnel`` computes, per user, how deep an ordered sequence of
event steps was completed, where every step must happen within
``window`` of the FIRST step's timestamp and at-or-after the previous
step; unrelated events in between are allowed (strict-order-relaxed).

Anchor semantics: the funnel is anchored to the user's EARLIEST step-1
event — deliberately STRICTER than ClickHouse's ``windowFunnel``,
which returns the maximum chain over ANY window start (a user whose
first view goes nowhere but who converts from a later view scores
depth 1 here, depth 3 there). The earliest-anchor form is the common
product-analytics definition ("from first exposure"), is what the x07
oracle pins, and needs only min() per step instead of per-start chain
search.

Shape — ONE scan, ONE exchange (the round-7 rewrite; the previous
per-step filter-join-aggregate chain re-derived the events lineage
once per step and PLANS.md showed x07 at 7 input scans): the events
scan is hash-partitioned by user once, then each step is a
conditional MIN over the whole partition (unbounded frame, no sort) —
``stepk_ts = min(ts where predicate_k ∧ ts ≥ step(k-1)_ts ∧ ts ≤
step1_ts + window)`` — with consecutive Window operators sharing the
single exchange because they share the partitioning, and the final
per-user collapse reusing it too. NULLs compose the sequencing for
free: a user without step k-1 has NULL ``step(k-1)_ts``, every step-k
comparison against it is NULL, the conditional MIN sees no rows, and
depth stops — no state blowup for hot users; min() per step is all
the state carried.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def window_funnel(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    step_predicates: list[Column],
    window_expr: str = "INTERVAL 24 HOURS",
) -> DataFrame:
    """Return (user, step1_ts..stepN_ts, funnel_depth).

    ``step_predicates[k]`` selects the events eligible as step k+1.
    ``funnel_depth`` counts completed steps (>=1: every returned user
    completed step 1). Step timestamps beyond the reached depth are
    NULL. Deterministic: min() at every step.
    """
    if not step_predicates:
        raise ValueError("window_funnel needs at least one step predicate")
    ts = F.col(ts_col)
    window = F.expr(window_expr)
    w = Window.partitionBy(user_col)

    # Pre-filter to rows matching ANY step: a row matching no step
    # contributes to no conditional MIN and anchors no group, so this
    # is semantically free — and it keeps predicate pushdown on the
    # single scan (the disjunction reaches the parquet reader and
    # prunes row groups; without it a 100 TB funnel reads every event
    # type).
    any_step = step_predicates[0]
    for p in step_predicates[1:]:
        any_step = any_step | p
    df = events.filter(any_step).select(
        user_col,
        ts_col,
        *[p.alias(f"_p{k}") for k, p in enumerate(step_predicates, start=1)],
    )
    df = df.withColumn(
        "step1_ts", F.min(F.when(F.col("_p1"), ts)).over(w)
    )
    for k in range(2, len(step_predicates) + 1):
        prev_ts = F.col(f"step{k - 1}_ts")
        df = df.withColumn(
            f"step{k}_ts",
            F.min(
                F.when(
                    F.col(f"_p{k}")
                    & (ts >= prev_ts)
                    & (ts <= F.col("step1_ts") + window),
                    ts,
                )
            ).over(w),
        )
    step_cols = [f"step{k}_ts" for k in range(1, len(step_predicates) + 1)]
    depth = F.lit(1)
    for c in step_cols[1:]:
        depth = depth + F.when(F.col(c).isNotNull(), 1).otherwise(0)
    # one row per user who completed step 1; every event row of a user
    # carries identical stepk_ts values, so min() is pure collapse
    return (
        df.filter(F.col("step1_ts").isNotNull())
        .groupBy(user_col)
        .agg(*[F.min(c).alias(c) for c in step_cols])
        .withColumn("funnel_depth", depth.cast("long"))
    )
