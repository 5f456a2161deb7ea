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

Shape: one conditional aggregation per step, each keyed on the user
column — N-1 shuffle-key-aligned joins plus N groupBys on the same key,
so at scale every stage reuses one hash partitioning of the events
table and the per-step frames are tiny (one row per converting user).
No window functions over the full event history, no state blowup for
hot users: min() per step is all the state carried.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


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

    cur = (
        events.filter(step_predicates[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("step1_ts"))
    )
    depth = F.lit(1)
    for k, pred in enumerate(step_predicates[1:], start=2):
        prev_ts = f"step{k - 1}_ts"
        carry = [user_col, "step1_ts"] + ([prev_ts] if k > 2 else [])
        nxt = (
            events.filter(pred)
            .join(cur.select(*carry), user_col)
            .where((ts >= F.col(prev_ts)) & (ts <= F.col("step1_ts") + window))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"step{k}_ts"))
        )
        cur = cur.join(nxt, user_col, "left")
        depth = depth + F.when(F.col(f"step{k}_ts").isNotNull(), 1).otherwise(0)
    return cur.withColumn("funnel_depth", depth.cast("long"))
