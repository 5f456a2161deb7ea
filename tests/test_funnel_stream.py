"""Stateful streaming window funnel vs an exact event-order simulation
and the batch twin (x07).

Single-file source → one data microbatch (all events, sorted in the
operator) + the final empty availableNow batch where event-time
timeouts fire for attempts whose ``s1 + window`` the watermark passed.
The Python simulation mirrors that contract exactly; the x07
cross-check pins the FIRST attempt per user against an independent
implementation (conditional-aggregation joins, DuckDB-oracled).
"""

from __future__ import annotations

import datetime as dt
from collections import defaultdict

from onechronos_etl_takehome_spark.plans.catalog import QUERIES
from onechronos_etl_takehome_spark.session import pin_semantics
from onechronos_etl_takehome_spark.sources.tables import load_table
from onechronos_etl_takehome_spark.streaming import read_events_stream
from onechronos_etl_takehome_spark.streaming.funnel_stream import funnel_stream

SF = "/root/testdata/sf0.001"
STEPS = ["view", "click", "purchase"]
WINDOW_S = 24 * 3600
WM_S = 3600


def _simulate(events):
    """Replay the funnel state machine over globally-sorted events,
    then close open attempts whose deadline the final watermark
    passed. Returns closed attempts as (user, s1, s2, s3 (us|-1), depth)."""
    window_us = WINDOW_S * 1_000_000
    by_user = defaultdict(list)
    max_ts_us = 0
    for r in events:
        ts_us = _us(r.ts)
        max_ts_us = max(max_ts_us, ts_us)
        if r.event_type in STEPS:
            by_user[r.user_id].append((ts_us, STEPS.index(r.event_type)))
    wm_us = max_ts_us - WM_S * 1_000_000

    closed = []
    for user, ev in by_user.items():
        ev.sort()
        steps = [-1, -1, -1]
        for ts_us, idx in ev:
            if steps[0] >= 0 and ts_us > steps[0] + window_us:
                closed.append((user, *steps, sum(s >= 0 for s in steps)))
                steps = [-1, -1, -1]
            if idx == 0 and steps[0] < 0:
                steps[0] = ts_us
            elif (
                steps[0] >= 0
                and idx > 0
                and steps[idx] < 0
                and steps[idx - 1] >= 0
                and steps[idx - 1] <= ts_us <= steps[0] + window_us
            ):
                steps[idx] = ts_us
                if idx == 2:
                    closed.append((user, *steps, 3))
                    steps = [-1, -1, -1]
        # timeout pass: GroupStateTimeout fires when the watermark
        # strictly exceeds the registered timeout (ms resolution)
        if steps[0] >= 0 and wm_us // 1000 > (steps[0] // 1000 + WINDOW_S * 1000):
            closed.append((user, *steps, sum(s >= 0 for s in steps)))
    return closed


def _us(ts):
    # collected timestamps are naive in the pinned UTC session TZ;
    # anchor them explicitly so the OS timezone can't skew the math
    if ts is None:
        return -1
    return int(ts.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)


def test_funnel_stream_matches_simulation_and_batch_twin(spark, tmp_path):
    pin_semantics(spark)
    out = funnel_stream(
        read_events_stream(spark, SF),
        STEPS,
        window_seconds=WINDOW_S,
        watermark="1 hour",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("funnel_stream_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    emitted = [
        (r.user_id, _us(r.step1_ts), _us(r.step2_ts), _us(r.step3_ts),
         r.funnel_depth)
        for r in spark.table("funnel_stream_t").collect()
    ]
    assert emitted, "stream emitted nothing"

    sim = _simulate(load_table(spark, SF, "events").collect())
    assert sorted(emitted) == sorted(sim)

    # cross-check the FIRST attempt per user against the batch twin
    batch = {
        r.user_id: (r.step1_ts, r.step2_ts, r.step3_ts, r.funnel_depth)
        for r in QUERIES["x07_window_funnel"](spark, SF).collect()
    }
    first = {}
    for u, s1, s2, s3, d in sorted(emitted):
        first.setdefault(u, (s1, s2, s3, d))

    def _fmt(us):
        if us < 0:
            return None
        return dt.datetime.fromtimestamp(us / 1e6, dt.timezone.utc).strftime(
            "%Y-%m-%d %H:%M:%S"
        )

    for u, (s1, s2, s3, d) in first.items():
        b1, b2, b3, bd = batch[u]
        assert (b1, b2, b3, bd) == (_fmt(s1), _fmt(s2), _fmt(s3), d), u
