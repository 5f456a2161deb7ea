"""Stateful streaming sessionization vs its batch twin (q18).

Gap-closed sessions are emitted in the data batch; each user's
trailing session is emitted by event-time timeout in the final
(empty) availableNow batch iff the watermark (global max ts - delay)
passed its timeout timestamp (session_end + gap) — otherwise it stays
open in state. The test models both cases exactly.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from onechronos_etl_takehome_spark.plans.catalog import QUERIES
from onechronos_etl_takehome_spark.session import pin_semantics
from onechronos_etl_takehome_spark.sources.tables import load_table
from onechronos_etl_takehome_spark.streaming import read_events_stream
from onechronos_etl_takehome_spark.streaming.sessionize import sessionize_stream

SF = "/root/testdata/sf0.001"
GAP_S = 1800
WM_S = 3600


def test_sessionize_stream_matches_batch(spark, tmp_path):
    pin_semantics(spark)
    out = sessionize_stream(
        read_events_stream(spark, SF), gap_seconds=GAP_S, watermark="1 hour"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    emitted = Counter(
        r.user_id for r in spark.table("sessions_stream").collect()
    )

    batch = {
        r.user_id: r.n_sessions
        for r in QUERIES["q18_user_sessions"](spark, SF).collect()
    }
    e = load_table(spark, SF, "events")
    global_max = e.agg(F.max("ts")).collect()[0][0]
    last_ts = {
        r.user_id: r.last_ts
        for r in e.groupBy("user_id").agg(F.max("ts").alias("last_ts")).collect()
    }
    wm = global_max.timestamp() - WM_S
    expected = {
        u: (n if last_ts[u].timestamp() + GAP_S < wm else n - 1)
        for u, n in batch.items()
    }
    expected = {u: n for u, n in expected.items() if n > 0}
    assert dict(emitted) == expected

    # every emitted session respects the gap invariant
    rows = spark.table("sessions_stream").collect()
    assert all(r.session_end >= r.session_start and r.n_events >= 1 for r in rows)
