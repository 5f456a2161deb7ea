"""Stream-stream interval join vs its batch twin (exact match for the
inner join: all in-window matches emit within the availableNow run)."""

from __future__ import annotations

from pyspark.sql import functions as F

from onechronos_etl_takehome_spark.session import pin_semantics
from onechronos_etl_takehome_spark.sources.tables import load_table
from onechronos_etl_takehome_spark.streaming import read_events_stream
from onechronos_etl_takehome_spark.streaming.events_stream import (
    purchase_view_interval_join,
)

SF = "/root/testdata/sf0.001"


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    pin_semantics(spark)
    joined = purchase_view_interval_join(read_events_stream(spark, SF))
    q = (
        joined.writeStream.format("memory")
        .queryName("pv_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    got = {
        (r.purchase_id, r.view_id) for r in spark.table("pv_join").collect()
    }

    e = load_table(spark, SF, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("pts")
    )
    v = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("vu"),
        F.col("ts").alias("vts"),
    )
    expected = {
        (r.purchase_id, r.view_id)
        for r in p.join(
            v,
            (F.col("user_id") == F.col("vu"))
            & (F.col("vts") <= F.col("pts"))
            & (F.col("vts") >= F.col("pts") - F.expr("INTERVAL 1 HOUR")),
        ).collect()
    }
    assert got == expected and len(got) > 0
