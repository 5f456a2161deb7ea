"""Stream-static enrichment + foreachBatch parquet sink."""

from __future__ import annotations

from pyspark.sql import functions as F

from onechronos_etl_takehome_spark.session import pin_semantics
from onechronos_etl_takehome_spark.streaming import read_events_stream
from onechronos_etl_takehome_spark.streaming.events_stream import (
    enrich_stream,
    write_stream_parquet,
)

SF = "/root/testdata/sf0.001"


def test_stream_static_join_and_parquet_sink(spark, tmp_path):
    pin_semantics(spark)
    # static dim: user_id → tier derived from a batch aggregate
    events_batch = spark.read.parquet(f"{SF}/events.parquet")
    dim = (
        events_batch.groupBy("user_id")
        .count()
        .select(
            "user_id",
            F.when(F.col("count") > 5, "heavy").otherwise("light").alias("tier"),
        )
    )

    stream = enrich_stream(read_events_stream(spark, SF), dim, ["user_id"])
    out = str(tmp_path / "enriched")
    q = write_stream_parquet(stream, out, str(tmp_path / "ckpt"))
    q.awaitTermination()

    back = spark.read.parquet(out)
    assert back.count() == events_batch.count()
    assert "tier" in back.columns
    assert back.filter(F.col("tier").isNull()).count() == 0
    heavy_users = {r.user_id for r in dim.filter(F.col("tier") == "heavy").collect()}
    got_heavy = {
        r.user_id for r in back.filter(F.col("tier") == "heavy").collect()
    }
    assert got_heavy == heavy_users
