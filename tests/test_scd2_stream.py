"""Streaming SCD2 maintenance: any time-split of the change log into
microbatches must converge to exactly scd2_build(full log), and a
replayed batch must be byte-identical (exactly-once contract)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from onechronos_etl_takehome_spark.operators.scd2 import scd2_build
from onechronos_etl_takehome_spark.session import pin_semantics
from onechronos_etl_takehome_spark.sources.tables import load_table
from onechronos_etl_takehome_spark.streaming.scd2_stream import (
    current_dimension,
    process_scd2_batch,
    scd2_stream,
)

SF = "/root/testdata/sf0.001"
KW = dict(
    key_col="user_id",
    state_col="event_type",
    ts_col="ts",
    tiebreak_col="event_id",
)


def _sorted_rows(df):
    return sorted(
        tuple(str(v) for v in r)
        for r in df.select(
            "user_id", "version", "state", "valid_from", "valid_to"
        ).collect()
    )


def test_scd2_stream_matches_batch_build(spark, tmp_path):
    pin_semantics(spark)
    e = load_table(spark, SF, "events")

    # three time-ordered microbatches (strictly later per key across
    # batch boundaries — the append-only log contract)
    lo, hi = e.agg(F.min("ts"), F.max("ts")).first()
    c1 = lo + (hi - lo) / 3
    c2 = lo + 2 * (hi - lo) / 3
    parts = [
        e.filter(F.col("ts") < F.lit(c1)),
        e.filter((F.col("ts") >= F.lit(c1)) & (F.col("ts") < F.lit(c2))),
        e.filter(F.col("ts") >= F.lit(c2)),
    ]
    staged = str(tmp_path / "staged")
    os.makedirs(staged)
    for i, p in enumerate(parts):
        d = str(tmp_path / f"part{i}")
        p.coalesce(1).write.mode("overwrite").parquet(d)
        (f,) = glob.glob(os.path.join(d, "*.parquet"))
        dst = os.path.join(staged, f"{i}.parquet")
        os.link(f, dst)
        os.utime(dst, (1_000_000 + i, 1_000_000 + i))  # force file order

    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(staged)
    )
    dim_dir = str(tmp_path / "dim")
    q = (
        scd2_stream(stream, dim_dir, **KW)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()

    batch_dirs = sorted(glob.glob(os.path.join(dim_dir, "batch_id=*")))
    assert len(batch_dirs) == 3
    got = current_dimension(spark, dim_dir, key_col="user_id")
    want = scd2_build(e, "user_id", "event_type", "ts", "event_id")
    assert _sorted_rows(got) == _sorted_rows(want)

    # per-batch deltas touch only batch keys (O(batch), not O(dim))
    for i, p in enumerate(parts):
        delta = spark.read.parquet(os.path.join(dim_dir, f"batch_id={i}"))
        batch_keys = {r.user_id for r in p.select("user_id").distinct().collect()}
        delta_keys = {r.user_id for r in delta.select("user_id").distinct().collect()}
        assert delta_keys <= batch_keys


def test_scd2_stream_replay_is_idempotent(spark, tmp_path):
    pin_semantics(spark)
    e = load_table(spark, SF, "events").filter(F.col("user_id") < 20)
    lo, hi = e.agg(F.min("ts"), F.max("ts")).first()
    cut = lo + (hi - lo) / 2
    b0 = e.filter(F.col("ts") < F.lit(cut))
    b1 = e.filter(F.col("ts") >= F.lit(cut))
    dim_dir = str(tmp_path / "dim")
    process_scd2_batch(b0, 0, dim_dir, **KW)
    process_scd2_batch(b1, 1, dim_dir, **KW)
    first = _sorted_rows(
        spark.read.parquet(os.path.join(dim_dir, "batch_id=1"))
    )
    final = _sorted_rows(current_dimension(spark, dim_dir, key_col="user_id"))
    # replay batch 1: reads only strictly-prior partitions, rewrites
    # its own directory byte-identically
    process_scd2_batch(b1, 1, dim_dir, **KW)
    assert (
        _sorted_rows(spark.read.parquet(os.path.join(dim_dir, "batch_id=1")))
        == first
    )
    assert (
        _sorted_rows(current_dimension(spark, dim_dir, key_col="user_id"))
        == final
    )
