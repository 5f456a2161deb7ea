"""Streaming segment dedup: an ordered microbatch split of the corpus
must reproduce the batch segment_dedup run exactly; out-of-order
arrival follows the documented first-arrival rule; replay is
idempotent (reads strictly-prior index partitions only)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from onechronos_etl_takehome_spark.operators.text import segment_dedup
from onechronos_etl_takehome_spark.session import pin_semantics
from onechronos_etl_takehome_spark.sources.tables import load_table
from onechronos_etl_takehome_spark.streaming.segment_stream import (
    process_segment_batch,
    segment_stream,
)

SF = "/root/testdata/sf0.001"
KW = dict(id_col="doc_id", text_col="text", seg_tokens=8, max_segs=64)


def _run_batches(spark, batches, tmp_path, start_id=0):
    index_dir = str(tmp_path / "index")
    out_dir = str(tmp_path / "out")
    for i, b in enumerate(batches, start=start_id):
        process_segment_batch(b, i, index_dir, out_dir, **KW)
    return index_dir, out_dir


def test_ordered_split_equals_batch_run(spark, tmp_path):
    pin_semantics(spark)
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    batches = [
        docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        for lo, hi in ((0, 150), (150, 320), (320, 10**9))
    ]
    _, out_dir = _run_batches(spark, batches, tmp_path)
    got = sorted(
        map(tuple, spark.read.parquet(out_dir).drop("batch_id").collect())
    )
    want = sorted(map(tuple, segment_dedup(docs, "doc_id", "text").collect()))
    assert got == want


def test_out_of_order_arrival_is_first_arrival(spark, tmp_path):
    dup = "w1 w2 w3 w4 w5 w6 w7 w8"
    a = spark.createDataFrame([(10, dup)], "doc_id long, text string")
    b = spark.createDataFrame(
        [(3, dup)], "doc_id long, text string"
    )  # lower id arrives LATER
    _, out_dir = _run_batches(spark, [a, b], tmp_path)
    rows = {
        r.doc_id: r for r in spark.read.parquet(out_dir).collect()
    }
    assert rows[10].n_kept == 1  # first arrival keeps the segment
    assert rows[3].n_kept == 0 and rows[3].cleaned_text == ""


def test_replay_is_idempotent(spark, tmp_path):
    pin_semantics(spark)
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    batches = [
        docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        for lo, hi in ((0, 200), (200, 10**9))
    ]
    index_dir, out_dir = _run_batches(spark, batches, tmp_path)
    before = sorted(
        map(tuple, spark.read.parquet(out_dir).collect())
    )
    # replay batch 1: must read only batch_id=0 index partitions and
    # rewrite byte-identical output
    process_segment_batch(batches[1], 1, index_dir, out_dir, **KW)
    after = sorted(map(tuple, spark.read.parquet(out_dir).collect()))
    assert after == before


def test_writestream_wiring(spark, tmp_path):
    pin_semantics(spark)
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    src = str(tmp_path / "staged")
    os.makedirs(src)
    for i, (lo, hi) in enumerate(((0, 250), (250, 10**9))):
        part = str(tmp_path / f"p{i}")
        docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).coalesce(1).write.mode("overwrite").parquet(part)
        (f,) = glob.glob(os.path.join(part, "*.parquet"))
        os.link(f, os.path.join(src, f"{i}.parquet"))
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        segment_stream(
            stream, str(tmp_path / "idx"), str(tmp_path / "out"), **KW
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == docs.count()
    want = sorted(map(tuple, segment_dedup(docs, "doc_id", "text").collect()))
    got = sorted(map(tuple, out.drop("batch_id").collect()))
    assert got == want
