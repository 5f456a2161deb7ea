"""Streaming incremental dedup: any microbatch split of a corpus must
yield exactly the candidate pairs a from-scratch batch run finds.

The corpus is staged as 3 parquet files → 3 microbatches
(maxFilesPerTrigger=1, availableNow); each batch probes the index built
from prior batches and then extends it. Batch-local outputs must be
disjoint contributions whose union equals minhash_lsh_candidates over
the whole corpus (no cap — caps are bucket-size dependent and
therefore split-dependent by design).
"""

from __future__ import annotations

import glob
import os

from onechronos_etl_takehome_spark.operators.dedup import minhash_lsh_candidates
from onechronos_etl_takehome_spark.session import pin_semantics
from onechronos_etl_takehome_spark.sources.tables import load_table
from onechronos_etl_takehome_spark.streaming.dedup_stream import dedup_stream

SF = "/root/testdata/sf0.001"
KW = dict(n=3, num_hashes=16, bands=4, hash_family="xxhash64")


def test_dedup_stream_matches_batch_run(spark, tmp_path):
    pin_semantics(spark)
    docs = load_table(spark, SF, "documents")

    src = str(tmp_path / "src")
    for i in range(3):
        docs.filter(f"doc_id % 3 = {i}").coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(src, f"part{i}"))
    # flatten: the file source wants one directory of files
    staged = str(tmp_path / "staged")
    os.makedirs(staged)
    for i, f in enumerate(
        sorted(glob.glob(os.path.join(src, "part*", "*.parquet")))
    ):
        os.link(f, os.path.join(staged, f"{i}.parquet"))

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
    )
    index_dir = str(tmp_path / "index")
    out_dir = str(tmp_path / "cands")
    q = (
        dedup_stream(stream, index_dir, out_dir, **KW)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()

    batch_dirs = sorted(glob.glob(os.path.join(out_dir, "batch_id=*")))
    assert len(batch_dirs) == 3
    per_batch = [
        {(r.id_a, r.id_b) for r in spark.read.parquet(d).collect()}
        for d in batch_dirs
    ]
    # each batch contributes NEW pairs only (no recomputed overlaps)
    for i in range(3):
        for j in range(i + 1, 3):
            assert not (per_batch[i] & per_batch[j])

    got = set().union(*per_batch)
    want = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_candidates(docs, "doc_id", "text", **KW).collect()
    }
    assert got == want and want, "streamed pairs != batch pairs (or vacuous)"

    # the index now covers the whole corpus: one more increment of
    # already-indexed docs must produce no NEW cross pairs beyond the
    # known ones (sanity of the index contents)
    idx = spark.read.parquet(index_dir)
    assert idx.select("doc_id").distinct().count() == docs.count()


def test_replay_is_idempotent_under_bucket_cap(spark, tmp_path):
    """A replayed batch must reproduce EXACTLY its first-attempt
    candidates even with max_bucket_size set: the probe reads only
    strictly-prior index partitions, so the replay never counts its
    own half-written buckets against the cap. (Without that filter,
    docs sharing a bucket double-count on replay, the bucket crosses
    the cap, and previously-emitted pairs vanish.)"""
    from onechronos_etl_takehome_spark.streaming.dedup_stream import (
        process_dedup_batch,
    )

    pin_semantics(spark)
    docs = load_table(spark, SF, "documents")
    b0 = docs.filter("doc_id % 2 = 0")
    b1 = docs.filter("doc_id % 2 = 1")
    index_dir = str(tmp_path / "index")
    out_dir = str(tmp_path / "cands")
    # tight cap so replay double-counting WOULD flip bucket survival
    kw = dict(id_col="doc_id", text_col="text", max_bucket_size=4, **KW)

    process_dedup_batch(b0, 0, index_dir, out_dir, **kw)
    process_dedup_batch(b1, 1, index_dir, out_dir, **kw)
    first = {
        (r.id_a, r.id_b)
        for r in spark.read.parquet(out_dir + "/batch_id=1").collect()
    }
    assert first, "vacuous: batch 1 produced no candidates"

    # replay batch 1 (crash-after-index-write scenario: index already
    # contains batch 1's own buckets)
    process_dedup_batch(b1, 1, index_dir, out_dir, **kw)
    replay = {
        (r.id_a, r.id_b)
        for r in spark.read.parquet(out_dir + "/batch_id=1").collect()
    }
    assert replay == first
