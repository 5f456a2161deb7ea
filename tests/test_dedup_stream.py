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
