"""JSONL ingestion: schema-first permissive reads, corrupt-line
quarantine, write round-trip, and the corpus decontamination stage."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from onechronos_etl_takehome_spark.pipeline.corpus import (
    prepare_corpus,
    remove_contaminated,
)
from onechronos_etl_takehome_spark.sources.jsonl import (
    read_jsonl,
    split_corrupt,
    write_jsonl,
)

SCHEMA = "doc_id LONG, text STRING, lang STRING"
SF_DIR = "/root/testdata/sf0.001"


def _write_fixture(path: str) -> tuple[int, int]:
    good, bad = 0, 0
    with open(path, "w") as f:
        for i in range(20):
            f.write(
                json.dumps({"doc_id": i, "text": f"doc {i} text", "lang": "en"})
                + "\n"
            )
            good += 1
        f.write('{"doc_id": 20, "text": "truncated\n')  # unterminated string
        f.write("not json at all\n")
        bad += 2
    return good, bad


def test_read_jsonl_quarantines_corrupt_lines(spark, tmp_path):
    src = str(tmp_path / "drop.jsonl")
    n_good, n_bad = _write_fixture(src)
    df = read_jsonl(spark, src, SCHEMA)
    good, bad = split_corrupt(df)
    assert good.count() == n_good
    assert bad.count() == n_bad
    # Quarantine preserves the raw line for forensics.
    raws = {r[0] for r in bad.collect()}
    assert "not json at all" in raws
    # Good rows parse into typed columns.
    assert dict(good.dtypes)["doc_id"] == "bigint"
    assert good.filter(F.col("doc_id") == 0).count() == 1


def test_jsonl_round_trip(spark, tmp_path):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text", "lang"
    )
    out = str(tmp_path / "out_jsonl")
    write_jsonl(docs, out)
    back, bad = split_corrupt(read_jsonl(spark, out, SCHEMA))
    assert bad.count() == 0
    assert back.count() == docs.count()
    assert back.exceptAll(docs).count() == 0


def test_streaming_jsonl_quarantine(spark, tmp_path):
    from onechronos_etl_takehome_spark.sources.jsonl import (
        read_jsonl_stream,
        write_stream_quarantined,
    )

    drop = tmp_path / "drop"
    drop.mkdir()
    n_good, n_bad = _write_fixture(str(drop / "a.jsonl"))
    with open(drop / "b.jsonl", "w") as f:
        f.write(json.dumps({"doc_id": 99, "text": "late file", "lang": "en"}) + "\n")
        f.write("}{ broken\n")

    stream = read_jsonl_stream(spark, str(drop), SCHEMA, max_files_per_trigger=1)
    q = write_stream_quarantined(
        stream,
        str(tmp_path / "good"),
        str(tmp_path / "bad"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    good = spark.read.parquet(str(tmp_path / "good"))
    bad = spark.read.parquet(str(tmp_path / "bad"))
    assert good.count() == n_good + 1
    assert bad.count() == n_bad + 1
    # Two files → two microbatches under maxFilesPerTrigger=1.
    assert good.select("batch_id").distinct().count() == 2
    assert good.filter(F.col("doc_id") == 99).count() == 1


def test_corpus_decontamination_stage(spark, tmp_path):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    bench = docs.filter(F.col("doc_id") % 20 == 0).select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 20 != 0)

    # An exact benchmark copy must always be dropped.
    copy = bench.limit(1).select(
        (F.col("doc_id") + 500000).alias("doc_id"),
        "text",
        F.lit("en").alias("lang"),
        F.lit("srcX").alias("source"),
        F.length("text").alias("n_chars"),
    )
    kept = remove_contaminated(
        corpus.unionByName(copy), bench, max_contamination=0.99
    )
    assert kept.filter(F.col("doc_id") == 500000).count() == 0
    # With an impossible threshold nothing is dropped (> 1.0 unreachable).
    assert (
        remove_contaminated(corpus, bench, max_contamination=1.01).count()
        == corpus.count()
    )

    # End-to-end: the pipeline accepts a benchmark and its survivor
    # count never exceeds the undecontaminated run.
    with_bench = prepare_corpus(
        corpus,
        str(tmp_path / "c1"),
        benchmark=bench,
        max_contamination=0.5,
        use_lsh=False,
    )
    without = prepare_corpus(corpus, str(tmp_path / "c2"), use_lsh=False)
    assert with_bench["after_dedup"] <= without["after_dedup"]
    assert with_bench["docs_in"] == without["docs_in"]
