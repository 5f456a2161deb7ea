"""End-to-end corpus preparation: counts reconcile, survivors contain
no remaining near-dup pairs, splits are disjoint+complete+stable."""

from __future__ import annotations

from pyspark.sql import functions as F

from onechronos_etl_takehome_spark.operators.dedup import ngram_jaccard_pairs
from onechronos_etl_takehome_spark.pipeline.corpus import hash_split, prepare_corpus
from onechronos_etl_takehome_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_prepare_corpus_end_to_end(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    out_dir = str(tmp_path / "corpus")
    metrics = prepare_corpus(docs, out_dir, use_lsh=True)

    assert metrics["docs_in"] == docs.count()
    assert metrics["after_quality"] <= metrics["docs_in"]
    assert metrics["after_dedup"] <= metrics["after_quality"]
    assert metrics["after_dedup"] == sum(
        v for k, v in metrics.items() if k.startswith("split_")
    )

    back = spark.read.parquet(out_dir)
    assert back.count() == metrics["after_dedup"]
    assert set(back.select("split").distinct().toPandas()["split"]) <= {
        "train",
        "val",
        "test",
    }

    # no near-duplicate pair survives among the survivors
    leftover = ngram_jaccard_pairs(
        back.select("doc_id", "text"), "doc_id", "text", threshold=0.5
    ).count()
    assert leftover == 0


def test_hash_split_stable_and_disjoint(spark):
    docs = load_table(spark, SF, "documents").select("doc_id")
    a = {r.doc_id: r.split for r in hash_split(docs).collect()}
    b = {r.doc_id: r.split for r in hash_split(docs.repartition(7)).collect()}
    assert a == b  # partitioning-independent membership
    assert set(a.values()) == {"train", "val", "test"}
