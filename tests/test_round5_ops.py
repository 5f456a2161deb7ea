"""Round-5 regression tests: NULL-handling hardening from the round-4
advice (classifier features, BPE stats, s06 degenerate vectors)."""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from onechronos_etl_takehome_spark.plans import ORACLES, QUERIES

SF = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def test_featurize_null_text_yields_zero_features(spark):
    """NULL text must featurize to all-0.0, not (-1)/(-1)=1.0 ratios
    (legacy sizeOfNull makes size(split(NULL)) = -1)."""
    from onechronos_etl_takehome_spark.operators.classifier import (
        FEATURE_COLS,
        featurize,
    )

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "two words")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in featurize(df, "text").collect()}
    for c in FEATURE_COLS:
        assert rows[1][c] == 0.0, f"NULL text: {c} = {rows[1][c]}"
    # a real doc keeps real (nonzero where applicable) features
    assert rows[3]["f_lex_diversity"] == 1.0
    assert rows[3]["f_mean_word_len"] == pytest.approx(4.0)


def test_featurize_unchanged_for_real_text(spark):
    """The denominator guard must be a no-op for non-NULL text —
    trained t20 weights depend on it."""
    from onechronos_etl_takehome_spark.operators.classifier import (
        FEATURE_COLS,
        featurize,
    )
    from onechronos_etl_takehome_spark.operators import text as tx
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF}/documents.parquet").where(
        F.col("text").isNotNull()
    )
    got = featurize(docs, "text")
    # legacy formulas (pre-guard), valid whenever text is non-NULL
    legacy = (
        docs.withColumn(
            "f_log_chars", F.log1p(F.length("text").cast("double"))
        )
        .withColumn(
            "f_mean_word_len",
            F.coalesce(tx.avg_token_len(F.col("text")), F.lit(0.0)),
        )
        .withColumn(
            "f_lex_diversity",
            F.coalesce(tx.lexical_diversity(F.col("text")), F.lit(0.0)),
        )
    )
    a = {
        r.doc_id: r
        for r in got.select("doc_id", *FEATURE_COLS[:3]).collect()
    }
    b = {
        r.doc_id: r
        for r in legacy.select("doc_id", *FEATURE_COLS[:3]).collect()
    }
    assert a.keys() == b.keys()
    for k in a:
        for c in FEATURE_COLS[:3]:
            assert a[k][c] == b[k][c], (k, c)


def test_bpe_stats_null_and_empty_text(spark):
    from onechronos_etl_takehome_spark.operators.bpe import (
        bpe_token_stats,
        train_bpe,
    )

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "hello world hello")],
        "doc_id long, text string",
    )
    merges = train_bpe(df, "text", n_merges=5)
    rows = {
        r.doc_id: r
        for r in bpe_token_stats(df, "doc_id", "text", merges).collect()
    }
    for did in (1, 2):
        assert rows[did].n_words == 0
        assert rows[did].n_bpe_tokens == 0
        assert rows[did].n_chars == 0
        assert rows[did].chars_per_token == 0.0
    assert rows[3].n_words == 3
    assert rows[3].n_bpe_tokens > 0


def test_s06_drops_degenerate_vectors_cross_engine(spark, tmp_path):
    """NULL/empty embeddings must vanish identically in Spark and the
    DuckDB oracle (the oracle's unnest emits nothing for them)."""
    src = pq.read_table(f"{SF}/embeddings.parquet").slice(0, 20)
    # two degenerate rows with the same schema: NULL embedding, [] embedding
    cols = {}
    for field in src.schema:
        if field.name == "vec_id":
            cols[field.name] = pa.array([999_991, 999_992], type=field.type)
        elif field.name == "embedding":
            cols[field.name] = pa.array([None, []], type=field.type)
        else:
            cols[field.name] = pa.nulls(2, type=field.type)
    degenerate = pa.table(cols).select(src.schema.names)
    mixed = pa.concat_tables(
        [src, degenerate.cast(src.schema.remove_metadata())],
        promote_options="none",
    )
    out_dir = tmp_path / "sf"
    out_dir.mkdir()
    pq.write_table(mixed, str(out_dir / "embeddings.parquet"))

    sdf = QUERIES["s06_quantize_embeddings"](spark, str(out_dir))
    got_ids = {r.vec_id for r in sdf.select("vec_id").collect()}
    assert 999_991 not in got_ids and 999_992 not in got_ids
    assert len(got_ids) == 20

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{out_dir}/embeddings.parquet'"
    )
    from tests.oracle_harness import compare

    report = compare(sdf, con, ORACLES["s06_quantize_embeddings"])
    assert report["errors"] == [], report["errors"]
