"""Unit tests for custom operators on tiny inline frames."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from onechronos_etl_takehome_spark.operators.asof import asof_join
from onechronos_etl_takehome_spark.operators.dedup import (
    dedup_exact,
    deterministic_dedup,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    word_shingles,
)
from onechronos_etl_takehome_spark.operators.multimodal import (
    attach_binary,
    binary_metadata,
    decode_features,
)


def test_deterministic_dedup_stable(spark):
    df = spark.createDataFrame(
        [("k1", "b"), ("k1", "a"), ("k2", "z")], ["k", "v"]
    )
    out = deterministic_dedup(df, ["k"], [F.col("v")]).collect()
    assert sorted((r.k, r.v) for r in out) == [("k1", "a"), ("k2", "z")]


def test_word_shingles_short_text(spark):
    df = spark.createDataFrame([Row(t="a b")]).select(
        word_shingles(F.col("t"), 3).alias("s")
    )
    assert df.collect()[0].s == ["a b"]


def test_ngram_jaccard_identical_docs(spark):
    df = spark.createDataFrame(
        [
            (1, "w1 w2 w3 w4 w5 w6"),
            (2, "w1 w2 w3 w4 w5 w6"),
            (3, "x1 x2 x3 x4 x5 x6"),
        ],
        ["id", "text"],
    )
    pairs = ngram_jaccard_pairs(df, "id", "text", threshold=0.9).collect()
    assert [(r.id_a, r.id_b, r.jaccard) for r in pairs] == [(1, 2, 1.0)]


def test_minhash_finds_exact_dupes(spark):
    df = spark.createDataFrame(
        [
            (1, "w1 w2 w3 w4 w5 w6 w7 w8"),
            (2, "w1 w2 w3 w4 w5 w6 w7 w8"),
            (3, "y1 y2 y3 y4 y5 y6 y7 y8"),
        ],
        ["id", "text"],
    )
    pairs = minhash_dedup_pairs(df, "id", "text", threshold=0.9).collect()
    assert [(r.id_a, r.id_b) for r in pairs] == [(1, 2)]


def test_dedup_exact_counts(spark):
    df = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, "other")], ["id", "text"]
    )
    out = {r.keep_id: r.n_copies for r in dedup_exact(df, "id", "text").collect()}
    assert out == {1: 2, 3: 1}


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10, 10), (1, 5, 5), (2, 99, 99)], ["u", "lid", "ts"]
    ).select("u", "lid", F.timestamp_seconds("ts").alias("ts"))
    right = spark.createDataFrame(
        [(1, 4, 1), (1, 7, 5), (1, 8, 5), (1, 9, 7), (2, 1, 100)],
        ["u", "rid", "ts"],
    ).select("u", F.col("rid"), F.timestamp_seconds("ts").alias("ts"))
    out = asof_join(
        left, right, by=["u"], ts="ts", right_cols=["rid"], tie_breakers=["rid"]
    )
    got = {(r.u, r.lid): r.rid for r in out.collect()}
    # ts=10 → latest right at ts<=10 is rid=9 (ts 7); ts=5 → ties at
    # ts=5 resolve to max rid=8; user 2 has no right row at ts<=99.
    assert got == {(1, 10): 9, (1, 5): 8, (2, 99): None}


def test_frame_sampling_one_to_many(spark):
    from onechronos_etl_takehome_spark.operators.multimodal import sample_frames

    df = spark.createDataFrame(
        [(1, "x" * 200), (2, "y" * 10)], ["doc_id", "text"]
    )
    frames = sample_frames(
        attach_binary(df, "doc_id", "text"), every_n_bytes=64, max_frames=8
    ).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r.id, []).append(r)
    assert len(by_id[1]) == 3  # 200 // 64
    assert len(by_id[2]) == 1  # short payload → one frame
    assert [r.byte_offset for r in sorted(by_id[1], key=lambda r: r.frame_idx)] == [
        0,
        64,
        128,
    ]


def test_multimodal_plumbing(spark):
    df = spark.createDataFrame([(1, "hello"), (2, "world")], ["doc_id", "text"])
    payloads = attach_binary(df, "doc_id", "text")
    meta = {r.id: (r.n_bytes, r.checksum) for r in binary_metadata(payloads).collect()}
    import hashlib

    assert meta[1] == (5, hashlib.md5(b"hello").hexdigest())
    feats = decode_features(payloads, n_features=8).collect()
    assert all(len(r.features) == 8 for r in feats)
    # deterministic across calls
    feats2 = decode_features(payloads, n_features=8).collect()
    assert sorted(map(str, feats)) == sorted(map(str, feats2))
