"""Round-3 additions: cross-engine md5 hashing (d03/d04 oracles),
spread() gating, and bloom single-pass build.

The md5 hex-prefix trick (`conv(substr(md5(x),1,15),16,10)` in Spark ==
`('0x'||substr(md5(x),1,15))::BIGINT` in DuckDB) carries the MinHash and
SimHash oracles, so its equality is pinned here on adversarial inputs —
unicode, emoji, quotes, separators — not just the generated testdata.
"""

from __future__ import annotations

import duckdb
import pandas as pd

from pyspark.sql import functions as F

from onechronos_etl_takehome_spark.operators.dedup import (
    _shingle_hash,
    minhash_dedup_pairs,
    simhash_ce,
)

ADVERSARIAL = [
    "",
    " ",
    "a",
    "hello world",
    "naïve café déjà-vu",
    "日本語のテキストです",
    "emoji 🙂🚀 and ZWJ 👩‍👩‍👧",
    'quotes "double" \'single\' `back`',
    "comma,separated|pipe#hash",
    "back\\slash and\ttab",
    "ĀĒĪŌŪ åäö ß",
    "x" * 500,
    "0x1234 1e999 -0",
    "mixed ASCII и кириллица",
]


def test_md5_hash_family_matches_duckdb(spark):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(ADVERSARIAL)], ["i", "s"]
    )
    got = {
        r.i: [r.h0, r.h7]
        for r in df.select(
            "i",
            _shingle_hash(0, F.col("s"), "md5").alias("h0"),
            _shingle_hash(7, F.col("s"), "md5").alias("h7"),
        ).collect()
    }
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"i": range(len(ADVERSARIAL)), "s": ADVERSARIAL}))
    want = {
        row[0]: [row[1], row[2]]
        for row in con.execute(
            """
            SELECT i,
              -- hash 0 = md5 of salt 0, hex chars 1-15;
              -- hash 7 = md5 of salt 3 (7//2), hex chars 16-30
              ('0x' || substr(md5('0#' || s), 1, 15))::BIGINT,
              ('0x' || substr(md5('3#' || s), 16, 15))::BIGINT
            FROM t
            """
        ).fetchall()
    }
    assert got == want


def test_simhash_ce_matches_duckdb_on_unicode(spark):
    docs = [
        (1, "naïve café déjà vu naïve café"),
        (2, "日本語 テキスト 処理 の 例"),
        (3, "plain english words repeated words words"),
        (4, "🙂 🚀 🙂 emoji heavy doc 🙂"),
    ]
    sdf = simhash_ce(
        spark.createDataFrame(docs, ["doc_id", "text"]), "doc_id", "text"
    )
    got = {r.doc_id: r.simhash for r in sdf.collect()}
    con = duckdb.connect()
    con.register("d", pd.DataFrame(docs, columns=["doc_id", "text"]))
    tallies = ", ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(60)
    )
    assembly = " + ".join(
        f"(CASE WHEN b{b} > 0 THEN (1::BIGINT << {b}) ELSE 0 END)"
        for b in range(60)
    )
    want = dict(
        con.execute(
            f"""
            WITH toks AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM d),
            h AS (SELECT doc_id,
              ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks),
            tal AS (SELECT doc_id, {tallies} FROM h GROUP BY doc_id)
            SELECT doc_id, ({assembly})::BIGINT FROM tal
            """
        ).fetchall()
    )
    assert got == want


def test_minhash_md5_family_deterministic_across_partitionings(spark):
    docs = [(i, f"w{i % 5} common words here w{i % 3} tail") for i in range(40)]
    base = spark.createDataFrame(docs, ["id", "text"])
    a = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_dedup_pairs(
            base, "id", "text", threshold=0.3, hash_family="md5"
        ).collect()
    }
    b = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_dedup_pairs(
            base.repartition(7), "id", "text", threshold=0.3, hash_family="md5"
        ).collect()
    }
    assert a == b and a


def test_bloom_semi_join_single_build_scan(spark):
    """The exact semi join must read the cached key set, not rescan the
    build plan (round-2 verdict item 8)."""
    from onechronos_etl_takehome_spark.operators.bloom import bloom_semi_join

    probe = spark.range(0, 1000).select(F.col("id").alias("k"))
    build = spark.range(0, 100, 7).select(F.col("id").alias("k"))
    out = bloom_semi_join(probe, build, "k", n_bits=1 << 12)
    rows = {r.k for r in out.collect()}
    assert rows == set(range(0, 100, 7))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan or "TableCacheQueryStage" in plan


def test_spread_noop_on_well_partitioned_input(spark):
    from onechronos_etl_takehome_spark.operators.util import spread

    par = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 10_000, numPartitions=par + 4)
    assert spread(wide) is wide
    narrow = spark.range(0, 10_000, numPartitions=1)
    assert spread(narrow).rdd.getNumPartitions() == par
