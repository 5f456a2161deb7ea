"""Bloom semi-join prefilter: exactness + filter quality."""

from __future__ import annotations

from pyspark.sql import functions as F

from onechronos_etl_takehome_spark.operators.bloom import (
    bloom_bitmap,
    bloom_might_contain,
    bloom_semi_join,
)

from .conftest import SF_SMOKE


def test_no_false_negatives(spark):
    keys = spark.range(0, 5000).select((F.col("id") * 7 + 3).alias("k"))
    bitmap = bloom_bitmap(keys, "k", n_bits=1 << 16, n_hashes=5)
    misses = keys.where(
        ~bloom_might_contain(F.col("k"), bitmap, n_hashes=5)
    ).count()
    assert misses == 0


def test_false_positive_rate_bounded(spark):
    members = spark.range(0, 5000).select(F.col("id").alias("k"))
    bitmap = bloom_bitmap(members, "k", n_bits=1 << 17, n_hashes=5)
    # Disjoint probe universe: ids 10k..30k never inserted.
    probes = spark.range(10_000, 30_000).select(F.col("id").alias("k"))
    fp = probes.where(
        bloom_might_contain(F.col("k"), bitmap, n_hashes=5)
    ).count()
    # Theoretical fp ~0.2% at this sizing; allow generous slack.
    assert fp / 20_000 < 0.02


def test_null_keys_never_pass(spark):
    members = spark.range(0, 100).select(F.col("id").alias("k"))
    bitmap = bloom_bitmap(members, "k", n_bits=1 << 12, n_hashes=4)
    nulls = spark.range(0, 10).select(F.lit(None).cast("long").alias("k"))
    assert (
        nulls.where(bloom_might_contain(F.col("k"), bitmap, n_hashes=4)).count()
        == 0
    )


def test_bloom_semi_join_equals_plain_semi_join(spark):
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    build = (
        spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    via_bloom = bloom_semi_join(
        orders, build, "o_custkey", "c_custkey", n_bits=1 << 16
    )
    plain = orders.join(
        build.withColumnRenamed("c_custkey", "o_custkey"),
        "o_custkey",
        "left_semi",
    )
    assert via_bloom.count() == plain.count()
    assert via_bloom.exceptAll(plain).count() == 0
    assert plain.exceptAll(via_bloom).count() == 0
