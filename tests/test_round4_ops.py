"""Round-4 additions: salted skew join equivalence and the byte-aware
spread gate.

salted_join's contract is exact result equality with the plain join —
salting must be invisible (each left row carries exactly one salt,
each right row exists under every salt). Pinned here for inner and
left joins, duplicate keys on both sides, unmatched rows, and NULL
keys (which match in neither form).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from onechronos_etl_takehome_spark.operators.skew import salted_join
from onechronos_etl_takehome_spark.operators.util import spread


def _rows(df, cols):
    rows = [tuple(r[c] for c in cols) for r in df.collect()]
    return sorted(rows, key=lambda t: tuple((v is None, v) for v in t))


def _fixture(spark):
    # hot key 1 (power-law), duplicates on both sides, an unmatched
    # left key (99), an unmatched right key (7), and NULL keys on both
    left = spark.createDataFrame(
        [(1, i) for i in range(200)]
        + [(2, 1000), (2, 1001), (3, 2000), (99, 3000), (None, 4000)],
        "k int, lv int",
    )
    right = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d"), (7, "e"), (None, "f")],
        "k int, rv string",
    )
    return left, right


def test_salted_inner_matches_plain(spark):
    left, right = _fixture(spark)
    plain = left.join(right, ["k"], "inner")
    salted = salted_join(left, right, ["k"], how="inner", salt_buckets=8)
    assert sorted(salted.columns) == sorted(plain.columns)
    cols = plain.columns
    assert _rows(salted, cols) == _rows(plain, cols)


def test_salted_left_matches_plain(spark):
    left, right = _fixture(spark)
    plain = left.join(right, ["k"], "left")
    salted = salted_join(left, right, ["k"], how="left", salt_buckets=8)
    cols = plain.columns
    assert _rows(salted, cols) == _rows(plain, cols)


def test_salted_join_shuffles_not_broadcasts(spark):
    # The replicated dim must NOT be broadcast: a broadcast join makes
    # the salt spray a no-op (no shuffle on (key, salt) ever happens),
    # silently degrading to an R×-inflated broadcast build.
    left, right = _fixture(spark)
    plan = salted_join(left, right, ["k"])._jdf.queryExecution().toString()
    assert "BroadcastHashJoin" not in plan


def test_spread_bytes_cap_noop_on_small_scan(spark, tmp_path):
    # A scan far under bytes_per_split must come back untouched (no
    # repartition shuffle added for batch-amortized stages).
    p = str(tmp_path / "tiny.parquet")
    spark.range(100).write.parquet(p)
    df = spark.read.parquet(p)
    out = spread(df, bytes_per_split=8 << 20)
    assert out is df
    # the default (CPU-heavy) form still fans out to every core
    fanned = spread(df)
    assert fanned.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
