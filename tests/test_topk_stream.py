"""Streaming heavy hitters (topk_stream): with enough counters the
streamed MG summary must equal the exact per-value counts after the
last batch, and with a tight counter budget the final candidate set
must still cover every true heavy hitter (the MG guarantee), across a
multi-batch split with state carried between batches."""

from __future__ import annotations

import glob
import os

from onechronos_etl_takehome_spark.session import pin_semantics
from onechronos_etl_takehome_spark.streaming.topk_stream import (
    heavy_hitter_stream,
)


def _tokens(spark):
    # zipf-ish: tok0 ×400, tok1 ×200, ..., plus a 100-token long tail
    rows = []
    i = 0
    for t, cnt in [("tok0", 400), ("tok1", 200), ("tok2", 100), ("tok3", 50)]:
        for _ in range(cnt):
            rows.append((i, t))
            i += 1
    for j in range(100):
        rows.append((i + j, f"tail{j}"))
    return spark.createDataFrame(rows, "id long, token string")


def _run_stream(spark, df, tmp_path, name, **kw):
    src = str(tmp_path / f"src_{name}")
    os.makedirs(src)
    # three microbatches, interleaved ids so every batch mixes head and
    # tail tokens
    for b in range(3):
        df.filter(f"id % 3 = {b}").coalesce(1).write.parquet(src + f"/b{b}")
    staged = str(tmp_path / f"staged_{name}")
    os.makedirs(staged)
    files = [f for b in range(3)
             for f in sorted(glob.glob(src + f"/b{b}/*.parquet"))]
    for i, f in enumerate(files):
        os.link(f, os.path.join(staged, f"{i}.parquet"))
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
    )
    q = (
        heavy_hitter_stream(stream, "token", **kw)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    latest_n = {}
    for r in rows:
        latest_n[r.shard] = max(latest_n.get(r.shard, 0), r.n_shard)
    return {
        r.value: r.est_count
        for r in rows
        if r.n_shard == latest_n[r.shard]
    }


def test_stream_counters_exact_when_unpruned(spark, tmp_path):
    pin_semantics(spark)
    df = _tokens(spark)
    exact = {r.token: r.cnt for r in
             df.groupBy("token").count().withColumnRenamed("count", "cnt").collect()}
    got = _run_stream(spark, df, tmp_path, "hh_exact", k_counters=500)
    assert got == exact


def test_stream_candidates_cover_heavy_hitters(spark, tmp_path):
    pin_semantics(spark)
    df = _tokens(spark)
    n = df.count()
    k = 9
    got = _run_stream(spark, df, tmp_path, "hh_tight", k_counters=k,
                      n_shards=2)
    exact = {r.token: r.cnt for r in
             df.groupBy("token").count().withColumnRenamed("count", "cnt").collect()}
    heavy = {t for t, c in exact.items() if c > n / (k + 1)}
    assert heavy, "vacuous: no heavy hitters at this threshold"
    assert heavy <= set(got)
    # MG counter is a lower bound within n/(k+1) of the true count
    for t in heavy:
        assert got[t] <= exact[t] <= got[t] + n // (k + 1)
