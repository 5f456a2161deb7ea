"""Training-shard materialization: deterministic global shuffle into
balanced shards WITHOUT a total sort.

The last mile of a training-data pipeline: after dedup / filtering /
mixing, the corpus must land as N shards whose concatenation visits
documents in a reproducible pseudo-random order (so a training run is
restartable and order-debuggable), with shards balanced enough that
data-parallel readers finish together.

The 100-TB shape of the problem: a seeded global ``ORDER BY random``
is a total sort — one all-to-all exchange PLUS a global merge whose
final stage cannot parallelize beyond the output writer count. But
training order only needs to be (a) deterministic in (seed, corpus)
and (b) well-mixed; it does not need to be one globally sorted
sequence. So shard by a seeded hash (one ordinary hash exchange,
perfectly parallel) and sort only WITHIN each shard by the same hash:
reader r of N streams shard r in hash order — any fixed interleave of
the shards is a reproducible permutation whose mixing quality equals
the hash's. That turns sort-the-world into N independent
memory-bounded sorts that AQE can size, and appending a new corpus
slice re-shuffles nothing already written (hash placement is stable).

Two entry points:
- :func:`assign_shards` — pure Column logic (seeded md5 shuffle key +
  shard id); the cross-engine-hashable core the catalog row oracles.
- :func:`write_training_shards` — lands the corpus as one
  Hive-partitioned directory per shard, rows inside each file in
  shuffle-key order; byte-deterministic for a fixed (seed, corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 60 bits of the md5 hex fit a BIGINT exactly on both engines — the
# same cross-engine hash family the MinHash oracle uses
# (plans/llm_ops.py: Spark conv(substr(md5(..),1,15),16,10) == DuckDB
# ('0x'||substr(md5(..),1,15))::BIGINT).
def _shuffle_key(id_col: str, seed: int):
    return F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col))), 1, 15),
        16,
        10,
    ).cast("long")


def assign_shards(
    df: DataFrame, id_col: str, *, n_shards: int, seed: int = 0
) -> DataFrame:
    """Add ``_shuffle_key`` (seeded 60-bit md5 of the id) and
    ``_shard`` (key mod n_shards) columns. Deterministic in
    (seed, id); changing the seed is a fresh global permutation with
    zero state carried. Pure projection — no shuffle, no UDF."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    key = _shuffle_key(id_col, seed)
    return df.withColumns(
        {
            "_shuffle_key": key,
            "_shard": (key % n_shards).cast("long"),
        }
    )


def write_training_shards(
    df: DataFrame,
    id_col: str,
    path: str,
    *,
    n_shards: int,
    seed: int = 0,
) -> None:
    """Materialize ``df`` as ``path/_shard=K/`` parquet, rows inside
    each shard in shuffle-key order. One hash exchange on ``_shard``
    (never a global sort); each task sorts only its shards
    (spill-safe, AQE-sizable), and ``partitionBy`` routes every shard
    to its own directory, preserving the within-shard order into the
    file bytes. A reader streaming shard K in file order replays the
    exact (seed, corpus)-deterministic sequence."""
    out = assign_shards(df, id_col, n_shards=n_shards, seed=seed)
    (
        out.repartition(n_shards, "_shard")
        .sortWithinPartitions("_shard", "_shuffle_key", id_col)
        .write.partitionBy("_shard")
        .mode("error")
        .parquet(path)
    )


def append_training_shards(
    df: DataFrame,
    id_col: str,
    path: str,
    *,
    n_shards: int,
    seed: int = 0,
) -> None:
    """Append a corpus slice into an existing shard layout WITHOUT
    touching what's already written: hash placement is stable in
    (seed, id), so each shard directory gains one new internally
    sorted segment file and every existing file stays byte-identical
    — the incremental property that makes the layout cheap to grow
    at 100 TB (a daily slice writes slice-sized bytes, never
    corpus-sized). A shard then holds a LIST of sorted segments;
    :func:`read_training_shards` recovers the full within-shard
    shuffle-key order by merging them (one shard-local sort —
    segment-bounded, spill-safe). tests/test_round13_ops.py pins
    incremental == full rebuild (same multiset per shard, same merged
    order, old files untouched) — the x27 SCD2 witness shape."""
    out = assign_shards(df, id_col, n_shards=n_shards, seed=seed)
    (
        out.repartition(n_shards, "_shard")
        .sortWithinPartitions("_shard", "_shuffle_key", id_col)
        .write.partitionBy("_shard")
        .mode("append")
        .parquet(path)
    )


def read_training_shards(
    spark, path: str, id_col: str, *, n_shards: int | None = None
) -> DataFrame:
    """Merge-on-read CONSUMER of a shard layout — the other half of
    :func:`append_training_shards`'s contract: after appends, a shard
    directory holds a LIST of internally sorted segment files, and
    the reader recovers the full within-shard shuffle-key order by
    merging them. Returns every row with ``(_shard, _pos)`` — the
    1-based replay position inside its shard — so any consumer
    (or test) can verify it is visiting the exact (seed, corpus)
    order the layout pinned at write time.

    Plan shape: ONE hash exchange on ``_shard`` (shard-local data
    only — segment-bounded, spill-safe, AQE-sizable) and one
    within-shard sort over the stored ``_shuffle_key`` — never a
    global sort, and no re-hashing: the key column rides the files,
    so replay needs zero knowledge of the seed. Reading shard K alone
    (``path/_shard=K``) costs only shard K's bytes — the Hive layout
    is the prune.

    The ``n_shards`` parameter is accepted for symmetry with the
    writers but unused: the window's own hash exchange on ``_shard``
    already routes each shard's segments to one task — adding an
    explicit ``repartition`` would just pay the same exchange twice
    (the shard_manifest lesson: reuse the window's exchange)."""
    del n_shards
    df = spark.read.parquet(path)
    from pyspark.sql import Window

    w = Window.partitionBy("_shard").orderBy("_shuffle_key", id_col)
    return df.withColumns(
        {
            "_shard": F.col("_shard").cast("long"),
            "_pos": F.row_number().over(w).cast("long"),
        }
    )


def read_training_shards_epoch(
    spark, path: str, id_col: str, *, epoch: int = 0
) -> DataFrame:
    """EPOCH RESHUFFLE with zero data movement: replay the same shard
    layout in a fresh pseudo-random order per training epoch. Every
    multi-epoch run wants a different visit order each epoch, but
    re-running the global shuffle (or rewriting the layout) per epoch
    is corpus-sized I/O for what is purely an ORDER change. Shard
    membership is hash-stable, so epoch e only re-sorts WITHIN each
    shard by a fresh deterministic key — ``md5("e{epoch}:" + id)``,
    the same cross-engine 60-bit family as the layout key — while the
    files on disk stay byte-identical across every epoch. Cost per
    epoch: one hash exchange + N shard-local sorts (the exact
    read_training_shards plan), bytes read = corpus, bytes written =
    zero.

    ``epoch=0`` replays the layout's own pinned order (the stored
    ``_shuffle_key`` — :func:`read_training_shards` semantics);
    ``epoch>=1`` derives the fresh key at read time, needing no
    knowledge of the writer's seed. Returns rows with ``(_shard,
    _epoch_key, _pos)``."""
    df = spark.read.parquet(path)
    if epoch == 0:
        key = F.col("_shuffle_key")
    else:
        key = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.lit(f"e{epoch}"), F.col(id_col)
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
    from pyspark.sql import Window

    w = Window.partitionBy("_shard").orderBy(key, id_col)
    return df.withColumns(
        {
            "_shard": F.col("_shard").cast("long"),
            "_epoch_key": key,
            "_pos": F.row_number().over(w).cast("long"),
        }
    )


def shard_manifest(
    df: DataFrame, id_col: str, *, n_shards: int, seed: int = 0
) -> DataFrame:
    """Per-shard summary that PINS both membership and ORDER:
    (shard, n_docs, key span, and an order checksum —
    Σ position·(id mod p) over the within-shard shuffle-key order, so
    any transposition of two documents changes it). This is the
    verifiable receipt a 100-TB shard job ships with its output; the
    t27 catalog row hash-matches it against a relational
    recomputation."""
    from pyspark.sql import Window

    out = assign_shards(df, id_col, n_shards=n_shards, seed=seed)
    w = Window.partitionBy("_shard").orderBy("_shuffle_key", id_col)
    pos = F.row_number().over(w).cast("long")
    return (
        out.select(
            "_shard",
            "_shuffle_key",
            (pos * (F.col(id_col).cast("long") % 1_000_003)).alias("_ck"),
        )
        # group on the window's own partition key so the aggregation
        # REUSES its exchange (alias after the agg — aliasing inside
        # groupBy defeated Spark's alias-aware partitioning and paid
        # a second shuffle); verified single-Exchange in the gate
        .groupBy("_shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("_shuffle_key").alias("first_key"),
            F.max("_shuffle_key").alias("last_key"),
            F.sum("_ck").cast("long").alias("order_checksum"),
        )
        .withColumnRenamed("_shard", "shard")
    )
