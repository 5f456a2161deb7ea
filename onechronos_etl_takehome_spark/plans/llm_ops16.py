"""Round-14 operator batch: the shard layout's consumer half.

- **Shard replay** (t28): ``operators/shards.py:read_training_shards``
  — the merge-on-read consumer of ``append_training_shards``. Round
  13 shipped the writer (grow a shard layout without touching
  existing files) and DOCUMENTED that a reader recovers the order by
  merging segments; this row is that reader, hash-matched: a layout
  written in two slices (create + append) replays the identical
  (seed, corpus) order a relational recomputation derives over the
  whole corpus.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import pin_semantics
from ..sources.tables import load_table
from .catalog import register

_T28_SEED = 11
_T28_SHARDS = 8

# Same cross-engine 60-bit md5 key family as t27; different seed and
# shard count so the two rows can never mask each other.
_T28_ORACLE = f"""
    WITH k AS (
      SELECT CAST(doc_id AS BIGINT) AS doc_id,
             ('0x' || substr(
                md5('{_T28_SEED}:' || CAST(doc_id AS VARCHAR)), 1, 15
             ))::BIGINT AS key
      FROM documents),
    s AS (
      SELECT doc_id, key, key % {_T28_SHARDS} AS shard,
             ROW_NUMBER() OVER (
               PARTITION BY key % {_T28_SHARDS} ORDER BY key, doc_id
             ) AS pos
      FROM k)
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(key) AS first_key,
           MAX(key) AS last_key,
           CAST(SUM(pos * (doc_id % 1000003)) AS BIGINT) AS order_checksum
    FROM s GROUP BY shard
"""


@register("t28_shard_replay", oracle=_T28_ORACLE)
def t28_shard_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHARD REPLAY (``operators/shards.py:read_training_shards``):
    the consumer half of the training-shard contract. The corpus
    lands in TWO slices — ``write_training_shards`` for docs with
    ``doc_id % 3 != 0``, then ``append_training_shards`` for the rest
    — so every shard directory holds multiple internally sorted
    segment files and none of the first slice's bytes were rewritten
    (the 100-TB growth property). The reader then merges each shard's
    segments with ONE shard-local sort over the STORED shuffle key
    (no seed knowledge, no global sort, no re-hash) and stamps replay
    positions; the row aggregates (count, key span, the
    transposition-sensitive Σ pos·(doc_id mod p) checksum) per shard
    FROM THE REPLAY and hash-matches a DuckDB recomputation over the
    whole corpus — proving a post-append read replays exactly the
    (seed, corpus) order, which is what makes a training run over an
    incrementally grown layout restartable and order-debuggable.

    Scale: the groupBy reuses the replay window's own hash exchange
    on ``_shard`` (one exchange total); reading shard K alone costs
    shard K's bytes — the Hive layout is the prune."""
    import shutil
    import tempfile

    from ..operators.shards import (
        append_training_shards,
        read_training_shards,
        write_training_shards,
    )

    pin_semantics(spark)
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id")
    )
    path = tempfile.mkdtemp(prefix=f"shards_t28_{uuid.uuid4().hex[:8]}_")
    shutil.rmtree(path)  # writer requires a fresh target (mode=error)
    write_training_shards(
        docs.filter(F.col("doc_id") % 3 != 0),
        "doc_id",
        path,
        n_shards=_T28_SHARDS,
        seed=_T28_SEED,
    )
    append_training_shards(
        docs.filter(F.col("doc_id") % 3 == 0),
        "doc_id",
        path,
        n_shards=_T28_SHARDS,
        seed=_T28_SEED,
    )
    replay = read_training_shards(spark, path, "doc_id")
    return (
        replay.select(
            "_shard",
            "_shuffle_key",
            (
                F.col("_pos") * (F.col("doc_id") % 1_000_003)
            ).alias("_ck"),
        )
        .groupBy("_shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("_shuffle_key").alias("first_key"),
            F.max("_shuffle_key").alias("last_key"),
            F.sum("_ck").cast("long").alias("order_checksum"),
        )
        .withColumnRenamed("_shard", "shard")
    )
