"""Round-13 operator batch: training-shard materialization.

- **Deterministic training shards** (t27): ``operators/shards.py`` —
  the last mile of a training-data pipeline: seeded global
  pseudo-random order WITHOUT a total sort (hash-sharded, within-shard
  sorted), plus the order-pinning manifest a 100-TB shard job ships
  with its output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..session import pin_semantics
from ..sources.tables import load_table
from .catalog import register

_T27_SEED = 7
_T27_SHARDS = 16

_T27_ORACLE = f"""
    WITH k AS (
      SELECT CAST(doc_id AS BIGINT) AS doc_id,
             ('0x' || substr(
                md5('{_T27_SEED}:' || CAST(doc_id AS VARCHAR)), 1, 15
             ))::BIGINT AS key
      FROM documents),
    s AS (
      SELECT doc_id, key, key % {_T27_SHARDS} AS shard,
             ROW_NUMBER() OVER (
               PARTITION BY key % {_T27_SHARDS} ORDER BY key, doc_id
             ) AS pos
      FROM k)
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(key) AS first_key,
           MAX(key) AS last_key,
           CAST(SUM(pos * (doc_id % 1000003)) AS BIGINT) AS order_checksum
    FROM s GROUP BY shard
"""


@register("t27_training_shards", oracle=_T27_ORACLE)
def t27_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC TRAINING SHARDS (``operators/shards.py``): the
    corpus-to-trainer hand-off. A seeded global ``ORDER BY random()``
    is a total sort — an all-to-all exchange plus a global merge that
    cannot parallelize past the writer count. Training order only
    needs reproducibility and mixing, so: shard by a seeded 60-bit
    md5 of the doc id (ONE ordinary hash exchange), sort WITHIN each
    shard by the same key (N independent, memory-bounded, AQE-sized
    sorts), and any fixed interleave of shards is a reproducible
    permutation. Hash placement is stable, so appending a corpus
    slice reshuffles nothing already written.

    The row returns the shard MANIFEST — per shard: doc count, key
    span, and an order checksum (Σ position·(doc_id mod p) over the
    within-shard order; any transposition changes it) — hash-matched
    against a DuckDB recomputation via the cross-engine md5 60-bit
    key family the MinHash oracle established. The gate additionally
    writes real shard directories at sf0.001 and pins byte determinism
    + order (tests/test_round13_ops.py)."""
    pin_semantics(spark)
    from ..operators.shards import shard_manifest

    docs = load_table(spark, sf_dir, "documents")
    return shard_manifest(
        docs, "doc_id", n_shards=_T27_SHARDS, seed=_T27_SEED
    )
