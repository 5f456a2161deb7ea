"""Similarity search over embedding columns (array<float>).

Two tiers, mirroring the dedup ladder:

- ``cosine_topk_bruteforce`` — exact top-k, O(|Q|·|C|): the correctness
  baseline. Arithmetic is sequential-double on both Spark and the
  DuckDB oracle (F.aggregate / list_reduce), so scores are
  bitwise-comparable cross-engine.
- ``cosine_topk_lsh`` — random-hyperplane (sign) LSH bucketing: the
  scale path. Deterministic hyperplanes from a seeded numpy
  RandomState, shipped as literal arrays (no UDF for bucketing);
  candidates are exact-reranked per bucket.

At 100 TB you'd first shard the corpus by bucket (partition pruning on
the bucket column), broadcast the (small) query set, and rerank inside
each shard — exactly what the LSH variant's plan does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    """Sequential-double dot product (cross-engine deterministic)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _sq_norm(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (F.sqrt(_sq_norm(a)) * F.sqrt(_sq_norm(b)))


def cosine_topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    k: int = 5,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    corpus_id: str = "corpus_id",
    corpus_vec: str = "corpus_vec",
) -> DataFrame:
    """Exact cosine top-k: (query_id, corpus_id, score, rank).

    The query side is broadcast (query sets are driver-small by
    construction); the corpus streams — one pass, no shuffle besides
    the final per-query top-k, which TakeOrdered keeps tiny.
    """
    joined = corpus.join(
        F.broadcast(queries), F.col(query_id) != F.col(corpus_id)
    )
    scored = joined.select(
        query_id,
        corpus_id,
        cosine(F.col(query_vec), F.col(corpus_vec)).alias("score"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("score").desc(), F.col(corpus_id)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def signed_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id (one bit per plane)."""
    bits = [
        F.when(_dot(vec, F.array(*[F.lit(float(v)) for v in plane])) >= 0, 1 << i).otherwise(0)
        for i, plane in enumerate(planes)
    ]
    out = F.lit(0)
    for b in bits:
        out = out + b
    return out.cast("long")


def cosine_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    seed: int = 42,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    corpus_id: str = "corpus_id",
    corpus_vec: str = "corpus_vec",
) -> DataFrame:
    """Approximate cosine top-k: candidates share an LSH bucket, then
    exact rerank. Recall < 1 by design — benchmark against bruteforce."""
    planes = _hyperplanes(dim, n_planes, seed)
    qb = queries.withColumn("_bucket", signed_bucket(F.col(query_vec), planes))
    cb = corpus.withColumn("_bucket", signed_bucket(F.col(corpus_vec), planes))
    joined = cb.join(F.broadcast(qb), ["_bucket"]).filter(
        F.col(query_id) != F.col(corpus_id)
    )
    scored = joined.select(
        query_id,
        corpus_id,
        cosine(F.col(query_vec), F.col(corpus_vec)).alias("score"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("score").desc(), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )
