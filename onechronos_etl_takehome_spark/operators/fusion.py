"""Rank fusion for hybrid retrieval.

Reciprocal-rank fusion (RRF, Cormack/Clarke/Buettcher 2009): combine
the top-N shortlists of heterogeneous retrievers (dense ANN, sparse
BM25, ...) into one ranking using only each list's RANKS — no score
calibration across retrievers, which is exactly why production hybrid
search (OpenSearch/Vespa/Azure AI Search all ship it) uses it.

Cross-engine exactness: the classical fused score Σ 1/(k + rank) is a
sum of rationals; evaluated as floating point its value depends on
nothing here (two terms, exact operands) but we keep the catalog's
integer-only discipline anyway and fuse on
``Σ (SCALE div (k + rank))`` with ``SCALE = 10^12`` — pure BIGINT
arithmetic in both engines (Spark ``div``, DuckDB ``//``), so the
fused ordering hash-matches any SQL oracle bit-for-bit. With k = 60
and top-1000 lists the per-list contribution is ≤ 10^12/61 ≈ 1.6e10;
hundreds of lists still fit a BIGINT with 10^8 headroom.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_SCALE = 10**12


def rrf_fuse(
    ranked: list[tuple[str, DataFrame]],
    *,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    query_cols: list[str] | None = None,
    k: int = 60,
    topk: int = 15,
) -> DataFrame:
    """Fuse named ranked shortlists into one RRF ranking.

    ``ranked`` is ``[(name, df), ...]`` where each frame carries
    ``id_col`` and an integer ``rank_col`` (1-based, from that
    retriever). Output: one row per doc appearing in ANY list, with a
    nullable ``<name>_rank`` per retriever, the integer ``rrf_score``
    ``Σ (10^12 div (k + rank))`` (absent list → contributes 0), and
    the fused 1-based ``rank`` (ties broken on doc id), truncated to
    ``topk``. ``query_cols`` makes the fusion per-query: lists join on
    ``query_cols + [id_col]`` and the fused ranking windows per query.

    Scale posture: the inputs are top-N shortlists — each retriever
    already reduced the corpus to N rows (per query), so the fusion
    joins and the final ranking window run on N·retrievers rows (per
    query), never on corpus-sized data; with ``query_cols`` the window
    partitions by query, so fusing a million queries is
    embarrassingly parallel. The heavy lifting stays in the upstream
    retrievers (s01-s05 ANN, t16 BM25), which carry their own 100-TB
    postures.
    """
    if not ranked:
        raise ValueError("rrf_fuse needs at least one ranked list")
    names = [name for name, _ in ranked]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate retriever names: {names}")
    qcols = list(query_cols or [])
    keys = qcols + ["_id"]
    frames = [
        df.select(
            *qcols,
            F.col(id_col).alias("_id"),
            F.col(rank_col).cast("long").alias(f"{name}_rank"),
        )
        for name, df in ranked
    ]
    joined = reduce(lambda a, b: a.join(b, on=keys, how="full_outer"), frames)
    contribs = [
        F.coalesce(
            F.expr(f"{_SCALE} div ({k} + {name}_rank)"), F.lit(0).cast("long")
        )
        for name, _ in ranked
    ]
    scored = joined.withColumn(
        "rrf_score", reduce(lambda a, b: a + b, contribs).cast("long")
    )
    w = Window.partitionBy(*qcols).orderBy(
        F.col("rrf_score").desc(), F.col("_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= topk)
        .withColumnRenamed("_id", id_col)
    )


def mmr_rerank(
    shortlist: DataFrame,
    *,
    query_col: str = "query_id",
    id_col: str = "corpus_id",
    score_col: str = "score",
    vec_col: str = "corpus_vec",
    k: int = 10,
    lam: float = 0.7,
) -> DataFrame:
    """Maximal-marginal-relevance re-rank (Carbonell/Goldstein 1998):
    greedily pick ``k`` items per query maximizing
    ``lam·relevance − (1−lam)·max_cosine_to_already_selected`` —
    the standard diversity pass between retrieval and a context
    window / labeling budget.

    ``shortlist`` carries one row per (query, candidate) with the
    candidate's relevance score and embedding — the output of any
    top-N retriever (s01-s05), so per-query groups are shortlist-sized
    BY CONSTRUCTION (N ≈ 10-1000). The greedy loop is inherently
    sequential per query, so it runs as one Arrow-batched
    ``applyInPandas`` over query groups: O(k·N) dot products per query
    on a dense numpy matrix, parallel across queries — the per-query
    work is constant, the query set is what scales.

    Determinism: candidates are pre-sorted by (−relevance, id); ties
    in the greedy argmax resolve to the earlier row, so output is a
    pure function of the input set (rows-only driver check; pinned by
    the brute-force replay in tests).
    """
    import numpy as np
    import pandas as pd

    out_schema = (
        f"{query_col} long, rank long, {id_col} long, "
        "relevance double, mmr_score double"
    )

    def per_query(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            [score_col, id_col], ascending=[False, True]
        ).reset_index(drop=True)
        vecs = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0.0] = 1.0
        unit = vecs / norms[:, None]
        rel = pdf[score_col].to_numpy(dtype=np.float64)
        n = len(pdf)
        take = min(k, n)
        selected: list[int] = []
        max_sim = np.full(n, -np.inf)
        picked_score: list[float] = []
        for _ in range(take):
            if selected:
                cand = lam * rel - (1.0 - lam) * max_sim
            else:
                cand = lam * rel  # no diversity term for the first pick
            cand[selected] = -np.inf
            i = int(np.argmax(cand))  # first max → (−rel, id) tie-break
            picked_score.append(float(cand[i]))
            selected.append(i)
            sims = unit @ unit[i]
            max_sim = np.maximum(max_sim, sims)
        return pd.DataFrame(
            {
                query_col: pdf[query_col].iloc[selected].to_numpy(),
                "rank": np.arange(1, take + 1, dtype=np.int64),
                id_col: pdf[id_col].iloc[selected].to_numpy(),
                "relevance": rel[selected],
                "mmr_score": np.array(picked_score, dtype=np.float64),
            }
        )

    return shortlist.groupBy(query_col).applyInPandas(per_query, out_schema)
