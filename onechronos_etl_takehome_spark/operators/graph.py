"""Graph analytics over edge-list DataFrames.

Triangle counting with degree-ordered edge orientation — the standard
trick (Chiba–Nishizeki / Cohen's MapReduce formulation, also what
GraphFrames ships) that turns the wedge join from Σ deg² into O(m^1.5):
orient every undirected edge from its lower-(degree, id) endpoint to the
higher one, so each node's out-degree is bounded by O(√m); then every
triangle is counted exactly once as a wedge (u→v, u→w) closed by the
oriented edge v→w.

All aggregates are exact integers; the one double column (global
clustering coefficient) is a single fixed-order expression on exact
operands, so the result hash-matches a plain id-ordered SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triangle_stats(edges: DataFrame, src: str = "u", dst: str = "v") -> DataFrame:
    """One-row global triangle census of an undirected graph.

    ``edges`` must hold each undirected edge exactly once with
    ``src < dst`` (canonical form, no self-loops).  Returns
    ``(n_nodes, n_edges, n_wedges, n_triangles, global_clustering)``
    where ``n_wedges = Σ C(deg, 2)`` and ``global_clustering =
    3·triangles / wedges`` (0.0 for a wedge-free graph).

    Scale shape: degrees are one groupBy over the exploded endpoints;
    the orientation join is two hash joins against that degree table
    (node-keyed — no broadcast assumption, the degree table is
    node-cardinality); the wedge self-join fans out only through
    oriented out-neighborhoods (≤ O(√m) each after orientation), and
    the closing join probes the oriented edge set on (v, w).  No step
    materializes anything driver-side.
    """
    from .util import truncate_lineage

    # The edge frame feeds four branches (degrees, orientation, the
    # edge count, and — via orientation — adjacency and closure); the
    # oriented frame feeds three. Without lineage truncation every
    # branch re-executes the upstream edge-construction subtree (for
    # the catalog query: the lineitem self-join + distinct, ~36 scans
    # in the printed plan); checkpointing both collapses that to one
    # materialization each — the same persist-the-edge-list posture a
    # 100-TB graph job takes.
    e = truncate_lineage(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    )

    ends = e.select(F.col("u").alias("n")).unionAll(e.select(F.col("v").alias("n")))
    deg = ends.groupBy("n").agg(F.count(F.lit(1)).cast("long").alias("d"))

    # Attach both endpoint degrees, then orient low → high by (d, id).
    ed = (
        e.join(deg.select(F.col("n").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("n").alias("v"), F.col("d").alias("dv")), "v")
    )
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = truncate_lineage(
        ed.select(
            F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("t"),
        )
    )

    # Adjacency-intersection form of the oriented wedge count: a
    # triangle (u→v, u→w, v→w) is one element of outadj(u) ∩ outadj(v)
    # for the oriented edge (u, v) — w's rank exceeds v's automatically
    # because v→w is oriented. Materializing per-node out-neighbor
    # ARRAYS and intersecting JVM-side moves the same O(m^1.5) element
    # volume through one groupBy + two node-keyed joins instead of
    # shuffling every wedge as its own row and re-joining on the pair —
    # ~2× less exchange and no row-per-wedge overhead.
    # Inner joins: an edge (u, v) where v has no out-neighbors closes
    # no triangle, so dropping it is exact (u always matches — it has
    # at least the out-edge to v).
    adj = o.groupBy("s").agg(F.collect_list("t").alias("nbrs"))
    closed = (
        o.select("s", "t")
        .join(adj.select(F.col("s"), F.col("nbrs").alias("_nu")), "s")
        .join(
            adj.select(F.col("s").alias("t"), F.col("nbrs").alias("_nv")), "t"
        )
        .select(
            F.size(F.array_intersect("_nu", "_nv")).cast("long").alias("_tri")
        )
    )
    tri = closed.agg(
        F.coalesce(F.sum("_tri"), F.lit(0)).cast("long").alias("n_triangles")
    )

    stats = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        # Integer-domain C(d, 2): d·(d−1) is even, `div` keeps the whole
        # accumulation in BIGINT (no double rounding at high degrees).
        F.sum(F.expr("(d * (d - 1)) div 2")).cast("long").alias("n_wedges"),
    )
    n_edges = e.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))

    return (
        stats.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.when(F.col("n_wedges") > 0,
                   F.lit(3.0) * F.col("n_triangles").cast("double")
                   / F.col("n_wedges").cast("double"))
            .otherwise(F.lit(0.0))
            .alias("global_clustering"),
        )
    )
