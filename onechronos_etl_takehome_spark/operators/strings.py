"""Character-level fuzzy string matching (edit-distance join).

The token-level families in ``dedup.py`` (shingle Jaccard, MinHash,
SimHash) miss the entity-resolution workload where near-duplicates
differ by a single *character* — IDs with a typo'd digit, names with a
transposed letter, URLs with one path segment changed. The standard
large-scale answer is a signature join: generate a small, lossless
candidate key set per string, join on the keys, then verify survivors
with the exact distance.

This module implements the **deletion-neighborhood join** (FastSS,
Bocek et al., U. Zurich TR ifi-2007.02): for edit distance k=1 the
signature set of a string ``s`` is ``{s} ∪ {s with one character
deleted}`` and

    lev(a, b) <= 1  ⟺  signatures(a) ∩ signatures(b) ≠ ∅

(substitution at position i → both share the delete-at-i variant;
insertion/deletion → the shorter string is itself a deletion variant
of the longer; equality → the strings themselves match). The candidate
set is therefore LOSSLESS — the verified output is byte-identical to
the all-pairs form, which is what the DuckDB oracle computes.

Scale posture (100 TB): |s|+1 signatures per row, each bucket holds
only strings within edit distance 2 of each other under one deletion —
bucket fan-out is bounded by the data's true near-duplicate density,
not corpus size. The exact ``levenshtein`` verify runs only on
candidate pairs, JVM-side (whole-stage codegen). No all-pairs join
exists anywhere in the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_neighborhood(s: Column) -> Column:
    """``{s} ∪ {s minus one char}`` as a distinct array (k=1 FastSS
    signatures). Pure JVM array expressions — ``sequence`` over the
    positions, one ``concat(substring, substring)`` per position."""
    dels = F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.concat(s.substr(F.lit(1), i - 1), F.substr(s, i + 1)),
    )
    return F.array_distinct(F.array_append(dels, s))


def edit_distance_join(
    df: DataFrame,
    id_col: str,
    str_col: str,
    *,
    max_sig_df: int | None = None,
) -> DataFrame:
    """All pairs with ``levenshtein <= 1`` via the FastSS signature
    join: (id_a, id_b, dist), id_a < id_b, exact and lossless.

    ``max_sig_df`` optionally drops signature buckets with more than
    that many members (the posting-list cap every other signature
    family here exposes — ``max_shingle_df``, ``max_bucket_size``,
    ``max_block_df``). A hot bucket means a prefix shared by a huge
    cluster of strings; capping trades recall inside such clusters for
    bounded join fan-out. The cap shares the signature exchange — no
    extra shuffle. Uncapped (the default) the join is lossless and is
    what the d17 oracle hash-matches.
    """
    # spread(): the signature join + levenshtein verify run inside the
    # scan's stage; a single-file scan would pin them to 1-2 cores
    # (measured 3× on sf0.1 customer). Scan-shaped input by contract.
    from .util import spread

    sigs = spread(df).select(
        F.col(id_col).alias("_id"),
        F.col(str_col).alias("_s"),
        F.explode(deletion_neighborhood(F.col(str_col))).alias("_sig"),
    )
    if max_sig_df is not None:
        from pyspark.sql.window import Window

        w = Window.partitionBy("_sig")
        sigs = sigs.withColumn("_df", F.count(F.lit(1)).over(w)).filter(
            F.col("_df") <= max_sig_df
        ).drop("_df")
    a = sigs.alias("a")
    b = sigs.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a._sig") == F.col("b._sig"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._s").alias("_sa"),
            F.col("b._s").alias("_sb"),
        )
    )
    # Verify BEFORE dedup: levenshtein is a cheap codegen'd expression
    # evaluated map-side, and most collisions fail it (deletion-sig
    # sharing admits lev-2 transposition-shaped pairs — measured 3.3×
    # more candidates than survivors on customer names), so filtering
    # first shrinks the dedup exchange by the same factor. A pair's
    # duplicates all carry the same dist, so dedup-after is identical.
    from ..observability import observe_count

    cand = observe_count("fastss.candidates", cand)
    return (
        cand.withColumn("dist", F.levenshtein("_sa", "_sb").cast("long"))
        .filter(F.col("dist") <= 1)
        .dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", "dist")
    )


def _seg_bounds(length, i: "Column", tau: int):
    """Even partition of ``length`` chars into tau+1 segments: first
    (length mod tau+1) segments get the extra char. Returns (start,
    seg_len) as 1-based Column exprs — identical arithmetic on index
    and probe side so keys align."""
    n = tau + 1
    base = F.floor(length / n)
    rem = length % n
    start = (
        i * base + F.least(i, rem) + 1
    )
    seg_len = base + F.when(i < rem, 1).otherwise(0)
    return start.cast("int"), seg_len.cast("int")


def passjoin_pairs(
    df: DataFrame,
    id_col: str,
    str_col: str,
    *,
    tau: int = 2,
    max_seg_df: int | None = None,
    block_col: str | None = None,
) -> DataFrame:
    """All pairs with ``levenshtein <= tau`` via PassJoin segment
    signatures (Li, Deng & Feng, VLDB'11): (id_a, id_b, dist), exact
    and lossless for any tau.

    Pigeonhole: partition the indexed string into tau+1 segments; tau
    edits can touch at most tau segments, so at least one survives
    VERBATIM in any string within distance tau, shifted by at most tau
    positions. Candidates therefore come from an equi-join on
    (segment text, segment index, indexed length): the index side
    emits its tau+1 segments; the probe side emits, for every
    candidate indexed length within ±tau of its own and every segment
    slot, the substrings at the segment's start ± tau (the loose shift
    window — a superset of PassJoin's multi-match-aware selection,
    keeping the join lossless at ~(2tau+1) extra probes). Exact
    ``levenshtein`` verifies survivors.

    Generalizes the k=1 FastSS deletion join (``edit_distance_join``)
    to arbitrary tau; signatures are substrings rather than deletions,
    so signature volume is O(tau²) per row instead of O(|s|). All
    signature generation is JVM array expressions — no Python.

    ``block_col`` adds an entity-resolution blocking key: only pairs
    with EQUAL (non-null) block values join — the key rides every
    signature, so blocking prunes candidates inside the same exchange
    rather than post-filtering pairs. Rows with a NULL block match
    nothing (document the 3VL contract rather than inventing one).

    Skew caveat: a segment shared by a huge fraction of the corpus (a
    constant prefix — ``Customer#``, a URL scheme, boilerplate) makes
    that (seg, i, l) bucket quadratic: the match carries no
    information but still generates |bucket|² candidates.
    ``max_seg_df`` drops index postings for buckets larger than the
    cap — the posting-list cap every signature family here exposes.
    Capped recall loss is confined to pairs whose ONLY surviving
    segment is a ubiquitous one (their informative segments all took
    edits); the uncapped form stays the oracle.
    """
    from .util import spread

    df = spread(df)  # see edit_distance_join — probe stage parallelism
    s = F.col(str_col)
    length = F.length(s)

    # Index side: the tau+1 segments of this string.
    idx_i = F.sequence(F.lit(0), F.lit(tau))

    def _index_segs():
        def one(i):
            start, sl = _seg_bounds(length, i, tau)
            return F.struct(
                F.substring(s, start, sl).alias("seg"),
                i.cast("int").alias("i"),
                length.cast("int").alias("l"),
            )

        return F.transform(idx_i, one)

    blk = [F.col(block_col).alias("_blk")] if block_col else []
    blk_keep = ["_blk"] if block_col else []
    index = df.select(
        F.col(id_col).alias("_id"),
        s.alias("_s"),
        F.explode(_index_segs()).alias("_k"),
        *blk,
    ).select("_id", "_s", F.col("_k.seg").alias("_seg"),
             F.col("_k.i").alias("_i"), F.col("_k.l").alias("_l"),
             *blk_keep)

    # Probe side: for every candidate indexed length lp in
    # [len-tau, len+tau], every segment slot i, every shift d in
    # [-tau, tau]: the substring of the probe at the segment's start
    # (computed for length lp) + d, with the segment length of lp.
    lps = F.sequence(length - tau, length + tau)

    def _probe_subs():
        def per_lp(lp):
            def per_i(i):
                start, sl = _seg_bounds(lp, i, tau)

                def per_d(d):
                    p = start + d
                    return F.struct(
                        F.substring(s, p, sl).alias("seg"),
                        i.cast("int").alias("i"),
                        lp.cast("int").alias("l"),
                        # validity: inside the probe string and a
                        # non-empty segment
                        (
                            (p >= 1)
                            & (sl >= 1)
                            & (p + sl - 1 <= length)
                        ).alias("ok"),
                    )

                return F.transform(F.sequence(F.lit(-tau), F.lit(tau)), per_d)

            return F.flatten(F.transform(idx_i, per_i))

        return F.flatten(F.transform(lps, per_lp))

    probe = df.select(
        F.col(id_col).alias("_id"),
        s.alias("_s"),
        F.explode(F.filter(_probe_subs(), lambda k: k["ok"])).alias("_k"),
        *blk,
    ).select("_id", "_s", F.col("_k.seg").alias("_seg"),
             F.col("_k.i").alias("_i"), F.col("_k.l").alias("_l"),
             *blk_keep)

    if max_seg_df is not None:
        from pyspark.sql.window import Window

        w = Window.partitionBy("_seg", "_i", "_l")
        index = (
            index.withColumn("_df", F.count(F.lit(1)).over(w))
            .filter(F.col("_df") <= max_seg_df)
            .drop("_df")
        )

    a = index.alias("a")
    b = probe.alias("b")
    join_cond = (
        (F.col("a._seg") == F.col("b._seg"))
        & (F.col("a._i") == F.col("b._i"))
        & (F.col("a._l") == F.col("b._l"))
        & (F.col("a._id") != F.col("b._id"))
    )
    if block_col:
        join_cond = join_cond & (F.col("a._blk") == F.col("b._blk"))
    cand = a.join(b, join_cond).select(
        F.least("a._id", "b._id").alias("id_a"),
        F.greatest("a._id", "b._id").alias("id_b"),
        F.when(F.col("a._id") < F.col("b._id"), F.col("a._s"))
        .otherwise(F.col("b._s"))
        .alias("_sa"),
        F.when(F.col("a._id") < F.col("b._id"), F.col("b._s"))
        .otherwise(F.col("a._s"))
        .alias("_sb"),
    )

    # Pigeonhole needs ALL tau+1 index segments non-empty, i.e. index
    # length >= tau+1. A pair where the LONGER string is >= tau+1 is
    # covered (the longer side indexes, the shorter probes); only
    # pairs with BOTH strings of length <= tau can slip through with
    # an empty surviving segment. That class is alphabet-bounded
    # (<= |Σ|^tau distinct strings) — brute-force it.
    tiny = df.filter(F.length(F.col(str_col)) <= tau).select(
        F.col(id_col).alias("_id"), F.col(str_col).alias("_s"), *blk
    )
    ta, tb = tiny.alias("ta"), tiny.alias("tb")
    tiny_cond = F.col("ta._id") < F.col("tb._id")
    if block_col:
        tiny_cond = tiny_cond & (F.col("ta._blk") == F.col("tb._blk"))
    tiny_cand = ta.join(
        F.broadcast(tb), tiny_cond
    ).select(
        F.col("ta._id").alias("id_a"),
        F.col("tb._id").alias("id_b"),
        F.col("ta._s").alias("_sa"),
        F.col("tb._s").alias("_sb"),
    )

    # Verify before dedup (same reasoning as edit_distance_join): the
    # map-side levenshtein filter discards most signature collisions,
    # shrinking the one dedup exchange to the survivor multiset.
    from ..observability import observe_count

    return (
        observe_count("passjoin.candidates", cand.unionByName(tiny_cand))
        .withColumn("dist", F.levenshtein("_sa", "_sb").cast("long"))
        .filter(F.col("dist") <= tau)
        .dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", "dist")
    )
