"""Deduplication operators — exact through fuzzy, all DataFrame-native.

Ladder of cost vs. recall (training-data pipeline staples):

1. ``deterministic_dedup``  — exact key dedup with a defined winner
   (fixes the reference's arbitrary-row ``dropDuplicates``,
   etl_pipeline.py:111 / SURVEY.md §4.3-3).
2. ``dedup_exact``          — content-hash dedup (md5 fingerprint).
3. ``ngram_jaccard_pairs``  — exact n-gram Jaccard similarity pairs:
   the *correctness oracle* for fuzzy dedup. O(pairs sharing a
   shingle); run it on candidates, not the full corpus, at scale.
4. ``minhash_lsh_candidates`` — MinHash + banded LSH: the 100-TB path.
   shingle → k minhashes → b bands → bucket join. Candidate pairs are
   then verified with exact Jaccard (``minhash_dedup_pairs``).
5. ``simhash`` / ``simhash_near_pairs`` — 64-bit SimHash with banded
   Hamming search.

Everything hashes JVM-side (xxhash64 inside higher-order functions) —
no Python in the hot path except SimHash's bit-mash, which is an
Arrow-vectorized pandas UDF over pre-hashed tokens.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType
from pyspark.sql.window import Window


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def deterministic_dedup(
    df: DataFrame, keys: list[str], order_by: list[Column]
) -> DataFrame:
    """Keep exactly one row per key — the first under ``order_by``.

    Unlike ``dropDuplicates`` the survivor does not depend on partition
    layout, so reruns (and cluster-size changes) are stable.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("_dd_rn", F.row_number().over(w))
        .filter(F.col("_dd_rn") == 1)
        .drop("_dd_rn")
    )


def dedup_exact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Content-hash dedup: one group per distinct text, min-id survivor."""
    return (
        df.select(F.md5(F.col(text_col)).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# ---------------------------------------------------------------------------
# shingling (shared by Jaccard + MinHash)
# ---------------------------------------------------------------------------


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct n-word shingles of a whitespace-tokenized text column.

    Pure higher-order-function expression (whole-stage codegen'd); short
    texts (< n words) collapse to a single whole-text shingle.
    """
    w = F.split(text, " ")
    windows = F.transform(
        F.sequence(F.lit(0), F.size(w) - F.lit(n)),
        lambda i: F.concat_ws(" ", F.slice(w, i + F.lit(1), n)),
    )
    return F.array_distinct(
        F.when(F.size(w) >= n, windows).otherwise(F.array(F.concat_ws(" ", w)))
    )


# Shingling/hashing is the CPU-dominant term of every fuzzy-dedup
# operator and runs in the SCAN stage — spread under-split inputs so it
# isn't serialized onto a single file-split (no-op at scale).
from .util import spread as _spread


def _exploded_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int, *, with_size: bool = False
) -> DataFrame:
    """One exploded (id, shingle) row per distinct shingle.

    The shingle array is evaluated exactly ONCE per document:

    - it is materialized in its own projection, so ``size`` and the
      generator read the same value (CollapseProject keeps non-cheap
      aliases referenced twice);
    - ``explode_outer`` — not ``explode`` — because the non-outer form
      triggers InferFiltersFromGenerate, which injects a
      ``size(word_shingles(..)) > 0`` filter that RE-EVALUATES the whole
      interpreted higher-order chain per row (measured ~3× the stage
      cost). ``word_shingles`` never returns null/empty (short texts
      collapse to one whole-text shingle), so outer ≡ inner here.

    ``with_size=True`` additionally carries the exact shingle-set size
    (``_n``) on every exploded row; consumers take ``min(_n)`` in their
    existing pair groupBy — constant per id — which removes the
    separate per-doc size aggregation and both size joins downstream.
    """
    base = _spread(df).select(
        F.col(id_col), word_shingles(F.col(text_col), n).alias("_sh")
    )
    if not with_size:
        return base.select(F.col(id_col), F.explode_outer("_sh").alias("shingle"))
    return base.select(
        F.col(id_col),
        F.size("_sh").alias("_n"),
        F.explode_outer("_sh").alias("shingle"),
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard pairs
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """All id pairs (a<b) with shingle-set Jaccard >= threshold.

    Inverted-index join: only pairs sharing >= 1 shingle are ever
    materialized. Scale guard: very frequent shingles (boilerplate) fan
    the index out quadratically — ``max_shingle_df`` drops shingles
    whose document frequency exceeds the cap from the *index only*
    (set sizes stay exact), the standard posting-list cap. Capped
    shingles stop counting toward intersections, so any pair sharing
    boilerplate scores below its true Jaccard, and pairs overlapping
    *only* in boilerplate are missed entirely — the deliberate
    trade-off for near-linear candidate counts. Leave ``None`` for the
    exact oracle; MinHash-LSH (below) is the 100-TB entry point and
    this verifies its candidates.
    """
    # Set sizes ride along on the exploded rows (one int per row): the
    # corpus is shingled ONCE, and the sizes need no extra scan, no
    # groupBy exchange, and no join — the pair groupBy picks them up as
    # min() aggregates (constant per id).
    sh = _exploded_shingles(df, id_col, text_col, n, with_size=True)
    if max_shingle_df is not None:
        # One window count over the same `shingle` partitioning the
        # self-join shuffles on — the exchange is shared, so the cap
        # costs no extra shuffle. `_n` was computed before the cap, so
        # set sizes stay exact.
        wdf = Window.partitionBy("shingle")
        sh = (
            sh.withColumn("_df", F.count(F.lit(1)).over(wdf))
            .filter(F.col("_df") <= max_shingle_df)
            .drop("_df")
        )
    # merge hint: Catalyst's Generate stats ignore explosion, so the
    # exploded side is size-estimated at ~file size and gets
    # compile-time BROADCAST once the raw file is under the 10 MB
    # threshold — 5M shingle rows built into the driver at 10× sf0.1
    # (OOMed a 1g driver; caught by bench's scale probe), unbounded at
    # 100 TB. The hint pins a sort-merge join (spill-safe under
    # mass-duplicate bucket skew). Cost: hints suppress AQE's runtime
    # broadcast conversion too, so tiny corpora pay ~30% over the
    # broadcast plan — correctness of the scale posture over a local
    # micro-win.
    a, b = sh.alias("a").hint("merge"), sh.alias("b")
    jaccard = F.col("n_common").cast("double") / (
        (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double")
    )
    return (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.min("a._n").alias("n_a"),
            F.min("b._n").alias("n_b"),
        )
        .select("id_a", "id_b", jaccard.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------


def contamination_stats(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 8,
) -> DataFrame:
    """Per-corpus-doc share of n-gram shingles that appear in ANY
    benchmark document — the standard eval-decontamination check for
    training corpora (docs overlapping the eval set leak answers).

    Returns (id, n_contaminated, n_shingles, contamination) for docs
    with at least one benchmark shingle; filter ``contamination`` at
    the caller's policy threshold.

    Scale shape: the benchmark side (eval suites) is tiny relative to
    a 100-TB corpus, so its distinct shingle set is **broadcast** —
    the corpus is scanned once, map-side hash-joined, and only the
    per-doc counters shuffle. No inverted-index self-join, no
    quadratic term.
    """
    # Sizes ride on the exploded rows: the corpus is shingled once and
    # the per-doc set size arrives via min() in the hits groupBy — no
    # separate size aggregation, no join.
    c_sh = _exploded_shingles(corpus, id_col, text_col, n, with_size=True)
    b_sh = benchmark.select(
        F.explode(word_shingles(F.col(text_col), n)).alias("shingle")
    ).distinct()
    return (
        c_sh.join(F.broadcast(b_sh), "shingle")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_contaminated"),
            # F.size is int32; counts are BIGINT cross-engine (functions/exact.py)
            F.min("_n").cast("long").alias("n_shingles"),
        )
        .select(
            id_col,
            "n_contaminated",
            "n_shingles",
            (
                F.col("n_contaminated").cast("double")
                / F.col("n_shingles").cast("double")
            ).alias("contamination"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _shingle_hash(i: int, shingle: Column, hash_family: str) -> Column:
    """hash_i(shingle) under the chosen family.

    ``xxhash64`` (default): fastest, JVM-native, engine-specific.
    ``md5``: 15 hex digits of md5("salt#" ⊕ s) as a 60-bit integer —
    expressible IDENTICALLY in ANSI-ish SQL
    (DuckDB: ``('0x' || substr(md5(...), 1, 15))::BIGINT``), which makes
    the whole MinHash pipeline cross-engine oracle-able. One md5 yields
    32 hex chars = TWO independent 60-bit values (chars 1-15 and
    16-30), so hashes 2k/2k+1 share the md5 of salt k — md5 is the
    dominant cost of the oracled form, and this halves it.
    """
    if hash_family == "md5":
        salted = F.concat(F.lit(f"{i // 2}#"), shingle)
        return F.conv(
            F.substring(F.md5(salted), 1 + 15 * (i % 2), 15), 16, 10
        ).cast("long")
    return F.xxhash64(F.concat(F.lit(f"{i}#"), shingle))


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    num_hashes: int = 32,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """(id, sig: array<long>[num_hashes]) MinHash signatures.

    hash_i(s) = hash("i#" ⊕ s); min per hash over the shingle set.

    Shape: explode shingles once → num_hashes MIN aggregates. The mins
    partially aggregate map-side (whole-stage codegen'd JVM hashing),
    so the only shuffle carries one num_hashes-wide row per document —
    this beats evaluating num_hashes array-transforms per row by ~30×
    (higher-order lambdas are interpreted and would re-evaluate the
    shingling per hash function).
    """
    sh = _exploded_shingles(df, id_col, text_col, n)
    mins = [
        F.min(_shingle_hash(i, F.col("shingle"), hash_family)).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    agg = sh.groupBy(id_col).agg(*mins)
    return agg.select(
        F.col(id_col),
        F.array(*[F.col(f"mh{i}") for i in range(num_hashes)]).alias("sig"),
    )


def minhash_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """(id, band, bh): one banded-LSH bucket membership row per band.

    This is the persistable *corpus index*: at scale the full corpus is
    bucketed ONCE, the (id, band, bh) frame is written partitioned by
    band, and daily increments join against it (see
    ``incremental_minhash_candidates``) instead of re-hashing 100 TB.
    ``bh`` is a string for the md5 family (cross-engine key), a 64-bit
    hash for xxhash64 — an index must be probed with the same family
    and (n, num_hashes, bands) it was built with.
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sigs = minhash_signatures(
        df, id_col, text_col, n=n, num_hashes=num_hashes, hash_family=hash_family
    )
    if hash_family == "md5":
        # cross-engine bucket key: "<band>|mh_i,mh_j,..." as a string
        band_hashes = F.array(
            *[
                F.concat_ws(
                    "|", F.lit(str(bi)), F.concat_ws(",", F.slice("sig", bi * r + 1, r))
                )
                for bi in range(bands)
            ]
        )
    else:
        band_hashes = F.array(
            *[
                F.xxhash64(F.lit(bi), F.concat_ws(",", F.slice("sig", bi * r + 1, r)))
                for bi in range(bands)
            ]
        )
    return sigs.select(F.col(id_col), F.posexplode(band_hashes).alias("band", "bh"))


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    max_bucket_size: int | None = None,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) via banded LSH.

    Signature split into ``bands`` bands of r=num_hashes/bands rows;
    docs colliding on any whole band become candidates. Probability a
    pair with Jaccard j collides: 1-(1-j^r)^b — with 32/8 the curve
    crosses ~0.5 near j≈0.6.

    Scale: the self-join is per (band, band_hash) bucket — no global
    quadratic blowup from *distinct* docs. Mass-duplicate clusters
    (identical boilerplate docs) still make single buckets quadratic;
    ``max_bucket_size`` drops buckets over the cap. Exact-duplicate
    clusters belong to the cheap md5 pass (``dedup_exact``) upstream —
    capping here only sheds work that pass already covers.

    ``hash_family="md5"`` keeps the bucket key as the raw concatenated
    band slice (no xxhash64) so the bucketing is reproducible in any
    SQL engine; grouping semantics are identical either way.
    """
    buckets = minhash_buckets(
        df,
        id_col,
        text_col,
        n=n,
        num_hashes=num_hashes,
        bands=bands,
        hash_family=hash_family,
    )
    if max_bucket_size is not None:
        # Window over the join's own (band, bh) partitioning — shares
        # the exchange, no extra shuffle.
        wb = Window.partitionBy("band", "bh")
        buckets = (
            buckets.withColumn("_bs", F.count(F.lit(1)).over(wb))
            .filter(F.col("_bs") <= max_bucket_size)
            .drop("_bs")
        )
    # merge hint: same Generate-underestimation guard as
    # ngram_jaccard_pairs — never broadcast a side whose row count came
    # from an explode (a band bucket side is the whole corpus ×bands).
    a, b = buckets.alias("a").hint("merge"), buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    max_bucket_size: int | None = None,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """LSH candidates verified with exact Jaccard (the full scale path).

    Verification is the map-side array-intersect form
    (:func:`verify_jaccard_pairs_arrays`): the candidate frame joins
    each side's (id, shingle-array) row once and intersects in the
    projection — no pair×shingle fan-out ever shuffles.
    """
    from ..observability import observe_count

    cands = minhash_lsh_candidates(
        df,
        id_col,
        text_col,
        n=n,
        num_hashes=num_hashes,
        bands=bands,
        max_bucket_size=max_bucket_size,
        hash_family=hash_family,
    )
    cands = observe_count("minhash_lsh.candidates", cands)
    return verify_jaccard_pairs_arrays(
        df, cands, id_col=id_col, text_col=text_col, n=n, threshold=threshold
    )


def prefix_filter_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Candidate pairs (id_a < id_b) via positional prefix filtering —
    the AllPairs/PPJoin principle (Bayardo, Ma & Srikant, WWW'07; Xiao
    et al., WWW'08), LOSSLESS for Jaccard unlike LSH.

    Three stacked lossless filters:

    1. **Prefix filter.** Order every document's shingle set by a
       global total order (ascending document frequency, shingle as
       tie-break: rarest first) and index only the first
       p = |S| - ceil(t*|S|) + 1 shingles. Any pair with J >= t has
       overlap >= ceil(t*max(|A|,|B|)), and with a shared global order
       their prefixes must intersect: if they were disjoint, every
       common shingle would fall in one side's (ceil(t*|S|)-1)-sized
       suffix — fewer than the required overlap. Because rare-first
       ordering puts exactly the LOW-frequency shingles in the prefix,
       boilerplate shingles live in suffixes and the quadratic
       per-posting-list term collapses.
    2. **Positional filter** (PPJoin). Both shingle lists are sorted by
       the SAME global order, so the first prefix-prefix match (min
       position on either side — it is the same shingle) has no common
       shingle before it; overlap <= 1 + min(|A|-pa0, |B|-pb0). Pairs
       whose bound falls below alpha = ceil(t/(1+t)·(|A|+|B|))
       (the overlap equivalent of Jaccard >= t) are pruned without
       verification.
    3. **Size filter.** overlap <= min(|A|,|B|), so
       min(|A|,|B|) >= alpha — free in the same aggregate.

    Shuffle shape: document frequency is a window over the same
    shingle-key partitioning the self-join uses; the per-document rank
    adds one exchange on ``id``; the positional bound rides the pair
    groupBy as min() aggregates (no extra exchange).

    Shuffle VOLUME: every exchange and the self-join carry
    ``xxhash64(shingle)`` (8 bytes) instead of the raw n-word shingle
    string (tens of bytes) — identical strings hash identically, so
    the shared global order and every truly-common shingle survive
    unchanged (no new false negatives); a 64-bit collision can only
    (a) merge two df counts — df ordering stays a consistent total
    order on keys — or (b) admit a spurious candidate, which the exact
    string-array verify stage removes. Lossless end-to-end, ~3-4×
    fewer exchange bytes on the two wide shuffles.
    """
    sh = _exploded_shingles(df, id_col, text_col, n, with_size=True).select(
        F.col(id_col), F.xxhash64("shingle").alias("_sk"), "_n"
    )
    wdf = Window.partitionBy("_sk")
    wdoc = Window.partitionBy(id_col).orderBy("_df", "_sk")
    prefix_len = F.col("_n") - F.ceil(F.lit(threshold) * F.col("_n")) + F.lit(1)
    pref = (
        sh.withColumn("_df", F.count(F.lit(1)).over(wdf))
        .withColumn("_rk", F.row_number().over(wdoc))
        .filter(F.col("_rk") <= prefix_len)
        .select(F.col(id_col), "_sk", F.col("_rk").alias("_pos"), "_n")
    )
    # merge hint: same Generate-underestimation guard as the full
    # inverted index (ngram_jaccard_pairs).
    a = pref.select(
        F.col(id_col).alias("id_a"),
        "_sk",
        F.col("_pos").alias("_pa"),
        F.col("_n").alias("n_a"),
    ).hint("merge")
    b = pref.select(
        F.col(id_col).alias("id_b"),
        F.col("_sk").alias("_skb"),
        F.col("_pos").alias("_pb"),
        F.col("_n").alias("n_b"),
    )
    alpha = F.ceil(F.lit(threshold / (1 + threshold)) * (F.col("n_a") + F.col("n_b")))
    return (
        a.join(
            b,
            (a["_sk"] == b["_skb"]) & (F.col("id_a") < F.col("id_b")),
        )
        .groupBy("id_a", "id_b")
        .agg(
            F.min("_pa").alias("_pa0"),
            F.min("_pb").alias("_pb0"),
            F.min("n_a").alias("n_a"),
            F.min("n_b").alias("n_b"),
        )
        .filter(
            (
                F.lit(1)
                + F.least(
                    F.col("n_a") - F.col("_pa0"), F.col("n_b") - F.col("_pb0")
                )
                >= alpha
            )
            & (F.least("n_a", "n_b") >= alpha)
        )
        .select("id_a", "id_b")
    )


def verify_jaccard_pairs_arrays(
    df: DataFrame,
    cands: DataFrame,
    *,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact-Jaccard verification via per-document shingle ARRAYS:
    join each candidate pair to both documents' (array_distinct'd)
    shingle arrays and intersect map-side (``array_intersect`` builds
    a hash set per row — O(|A|+|B|)).

    vs an exploded verification (joining candidates against per-shingle
    rows and COUNTing matches — the shape this replaced): no
    pair×shingle fan-out ever shuffles — the pair frame joins two
    (id, array) rows and everything else is a projection, so cost is
    O(cands·avg_set) map-side work instead of a cands·avg_set-row
    exchange + aggregation. The exploded shape only wins when
    individual shingle sets are too large to sit in a row (not the
    case for documents: ~10² shingles). Integer intersection + one
    double division — same cross-engine-exact jaccard as every other
    form.

    Two stages: the candidate-sized join intersects ``xxhash64``'d
    arrays (8-byte elements instead of n-word strings — ~3× less
    join-side volume, cheaper equality), and only its survivors reach
    the exact STRING-array jaccard that this function reports. The
    hashed prefilter is LOSSLESS at any collision rate: every common
    string stays a common hash (intersection never shrinks) and
    ``array_distinct`` can only shrink the union, so hashed jaccard
    >= true jaccard — a pair at threshold can't be dropped, and the
    exact stage (true-pair-sized, ~10³ rows) removes any inflated
    false positive and fixes the reported value.

    ``_spread`` before the array build: HOF lambdas run INTERPRETED,
    and the sets frame otherwise inherits the scan's few input splits
    — the measured d15_10x bottleneck was this projection evaluating
    ~1 ms/doc on 4 partitions under the join's broadcast subtree
    (~15 s), not the join or the intersect (<1 s each).

    Round-14 optimization (guide §1.2): the hashed prefilter and the
    exact stage used to join four separate side frames (``ha``/``hb``
    then ``sa``/``sb``), so the interpreted shingle build evaluated
    FOUR times over every document. Each side now carries BOTH arrays
    in one frame and the exact stage is a projection over the rough
    survivors instead of two more joins — shingling evaluates twice
    (once per join side), the pair predicate chain is unchanged, and
    the result is identical. Measured at sf0.1: d15 10× probe
    5.9 → 5.0 s, d03_fast 10× 4.8 → 3.7 s, d03_fast 1.5 → 1.4 s
    (d11/d16 flat — their wall is components, not verify).

    Round-15 (the round-14 verdict's item 8, guide §1.2 again): the
    remaining 2× — ``side`` feeds both the ``ha`` and ``hb`` join
    branches, so the interpreted shingle + xxhash array build still
    evaluated once per join side. The side frame is now materialized
    once (``truncate_lineage``, the same decode-once posture as the
    media family), so the corpus is shingled exactly ONCE per verify
    (measured numbers in OPTIMIZATION_r15.md; plan: the two
    interpreted-HOF projections collapse to one Scan ExistingRDD
    subtree feeding both sides).
    """
    sets = _spread(df).select(
        F.col(id_col), word_shingles(F.col(text_col), n).alias("_set")
    )
    side = sets.select(
        F.col(id_col),
        "_set",
        F.array_distinct(
            F.transform("_set", lambda x: F.xxhash64(x))
        ).alias("_hset"),
    )
    if not side.isStreaming:
        from .util import truncate_lineage

        side = truncate_lineage(side)
    ha = side.select(
        F.col(id_col).alias("id_a"),
        F.col("_set").alias("_sa"),
        F.col("_hset").alias("_ha"),
    )
    hb = side.select(
        F.col(id_col).alias("id_b"),
        F.col("_set").alias("_sb"),
        F.col("_hset").alias("_hb"),
    )
    hc = F.size(F.array_intersect("_ha", "_hb"))
    rough = (
        cands.join(ha, "id_a")
        .join(hb, "id_b")
        .filter(
            hc.cast("double")
            >= F.lit(threshold) * (F.size("_ha") + F.size("_hb") - hc).cast("double")
        )
        .select("id_a", "id_b", "_sa", "_sb")
    )
    return (
        rough.withColumn("n_common", F.size(F.array_intersect("_sa", "_sb")))
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.size("_sa") + F.size("_sb") - F.col("n_common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def prefix_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """EXACT Jaccard pairs at scale: prefix+positional+size-filtered
    candidates (no false negatives, unlike LSH) verified with exact
    array-intersect Jaccard. Same result set as
    ``ngram_jaccard_pairs`` on every input — the full inverted index
    is the oracle — but high-df shingles never enter the candidate
    join and surviving pairs verify map-side."""
    from ..observability import observe_count

    cands = prefix_filter_candidates(
        df, id_col, text_col, n=n, threshold=threshold
    )
    cands = observe_count("prefix_filter.candidates", cands)
    return verify_jaccard_pairs_arrays(
        df, cands, id_col=id_col, text_col=text_col, n=n, threshold=threshold
    )


# ---------------------------------------------------------------------------
# duplicate groups (connected components)
# ---------------------------------------------------------------------------


def dedup_components(
    ids: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str,
    max_iters: int = 20,
    driver_edge_limit: int = 500_000,
) -> DataFrame:
    """(id, canonical_id): connected components over duplicate pairs.

    Pair-level dedup (Jaccard/MinHash/edit-distance) yields edges; the
    *deduped corpus* needs the transitive closure — A~B, B~C must
    collapse to one survivor, and entity-resolution graphs (d19) form
    LONG CHAINS (near-sequential ids differing by one digit), not just
    tiny clique-ish near-dup clusters. One-hop min-label propagation
    needs O(diameter) rounds and silently truncated such chains at
    ``max_iters``; the solvers here don't.

    Two tiers:

    - **Driver union-find** when the canonical edge list is within
      ``driver_edge_limit`` (default 500k edges — streamed to the
      driver as plain tuples; with the parent dict and label mapping
      that bounds driver heap at roughly a couple hundred MB, sized
      honestly rather than by the raw 16-byte-per-edge arithmetic).
      The edge list of a thresholded duplicate graph is orders of
      magnitude smaller than the corpus — collecting it is the same
      bounded-driver contract as the IVF training sample, and
      path-compressed union-find is exact and instant at any
      diameter.
    - **Alternating large-star / small-star contraction** (Kiveris et
      al., "Connected Components in MapReduce and Beyond") beyond the
      limit: each round rewrites the edge list so every node links
      toward its neighborhood minimum; converges in O(log²) rounds for
      ANY diameter. Every phase is checkpointed (lineage truncation —
      the round-1 plan fingerprint showed 135 scans for a 4-round
      cache-only run); convergence is count-gated with an exact
      ``exceptAll`` confirmation, so a stable count can't fake a
      fixpoint.
    """
    edges0 = (
        pairs.select(
            F.least("id_a", "id_b").alias("lo"),
            F.greatest("id_a", "id_b").alias("hi"),
        )
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
    )

    from .util import truncate_lineage as _truncate

    E = _truncate(edges0)
    n_edges = E.count()

    if n_edges <= driver_edge_limit:
        # ---- bounded-driver exact path -------------------------------
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = root, parent[x]
            return root

        # toLocalIterator: partition-at-a-time fetch of bare tuples —
        # no full-result Row materialization spike on the driver.
        for lo, hi in E.toLocalIterator():
            ra, rb = find(lo), find(hi)
            if ra != rb:
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
        mapping = [(node, find(node)) for node in list(parent)]
        spark = ids.sparkSession
        if mapping:
            lab = spark.createDataFrame(mapping, ["_n", "_lab"])
            out = (
                ids.select(F.col(id_col))
                .join(
                    F.broadcast(lab),
                    F.col(id_col) == F.col("_n"),
                    "left",
                )
                .select(
                    F.col(id_col),
                    F.coalesce("_lab", F.col(id_col)).alias("canonical_id"),
                )
            )
        else:
            out = ids.select(
                F.col(id_col), F.col(id_col).alias("canonical_id")
            )
        return out

    # ---- distributed star-contraction path ---------------------------
    import warnings

    converged = False
    prev_count = n_edges
    for _ in range(max_iters):
        # Convergence = the FULL round (large-star then small-star) is
        # a no-op on the edge SET. A one-sided check is wrong: states
        # stable under large-star alone exist that small-star would
        # still contract (any node with two smaller neighbors), and
        # accepting them splits components silently.
        E_start, start_cnt = E, prev_count
        for phase in ("large", "small"):
            nbr = E.select(
                F.col("lo").alias("u"), F.col("hi").alias("v")
            ).union(E.select(F.col("hi").alias("u"), F.col("lo").alias("v")))
            m = nbr.groupBy("u").agg(F.min("v").alias("_mv")).select(
                "u", F.least("_mv", F.col("u")).alias("m")
            )
            joined = nbr.join(m, "u")
            if phase == "large":
                out = joined.filter(F.col("v") > F.col("u")).select(
                    F.col("v").alias("a"), F.col("m").alias("b")
                )
            else:
                out = joined.filter(F.col("v") <= F.col("u")).select(
                    F.col("v").alias("a"), F.col("m").alias("b")
                ).union(m.select(F.col("u").alias("a"), F.col("m").alias("b")))
            new_E = _truncate(
                out.select(
                    F.least("a", "b").alias("lo"),
                    F.greatest("a", "b").alias("hi"),
                )
                .filter(F.col("lo") != F.col("hi"))
                .distinct()
            )
            E = new_E
        cnt = E.count()
        # E is distinct, so (E \ E_start empty) + equal counts ⟺ equal
        # sets — the round changed nothing and the state is terminal.
        # (Checkpointed frames need no explicit unpersist — their
        # blocks are RDD-level and reclaimed by the ContextCleaner
        # under cleanCheckpoints=true, pinned in session.py.)
        if cnt == start_cnt and E.exceptAll(E_start).count() == 0:
            converged = True
            break
        prev_count = cnt
    # Belt and braces beyond the termination proof: at a true star
    # fixpoint every non-root appears as `hi` exactly once. A node with
    # two roots is precisely the silent-split symptom — surface it.
    if converged:
        dup_hi = (
            E.groupBy("hi").agg(F.count(F.lit(1)).alias("_c"))
            .filter(F.col("_c") > 1)
            .count()
        )
        if dup_hi > 0:
            # Reachable only if a full-round fixpoint is NOT a star
            # set — outside the algorithm's guarantees, so more
            # iterations cannot help; don't advise raising max_iters.
            warnings.warn(
                f"dedup_components: star contraction reached a fixpoint "
                f"that is not star-shaped ({dup_hi} nodes with multiple "
                f"roots) — labels for those nodes are ambiguous. This "
                f"violates the contraction invariant; rerun via the "
                f"driver union-find path (raise driver_edge_limit) and "
                f"report the edge list.",
                RuntimeWarning,
                stacklevel=2,
            )
    else:
        warnings.warn(
            f"dedup_components: star contraction did not converge within "
            f"max_iters={max_iters} rounds; components may carry multiple "
            f"canonical ids. Raise max_iters.",
            RuntimeWarning,
            stacklevel=2,
        )
    # At the fixpoint E is a set of stars rooted at component minima:
    # every non-root appears exactly once as `hi` with its root as `lo`.
    return ids.select(F.col(id_col)).join(
        E.select(F.col("hi").alias("_n"), F.col("lo").alias("_lab")),
        F.col(id_col) == F.col("_n"),
        "left",
    ).select(
        F.col(id_col), F.coalesce("_lab", F.col(id_col)).alias("canonical_id")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash: long) — 64-bit SimHash over whitespace tokens.

    Token hashing stays JVM-side (xxhash64 in a higher-order transform);
    only the 64-lane bit tally runs in an Arrow-batched pandas UDF —
    numpy-vectorized, deterministic, no external deps.
    """
    hashed = _spread(df).select(
        F.col(id_col),
        F.transform(F.split(F.col(text_col), " "), lambda t: F.xxhash64(t)).alias(
            "tok_hashes"
        ),
    )

    @F.pandas_udf(LongType())
    def _simhash_from_hashes(tok_hashes: pd.Series) -> pd.Series:
        import numpy as np

        n = len(tok_hashes)
        out = np.zeros(n, dtype=np.int64)
        if n == 0:
            return pd.Series(out)
        shifts = np.arange(64, dtype=np.uint64)
        lengths = np.fromiter((len(h) for h in tok_hashes), np.int64, count=n)
        # Whole-batch tally: one (tokens, 64) bit matrix + segment sum
        # per chunk, instead of a Python loop per row. Chunked on
        # cumulative token count so the bit matrix stays ~128 MB.
        bounds = np.searchsorted(np.cumsum(lengths), np.arange(0, lengths.sum(), 1 << 18))
        bounds = np.unique(np.append(bounds, n))
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            rows = [
                np.asarray(h, dtype=np.int64) for h in tok_hashes.iloc[lo:hi]
            ]
            flat = np.concatenate(rows) if rows else np.empty(0, np.int64)
            if flat.size == 0:
                continue
            row_idx = np.repeat(np.arange(hi - lo), lengths[lo:hi])
            bits = ((flat.astype(np.uint64)[:, None] >> shifts) & 1).astype(
                np.int64
            )  # (tokens, 64) in {0,1}
            tally = np.zeros((hi - lo, 64), dtype=np.int64)
            np.add.at(tally, row_idx, 2 * bits - 1)
            sig = ((tally > 0).astype(np.uint64) << shifts).sum(
                axis=1, dtype=np.uint64
            )
            out[lo:hi] = sig.view(np.int64)
        return pd.Series(out)

    return hashed.select(F.col(id_col), _simhash_from_hashes("tok_hashes").alias("simhash"))


def simhash_ce(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash: long) — 60-bit SimHash, cross-engine reproducible.

    Token hash is the md5 hex-prefix integer (same construction as the
    MinHash md5 family), and the 60 bit tallies are plain conditional
    SUM aggregates — every step expressible identically in ANSI-ish
    SQL, which makes banded SimHash search (d04) fully oracle-able in
    DuckDB. Shape: explode tokens → materialize the hash once (the 60
    tally expressions read a column, not 60 re-evaluations of md5) →
    60 map-side partial SUMs → one 60-term bit-assembly projection.
    The pandas-UDF ``simhash`` (xxhash64, 64-bit) stays the fast
    engine-native default.
    """
    toks = (
        _spread(df)
        .select(F.col(id_col), F.split(F.col(text_col), " ").alias("_toks"))
        # plain explode (NOT explode_outer): a NULL text must drop the
        # doc entirely, matching the oracle's unnest(string_split(NULL)).
        # The inferred size(_toks)>0 filter re-evaluates only size() on
        # a materialized column — the explode_outer trick is for
        # expensive generator expressions (see _exploded_shingles), not
        # this cheap split.
        .select(F.col(id_col), F.explode("_toks").alias("tok"))
    )
    hashed = toks.select(
        F.col(id_col),
        F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long").alias("_h"),
    )
    tallies = [
        F.sum(
            F.when(
                F.shiftright(F.col("_h"), b).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)
        ).alias(f"_b{b}")
        for b in range(60)
    ]
    tal = hashed.groupBy(id_col).agg(*tallies)
    sig = None
    for b in range(60):
        term = F.when(F.col(f"_b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return tal.select(F.col(id_col), sig.cast("long").alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_hamming: int = 3,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Pairs (id_a < id_b) with SimHash Hamming distance <= max_hamming.

    Banded search: split the signature into max_hamming+1 chunks;
    by pigeonhole any pair within the distance bound agrees on >= 1
    whole chunk → join per (chunk_idx, chunk_value) bucket, then verify
    with bit_count(xor). ``hash_family="md5"`` switches to the 60-bit
    cross-engine signature (see :func:`simhash_ce`) so the whole search
    is DuckDB-oracle-able.
    """
    chunks = max_hamming + 1
    sig_bits = 60 if hash_family == "md5" else 64
    width = sig_bits // chunks
    sigs = (
        simhash_ce(df, id_col, text_col)
        if hash_family == "md5"
        else simhash(df, id_col, text_col)
    )
    chunk_vals = F.array(
        *[
            F.shiftrightunsigned(F.col("simhash"), ci * width).bitwiseAND(
                F.lit((1 << width) - 1)
            )
            for ci in range(chunks)
        ]
    )
    buckets = sigs.select(
        F.col(id_col), F.col("simhash"), F.posexplode(chunk_vals).alias("chunk", "cv")
    )
    # merge hint: chunk buckets are posexplode-amplified (see the
    # Generate-underestimation note in ngram_jaccard_pairs).
    a, b = buckets.alias("a").hint("merge"), buckets.alias("b")
    hamming = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    ).cast("long")
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ---------------------------------------------------------------------------
# cross-document duplicated n-gram spans (exact substring dedup,
# n-gram granularity — Lee et al. 2022, "Deduplicating Training Data
# Makes Language Models Better", the suffix-array pass approximated at
# word-n-gram resolution so it stays one shuffle instead of a global
# suffix sort)
# ---------------------------------------------------------------------------


def positional_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(id, pos, gram): every positional word n-gram, pos 1-based.

    Docs shorter than n words are dropped (no complete n-gram).
    Non-distinct — positions matter. Same explode_outer /
    single-evaluation discipline as ``_exploded_shingles``.
    """
    w = F.split(F.col(text_col), " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(w) - F.lit(n)),
        lambda i: F.concat_ws(" ", F.slice(w, i + F.lit(1), n)),
    )
    return (
        _spread(df)
        .filter(F.size(F.split(F.col(text_col), " ")) >= n)
        .select(F.col(id_col), F.posexplode_outer(grams).alias("pos0", "gram"))
        .select(F.col(id_col), (F.col("pos0") + 1).cast("long").alias("pos"), "gram")
    )


def duplicate_ngram_spans(
    df: DataFrame, id_col: str, text_col: str, n: int = 8
) -> DataFrame:
    """Maximal per-doc token spans covered by n-grams that also occur in
    at least one OTHER document.

    Plan: positional n-grams → per-gram distinct-doc count (two-phase
    agg) → keep cross-doc grams → join positions back (sort-merge:
    both sides are Generate-amplified, same broadcast-underestimation
    guard as the LSH buckets) → gaps-and-islands merge of overlapping
    windows per doc. Shuffles key on gram then id — both well spread;
    a degenerate corpus-wide gram caps at one posting list, the same
    skew profile d02 documents.

    Returns (id, span_start, span_end, span_tokens, n_dup_grams),
    1-based inclusive token positions.
    """
    gp = positional_shingles(df, id_col, text_col, n)
    cross = (
        gp.groupBy("gram")
        .agg(F.count_distinct(F.col(id_col)).alias("_nd"))
        .filter(F.col("_nd") >= 2)
        .select("gram")
    )
    dup = gp.hint("merge").join(cross.hint("merge"), "gram").select(id_col, "pos")
    w = Window.partitionBy(id_col).orderBy("pos")
    brk = F.when(F.col("pos") - F.lag("pos").over(w) > n, 1).otherwise(0)
    island = F.sum(brk).over(
        Window.partitionBy(id_col).orderBy("pos").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
    )
    return (
        dup.withColumn("_island", island)
        .groupBy(id_col, "_island")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + F.lit(n - 1)).cast("long").alias("span_end"),
            F.count(F.lit(1)).cast("long").alias("n_dup_grams"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
            "n_dup_grams",
        )
    )


def incremental_minhash_candidates(
    new_docs: DataFrame,
    corpus_buckets: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    max_bucket_size: int | None = None,
    hash_family: str = "xxhash64",
    new_buckets: DataFrame | None = None,
) -> DataFrame:
    """Candidate pairs for an INCREMENT against a persisted corpus index.

    ``new_buckets`` short-circuits the increment's bucket computation
    when the caller already materialized it (the streaming sink hashes
    each batch exactly once and reuses the frame for the index append).

    ``corpus_buckets`` is a prior ``minhash_buckets`` output (typically
    read back from parquet partitioned by band); only the increment is
    shingled and hashed. Returns (id_a, id_b), id_a < id_b, where at
    least one side is a new doc — corpus-vs-corpus pairs were produced
    when the corpus was indexed and are never recomputed.

    Invariant (pinned in tests/test_round4_ops.py): with no bucket cap,
    candidates(corpus) ∪ candidates(increment | corpus index) ==
    candidates(corpus ∪ increment). With a cap the sets may differ at
    bucket-size boundaries — the cap sees the union's bucket sizes.

    Scale: the index probe joins on (band, bh) — the same exchange
    shape as the self-join form; the increment side is small, but both
    sides stay sort-merge (bucket rows are Generate-amplified and a
    popular bucket's posting list must never be compile-time
    broadcast).
    """
    if new_buckets is None:
        new_buckets = minhash_buckets(
            new_docs,
            id_col,
            text_col,
            n=n,
            num_hashes=num_hashes,
            bands=bands,
            hash_family=hash_family,
        )
    new_b = new_buckets.withColumn("_new", F.lit(True))
    all_b = corpus_buckets.select(
        F.col(id_col), "band", "bh", F.lit(False).alias("_new")
    ).unionByName(new_b)
    if max_bucket_size is not None:
        wb = Window.partitionBy("band", "bh")
        all_b = (
            all_b.withColumn("_bs", F.count(F.lit(1)).over(wb))
            .filter(F.col("_bs") <= max_bucket_size)
            .drop("_bs")
        )
    a, b = all_b.alias("a").hint("merge"), all_b.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .filter(F.col("a._new") | F.col("b._new"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
