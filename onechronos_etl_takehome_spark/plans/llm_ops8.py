"""Round-6 operator batch: dimension versioning + contrastive sampling.

Two capability families a 100-TB warehouse / training-data pipeline
needs that the catalog didn't witness yet:

- **SCD2 dimension build + incremental maintenance** (x26/x27):
  compress a change log into a type-2 slowly-changing dimension —
  one versioned row per state RUN with ``[valid_from, valid_to)``
  effective ranges and an ``is_current`` flag — and keep it current
  by merging append batches WITHOUT rebuilding history
  (``operators/scd2.py``). x15's snapshot diff detects WHAT changed
  between two snapshots; x13's transition matrix aggregates the
  Markov view; this materializes the HISTORY table every as-of join
  (q19) and point-in-time feature lookup runs against. Two windows
  over the same per-key partitioning (change detection, then range
  stitching on the much smaller change frame — Catalyst reuses the
  exchange), no global window, no self-join; x27's hash match
  against x26's full-rebuild SQL proves incremental == batch.

- **Contrastive negative sampling** (t24): k deterministic pseudo-
  random negatives per anchor for embedding/contrastive training —
  the hash-RING construction: order docs by a salted portable hash,
  pair each anchor with the k successors on the ring that fall
  outside its exact-dup group. Deterministic (reproducible epochs,
  stable under re-runs), uniform-without-replacement-ish (ring
  neighbors under an independent hash are a uniform draw), and
  join-shaped for scale: positions come from the bucketed two-pass
  prefix sum (no single-task global window — same machinery as
  t22/x16) and negatives attach via an EQUALITY join on dense
  integer positions, never a cross join or per-anchor sampling loop.
  Excluding same-group ring successors drops at most a few anchors
  below k negatives (exactly mirrored in the oracle) instead of
  resampling — at training scale a 1e-6 shortfall is noise, a
  resampling loop is a shuffle per retry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import pin_semantics
from ..sources.tables import load_table
from .catalog import register

# ---------------------------------------------------------------------------
# x26 — SCD2 dimension build (type-2 versioning from a change log)
# ---------------------------------------------------------------------------

_X26_ORACLE = """
    WITH o AS (
      SELECT user_id, event_type AS state, ts, event_id,
        LAG(event_type) OVER (
          PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events),
    c AS (
      SELECT user_id, state, ts, event_id FROM o
      WHERE prev IS NULL OR prev <> state),
    v AS (
      SELECT user_id, state, ts AS vf,
        LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS vt,
        ROW_NUMBER() OVER (
          PARTITION BY user_id ORDER BY ts, event_id) AS version
      FROM c)
    SELECT user_id, CAST(version AS BIGINT) AS version, state,
      strftime(vf, '%Y-%m-%d %H:%M:%S') AS valid_from,
      COALESCE(strftime(vt, '%Y-%m-%d %H:%M:%S'), 'current') AS valid_to,
      vt IS NULL AS is_current
    FROM v
"""


def _render_scd2(dim: DataFrame) -> DataFrame:
    """Driver-facing rendering of a typed SCD2 frame: timestamps as
    strings per the cross-engine exactness rules (functions/exact.py),
    the open version's ``valid_to`` as the literal 'current'."""
    return dim.select(
        "user_id",
        "version",
        "state",
        F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss").alias(
            "valid_from"
        ),
        F.coalesce(
            F.date_format("valid_to", "yyyy-MM-dd HH:mm:ss"),
            F.lit("current"),
        ).alias("valid_to"),
        F.col("valid_to").isNull().alias("is_current"),
    )


@register("x26_scd2_dimension", oracle=_X26_ORACLE)
def x26_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing dimension from the events change log
    (``operators/scd2.py:scd2_build``): per user, consecutive runs of
    the same ``event_type`` collapse to one versioned row with
    ``[valid_from, valid_to)`` effective range (half-open: a version
    ends the instant the next begins), ``valid_to = 'current'`` +
    ``is_current`` on the open version.

    Scale: change detection is one lag() window on (user, ts,
    event_id); range stitching (lead + version numbers) runs on the
    CHANGE frame — typically orders of magnitude smaller than the log
    — under the same partitioning, so Catalyst plans one exchange for
    both windows."""
    from ..operators.scd2 import scd2_build

    pin_semantics(spark)
    e = load_table(spark, sf_dir, "events")
    return _render_scd2(
        scd2_build(e, "user_id", "event_type", "ts", "event_id")
    )


@register("x27_scd2_incremental", oracle=_X26_ORACLE)
def x27_scd2_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SCD2 maintenance (``operators/scd2.py:scd2_apply``):
    the dimension is built from the first 15 days of the log, then the
    remainder is merged as an append batch — open versions close at
    the key's first genuinely-new change, continuing runs extend
    rather than duplicate, and history is never rescanned. The oracle
    is x26's FULL-REBUILD SQL over the whole log: the hash match IS
    the proof that incremental apply equals batch rebuild exactly
    (including the run-continuation edge across the cutoff)."""
    from ..operators.scd2 import scd2_apply, scd2_build
    from ..operators.util import truncate_lineage

    pin_semantics(spark)
    e = load_table(spark, sf_dir, "events")
    cutoff = e.agg((F.min("ts") + F.expr("INTERVAL 15 DAY")).alias("c"))
    # the harness derives history AND increment from one log scan; both
    # split frames fan out below (the increment into scd2_apply's
    # window+join branches, history into the build), so cut the shared
    # lineage once — in production each side is persisted parquet (the
    # streaming twin demonstrates that form) and this checkpoint stands
    # in for exactly that
    ec = truncate_lineage(e.join(F.broadcast(cutoff)))
    hist = ec.filter(F.col("ts") < F.col("c"))
    inc = ec.filter(F.col("ts") >= F.col("c"))
    # the dimension is read twice inside scd2_apply (open slice +
    # close-stamp join) — persisted-dim semantics, same cut
    dim = truncate_lineage(
        scd2_build(hist, "user_id", "event_type", "ts", "event_id")
    )
    merged = scd2_apply(dim, inc, "user_id", "event_type", "ts", "event_id")
    return _render_scd2(merged)


# ---------------------------------------------------------------------------
# x28 — point-in-time lookup against the SCD2 dimension
# ---------------------------------------------------------------------------

_X28_ORACLE = """
    WITH o AS (
      SELECT user_id, event_type AS state, ts, event_id,
        LAG(event_type) OVER (
          PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events WHERE event_type <> 'purchase'),
    c AS (
      SELECT user_id, state, ts, event_id FROM o
      WHERE prev IS NULL OR prev <> state),
    v AS (
      SELECT user_id, state, ts AS vf,
        LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS vt,
        ROW_NUMBER() OVER (
          PARTITION BY user_id ORDER BY ts, event_id) AS version
      FROM c)
    SELECT f.event_id, f.user_id,
      strftime(f.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
      COALESCE(d.state, 'none') AS state_at_purchase,
      CAST(COALESCE(d.version, 0) AS BIGINT) AS state_version,
      COALESCE(strftime(d.vf, '%Y-%m-%d %H:%M:%S'), 'never') AS state_since
    FROM (SELECT * FROM events WHERE event_type = 'purchase') f
    LEFT JOIN v d
      ON d.user_id = f.user_id AND f.ts >= d.vf
      AND (d.vt IS NULL OR f.ts < d.vt)
"""


@register("x28_scd2_pointintime", oracle=_X28_ORACLE)
def x28_scd2_pointintime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup — the query the SCD2 dimension
    (x26/x27) exists to serve: each purchase event is enriched with the
    user's activity state AS OF the purchase instant (the half-open
    ``[valid_from, valid_to)`` version containing ``ts``), version
    number, and the instant that state began. Purchases before a user's
    first state change keep ``('none', 0, 'never')`` via the left join.

    Scale: the fact side joins the dimension on KEY EQUALITY
    (user_id); the validity-range predicate is a join residual
    evaluated inside each key group, so this plans as a plain
    sort-merge (or broadcast — the dimension is dimension-sized, not
    log-sized) equi-join, never an interval cross product. Half-open
    ranges guarantee at most one matching version per fact, so the
    join cannot amplify rows. Unlike q19's union+window as-of trick
    (which rewrites the probe stream), this shape keeps the fact
    table untouched — the right pattern when facts are 100 TB and
    versions are millions."""
    from ..operators.scd2 import scd2_build

    pin_semantics(spark)
    e = load_table(spark, sf_dir, "events")
    dim = scd2_build(
        e.filter(F.col("event_type") != "purchase"),
        "user_id",
        "event_type",
        "ts",
        "event_id",
    )
    # rename the fact-side key: both frames descend from the same scan,
    # and a self-join on identically-named attributes degrades the
    # equi-key to a trivially-true predicate (BNLJ instead of SMJ)
    f_ = e.filter(F.col("event_type") == "purchase").select(
        "event_id",
        F.col("user_id").alias("_fuid"),
        F.col("ts").alias("_fts"),
    )
    cond = (
        (F.col("_fuid") == dim["user_id"])
        & (F.col("_fts") >= dim["valid_from"])
        & (dim["valid_to"].isNull() | (F.col("_fts") < dim["valid_to"]))
    )
    return f_.join(dim, cond, "left").select(
        f_["event_id"],
        F.col("_fuid").alias("user_id"),
        F.date_format("_fts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.coalesce(dim["state"], F.lit("none")).alias("state_at_purchase"),
        F.coalesce(dim["version"], F.lit(0))
        .cast("long")
        .alias("state_version"),
        F.coalesce(
            F.date_format(dim["valid_from"], "yyyy-MM-dd HH:mm:ss"),
            F.lit("never"),
        ).alias("state_since"),
    )


# ---------------------------------------------------------------------------
# t24 — contrastive negative sampling on the hash ring
# ---------------------------------------------------------------------------

_T24_K = 3
# salted portable 48-bit hash (t22's conv/0x-cast trick): same VALUE
# in both engines, different spelling
_T24_PRI_SQL = (
    "CAST(concat('0x', substring(md5('neg1' || CAST(doc_id AS VARCHAR)),"
    " 1, 12)) AS BIGINT)"
)

_T24_ORACLE = f"""
    WITH d AS (
      SELECT doc_id, md5(text) AS grp, {_T24_PRI_SQL} AS pri
      FROM documents WHERE text IS NOT NULL),
    p AS (
      SELECT doc_id, grp,
        ROW_NUMBER() OVER (ORDER BY pri, doc_id) AS pos,
        COUNT(*) OVER () AS n
      FROM d),
    offs AS (SELECT * FROM (VALUES (1), (2), (3)) AS t(j)),
    cand AS (
      SELECT a.doc_id AS anchor_id, offs.j AS j,
        ((a.pos - 1 + offs.j) % a.n) + 1 AS tpos, a.grp AS agrp
      FROM p a CROSS JOIN offs)
    SELECT c.anchor_id, CAST(c.j AS BIGINT) AS j, b.doc_id AS neg_id
    FROM cand c JOIN p b ON b.pos = c.tpos AND b.grp <> c.agrp
"""


@register("t24_contrastive_negatives", oracle=_T24_ORACLE)
def t24_contrastive_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k=3 deterministic negatives per anchor document for contrastive
    training: docs are arranged on a ring ordered by a salted portable
    hash; each anchor takes its next k ring successors whose exact-dup
    group (md5 of the text) differs — a same-content doc can never be
    drawn as its own "negative". See the module docstring for why the
    ring form is the 100-TB shape (prefix-sum positions + equality
    join on dense ints; no cross join, no rejection loop)."""
    from ..operators.sampling import prefix_sum

    pin_semantics(spark)
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    base = docs.select(
        "doc_id",
        F.md5("text").alias("grp"),
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("neg1"), F.col("doc_id").cast("string"))),
                1,
                12,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("pri"),
        F.lit(1).alias("_one"),
    )
    # pos = inclusive count prefix in (pri, doc_id) order == the global
    # ring position, via the bucketed two-pass prefix sum (no
    # single-task window); lineage-truncated because it fans out THREE
    # ways below (count, anchors, ring targets) — without the cut each
    # branch re-derived the md5/conv priority subtree and the query
    # re-scanned `documents` 12× (the x29 inventory lesson)
    from ..operators.util import truncate_lineage

    pos = truncate_lineage(
        prefix_sum(base, "pri", "_one", "pos", tiebreak_cols=["doc_id"]).select(
            "doc_id", "grp", F.col("pos").cast("bigint").alias("pos")
        )
    )
    n = pos.agg(F.count(F.lit(1)).alias("_n"))
    offs = F.explode(
        F.array(*[F.lit(j) for j in range(1, _T24_K + 1)])
    ).alias("j")
    anchors = (
        pos.join(F.broadcast(n))
        .select(
            F.col("doc_id").alias("anchor_id"),
            F.col("grp").alias("agrp"),
            "pos",
            "_n",
            offs,
        )
        .select(
            "anchor_id",
            "agrp",
            F.col("j").cast("long").alias("j"),
            ((F.col("pos") - 1 + F.col("j")) % F.col("_n") + 1).alias("tpos"),
        )
    )
    b = pos.select(
        F.col("pos").alias("tpos"),
        F.col("doc_id").alias("neg_id"),
        F.col("grp").alias("bgrp"),
    )
    return (
        anchors.join(b, "tpos")
        .filter(F.col("bgrp") != F.col("agrp"))
        .select("anchor_id", "j", "neg_id")
    )
