"""Property-based (hypothesis) tests: engine operators vs pure-Python
models under adversarial inputs.

Each example runs real Spark jobs, so example counts are deliberately
small — the value is the generator exploring duplicate keys, NULLs,
empty batches, and unicode, not volume. Session-scoped spark fixture is
fetched lazily inside each test body (hypothesis forbids function-level
fixture injection alongside given())."""

from __future__ import annotations

import hashlib
import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from onechronos_etl_takehome_spark.operators.dedup import deterministic_dedup
from onechronos_etl_takehome_spark.pipeline.corpus import hash_split
from onechronos_etl_takehome_spark.session import get_spark
from onechronos_etl_takehome_spark.sources.upsert import read_keyed_table, upsert

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

_text = st.text(
    alphabet=st.characters(codec="utf-8", exclude_characters="\x00"),
    max_size=12,
)


def _spark():
    return get_spark("tests", shuffle_partitions=8)


# ---------------------------------------------------------------------------
# deterministic_dedup == min-row-per-key, invariant to order/partitioning
# ---------------------------------------------------------------------------


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), _text, st.integers(-100, 100)),
        min_size=1,
        max_size=25,
    ),
    seed=st.randoms(),
)
def test_deterministic_dedup_matches_min_row_model(rows, seed):
    spark = _spark()
    model: dict[int, tuple] = {}
    for r in rows:
        if r[0] not in model or (r[1], r[2]) < model[r[0]][1:]:
            model[r[0]] = r

    shuffled = list(rows)
    seed.shuffle(shuffled)
    for npart in (1, 7):
        df = spark.createDataFrame(
            shuffled, "k int, s string, v int"
        ).repartition(npart)
        got = {
            (r.k, r.s, r.v)
            for r in deterministic_dedup(
                df, ["k"], [F.col("s"), F.col("v")]
            ).collect()
        }
        assert got == set(model.values())


# ---------------------------------------------------------------------------
# hash_split == Python md5-bucket model; pure function of the id
# ---------------------------------------------------------------------------


@SETTINGS
@given(ids=st.lists(st.integers(0, 10**9), unique=True, min_size=1, max_size=40))
def test_hash_split_matches_md5_model(ids):
    spark = _spark()
    weights = {"train": 8, "val": 1, "test": 1}

    def model(i: int) -> str:
        b = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 10
        return "train" if b < 8 else ("val" if b == 8 else "test")

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r.doc_id: r.split
        for r in hash_split(df, id_col="doc_id", weights=weights).collect()
    }
    assert got == {i: model(i) for i in ids}


# ---------------------------------------------------------------------------
# upsert == dict-fold model over a sequence of keyed batches
# ---------------------------------------------------------------------------


@SETTINGS
@given(
    batches=st.lists(
        st.dictionaries(
            st.integers(0, 9),  # key
            st.tuples(_text, st.booleans()),  # (text, is_delete)
            min_size=1,
            max_size=6,
        ),
        min_size=1,
        max_size=4,
    )
)
def test_upsert_matches_dict_fold_model(batches):
    spark = _spark()
    path = tempfile.mkdtemp(prefix="upsert_prop_")
    try:
        model: dict[int, str] = {}
        for batch in batches:
            rows = [(k, t, d) for k, (t, d) in batch.items()]
            updates = spark.createDataFrame(
                rows, "doc_id long, text string, is_deleted boolean"
            )
            upsert(spark, path, updates, ["doc_id"], delete_col="is_deleted")
            for k, (t, d) in batch.items():
                if d:
                    model.pop(k, None)
                else:
                    model[k] = t
        got = {
            r.doc_id: r.text for r in read_keyed_table(spark, path).collect()
        }
        assert got == model
    finally:
        shutil.rmtree(path, ignore_errors=True)


# ---------------------------------------------------------------------------
# duplicate_ngram_spans == python island-merge model
# ---------------------------------------------------------------------------


def _span_model(docs: list[tuple[int, str]], n: int) -> set[tuple]:
    import collections

    grams = collections.defaultdict(set)  # gram -> {doc_id}
    pos = collections.defaultdict(list)  # doc -> [(pos, gram)]
    for did, text in docs:
        toks = text.split(" ")
        if len(toks) < n:
            continue
        for i in range(len(toks) - n + 1):
            g = " ".join(toks[i : i + n])
            grams[g].add(did)
            pos[did].append((i + 1, g))
    out = set()
    for did, pg in pos.items():
        dup = sorted(p for p, g in pg if len(grams[g]) >= 2)
        if not dup:
            continue
        start = prev = dup[0]
        cnt = 1
        for p in dup[1:]:
            if p - prev > n:
                out.add((did, start, prev + n - 1, prev + n - start, cnt))
                start, cnt = p, 0
            prev = p
            cnt += 1
        out.add((did, start, prev + n - 1, prev + n - start, cnt))
    return out


@SETTINGS
@given(
    docs=st.lists(
        st.tuples(
            st.integers(0, 9),
            st.lists(
                st.sampled_from(["aa", "bb", "cc"]), min_size=1, max_size=8
            ).map(" ".join),
        ),
        min_size=2,
        max_size=8,
        unique_by=lambda t: t[0],
    ),
)
def test_duplicate_ngram_spans_matches_model(docs):
    from onechronos_etl_takehome_spark.operators.dedup import duplicate_ngram_spans

    spark = _spark()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens, r.n_dup_grams)
        for r in duplicate_ngram_spans(df, "doc_id", "text", n=2).collect()
    }
    assert got == _span_model(docs, 2)


# ---------------------------------------------------------------------------
# window_funnel == python first-attempt model
# ---------------------------------------------------------------------------


def _funnel_model(events, window_s):
    from collections import defaultdict

    by_user = defaultdict(list)
    for u, ts, typ in events:
        by_user[u].append((ts, typ))
    out = {}
    for u, ev in by_user.items():
        views = [t for t, y in ev if y == "view"]
        if not views:
            continue
        s1 = min(views)
        deadline = s1 + window_s
        clicks = [t for t, y in ev if y == "click" and s1 <= t <= deadline]
        s2 = min(clicks) if clicks else None
        s3 = None
        if s2 is not None:
            buys = [t for t, y in ev if y == "purchase" and s2 <= t <= deadline]
            s3 = min(buys) if buys else None
        out[u] = (s1, s2, s3, 1 + (s2 is not None) + (s3 is not None))
    return out


@SETTINGS
@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 3),
            st.integers(0, 120),
            st.sampled_from(["view", "click", "purchase", "other"]),
        ),
        min_size=1,
        max_size=30,
    ),
)
def test_window_funnel_matches_model(events):
    from onechronos_etl_takehome_spark.operators.funnel import window_funnel

    spark = _spark()
    ev = spark.createDataFrame(
        [(u, t, y) for u, t, y in events], "user_id long, sec long, event_type string"
    ).select(
        "user_id",
        F.timestamp_seconds(F.col("sec")).alias("ts"),
        "event_type",
    )
    steps = [F.col("event_type") == s for s in ["view", "click", "purchase"]]

    def _epoch(ts):
        # collected timestamps are naive in the pinned UTC session TZ
        import datetime as dt

        return int(ts.replace(tzinfo=dt.timezone.utc).timestamp()) if ts else None

    got = {
        r.user_id: (
            _epoch(r.step1_ts),
            _epoch(r.step2_ts),
            _epoch(r.step3_ts),
            r.funnel_depth,
        )
        for r in window_funnel(
            ev, "user_id", "ts", steps, "INTERVAL 60 SECONDS"
        ).collect()
    }
    assert got == _funnel_model(events, 60)


# ---------------------------------------------------------------------------
# prefix-filtered Jaccard == full inverted-index Jaccard, on ANY corpus
# ---------------------------------------------------------------------------


@SETTINGS
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=10).map(
            " ".join
        ),
        min_size=1,
        max_size=12,
    ),
    threshold=st.sampled_from([0.3, 0.5, 0.8]),
)
def test_prefix_jaccard_matches_full_join_model(docs, threshold):
    """The prefix filter must be lossless for ANY corpus and threshold:
    exact same pair set and scores as the full inverted-index join.
    Tiny word alphabet forces heavy shingle sharing — the regime where
    an off-by-one prefix length would actually drop pairs."""
    from onechronos_etl_takehome_spark.operators.dedup import (
        ngram_jaccard_pairs,
        prefix_jaccard_pairs,
    )

    spark = _spark()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id int, text string"
    )
    kw = dict(n=2, threshold=threshold)
    full = {
        (r.id_a, r.id_b, r.jaccard)
        for r in ngram_jaccard_pairs(df, "doc_id", "text", **kw).collect()
    }
    pref = {
        (r.id_a, r.id_b, r.jaccard)
        for r in prefix_jaccard_pairs(df, "doc_id", "text", **kw).collect()
    }
    assert pref == full


# ---------------------------------------------------------------------------
# unigram LM score == dict-fold model
# ---------------------------------------------------------------------------


@SETTINGS
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcd"), min_size=1, max_size=8).map(" ".join),
        min_size=1,
        max_size=10,
    )
)
def test_unigram_lm_matches_dict_model(docs):
    from collections import Counter

    from onechronos_etl_takehome_spark.operators.text import unigram_lm_scores

    spark = _spark()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id int, text string"
    )
    counts = Counter(w for t in docs for w in t.split(" "))
    total = sum(counts.values())
    got = {
        r.doc_id: (r.n_tokens, r.sum_tf, r.mean_token_prob)
        for r in unigram_lm_scores(df, "doc_id", "text").collect()
    }
    for i, t in enumerate(docs):
        toks = t.split(" ")
        sum_tf = sum(counts[w] for w in toks)
        assert got[i] == (len(toks), sum_tf, sum_tf / (len(toks) * total))


# ---------------------------------------------------------------------------
# x11 burst throttle == per-group fold model; x10 resample == dict model
# ---------------------------------------------------------------------------


def _stage_events(spark, rows, tmp):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        rows,
        "event_id long, minute long, user_id long, event_type string, value double",
    ).select(
        "event_id",
        F.expr("timestamp'2024-03-01 00:00:00' + make_interval(0,0,0,0,0,minute,0)").alias("ts"),
        "user_id",
        "event_type",
        "value",
        F.lit(None).cast("string").alias("props"),
    )
    df.write.mode("overwrite").parquet(tmp + "/events.parquet")


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 10**6),  # minute offset (collisions likely small)
            st.integers(0, 2),      # user
            st.sampled_from(["a", "b"]),
            st.integers(-5, 5),
        ),
        min_size=1,
        max_size=20,
        unique_by=lambda t: t,
    )
)
def test_burst_throttle_matches_fold_model(rows):
    import tempfile

    from onechronos_etl_takehome_spark.plans import QUERIES

    spark = _spark()
    staged = [
        (i, minute, user, etype, float(v))
        for i, (minute, user, etype, v) in enumerate(rows)
    ]
    tmp = tempfile.mkdtemp(prefix="px11_")
    _stage_events(spark, staged, tmp)

    # model: fold per (user, type) in (ts, event_id) order; gap > 5
    # MINUTES (ts unit here: minutes) starts a new burst
    from collections import defaultdict

    groups = defaultdict(list)
    for eid, minute, user, etype, _v in staged:
        groups[(user, etype)].append((minute, eid))
    want = set()
    for (user, etype), evs in groups.items():
        evs.sort()
        bursts = []
        for m, eid in evs:
            if bursts and m - bursts[-1][-1][0] <= 5:
                bursts[-1].append((m, eid))
            else:
                bursts.append([(m, eid)])
        for b in bursts:
            want.add((user, etype, b[0][1], len(b)))

    got = {
        (r.user_id, r.event_type, r.first_event_id, r.burst_size)
        for r in QUERIES["x11_burst_throttle_dedup"](spark, tmp).collect()
    }
    assert got == want


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 6 * 24 * 60),  # minute offset within ~6 days
            st.integers(0, 1),            # user
            st.one_of(st.none(), st.integers(-5, 5)),
        ),
        min_size=1,
        max_size=15,
        unique_by=lambda t: t,
    )
)
def test_resample_ffill_matches_dict_model(rows):
    import datetime
    import tempfile

    from onechronos_etl_takehome_spark.plans import QUERIES

    spark = _spark()
    staged = [
        (i, minute, user, "a", None if v is None else float(v))
        for i, (minute, user, v) in enumerate(rows)
    ]
    tmp = tempfile.mkdtemp(prefix="px10_")
    _stage_events(spark, staged, tmp)

    base = datetime.date(2024, 3, 1)
    from collections import defaultdict

    per_user = defaultdict(list)
    for eid, minute, user, _t, v in staged:
        per_user[user].append((minute, eid, v))
    want = {}
    for user, evs in per_user.items():
        days = defaultdict(list)
        for minute, eid, v in evs:
            days[minute // (24 * 60)].append((minute, eid, v))
        d0, d1 = min(days), max(days)
        fill = None
        for d in range(d0, d1 + 1):
            todays = sorted(days.get(d, []))
            # the day's representative is the (ts, event_id)-MAX row's
            # value; the fill is last-IGNORENULLS over those, so a day
            # whose last row carries NULL does NOT update the fill
            if todays and todays[-1][2] is not None:
                fill = todays[-1][2]
            day_str = (base + datetime.timedelta(days=d)).strftime("%Y-%m-%d")
            want[(user, day_str)] = (len(todays), fill)

    got = {
        (r.user_id, r.day): (r.n_events, r.ffill_value)
        for r in QUERIES["x10_resample_ffill"](spark, tmp).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# FastSS edit-distance join == brute-force levenshtein filter (lossless
# k=1 blocking over arbitrary strings, incl. empty / 1-char / unicode)
# ---------------------------------------------------------------------------


from .conftest import py_levenshtein as _py_lev


@SETTINGS
@given(
    strings=st.lists(
        st.text(alphabet="ab01é", max_size=6), min_size=1, max_size=15
    )
)
def test_fastss_join_lossless_on_arbitrary_strings(strings):
    from onechronos_etl_takehome_spark.operators.strings import (
        edit_distance_join,
    )

    spark = _spark()
    rows = [(i, s) for i, s in enumerate(strings)]
    df = spark.createDataFrame(rows, "id long, s string")
    got = sorted(
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_join(df, "id", "s").collect()
    )
    want = sorted(
        (i, j, _py_lev(a, b))
        for i, a in rows
        for j, b in rows
        if i < j and _py_lev(a, b) <= 1
    )
    assert got == want


# ---------------------------------------------------------------------------
# segment_dedup vs a pure-Python first-occurrence model
# ---------------------------------------------------------------------------


@SETTINGS
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=1, max_size=7
        ),
        min_size=1,
        max_size=6,
    ),
    seg=st.integers(2, 3),
)
def test_segment_dedup_matches_python_model(docs, seg):
    """Tiny vocabulary + short docs force heavy segment collisions;
    the engine must agree with the obvious sequential model."""
    from onechronos_etl_takehome_spark.operators.text import segment_dedup

    spark = _spark()
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_segs, r.n_kept, r.cleaned_text)
        for r in segment_dedup(
            df, "doc_id", "text", seg_tokens=seg
        ).collect()
    }
    seen: set[str] = set()
    for i, toks in enumerate(docs):
        segs = [
            " ".join(toks[j : j + seg]) for j in range(0, len(toks), seg)
        ]
        kept = []
        for s in segs:
            if s not in seen:
                seen.add(s)
                kept.append(s)
        assert got[i] == (len(segs), len(kept), " ".join(kept)), i


# ---------------------------------------------------------------------------
# compaction_plan vs the sequential greedy model
# ---------------------------------------------------------------------------


@SETTINGS
@given(
    sizes=st.lists(st.integers(0, 300), min_size=1, max_size=12),
    target=st.integers(1, 200),
)
def test_compaction_plan_matches_python_model(sizes, target):
    from onechronos_etl_takehome_spark.operators.compaction import (
        compaction_plan,
    )

    spark = _spark()
    inv = spark.createDataFrame(
        [(f"f{i:03d}", i, s) for i, s in enumerate(sizes)],
        "file_id string, ord long, bytes long",
    )
    got = {
        r.file_id: r.bin_id
        for r in compaction_plan(
            inv, order_key="ord", target_bytes=target
        ).collect()
    }
    prior = 0
    for i, s in enumerate(sizes):
        assert got[f"f{i:03d}"] == prior // target, i
        prior += s
