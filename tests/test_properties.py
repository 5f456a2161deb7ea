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
