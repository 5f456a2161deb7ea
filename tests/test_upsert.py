"""Keyed upsert (MERGE) semantics: insert/update/delete, MERGE-style
NULL overwrite, idempotent re-application, atomic version publish."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from onechronos_etl_takehome_spark.sources.upsert import (
    list_versions,
    read_keyed_table,
    upsert,
    vacuum,
)

SCHEMA = "doc_id long, text string, score double"


def _rows(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _snapshot(spark, path):
    return {
        (r.doc_id, r.text, r.score)
        for r in read_keyed_table(spark, path).collect()
    }


def test_time_travel_reads(spark, tmp_path):
    """Each committed version stays readable until vacuumed; a missing
    version is a clear error, not an empty frame."""
    path = str(tmp_path / "tbl")
    upsert(spark, path, _rows(spark, [(1, "a", 1.0)]), ["doc_id"])
    upsert(spark, path, _rows(spark, [(1, "a2", 2.0), (2, "b", 1.0)]), ["doc_id"])
    assert list_versions(path) == [0, 1]

    v0 = {(r.doc_id, r.text) for r in read_keyed_table(spark, path, version=0).collect()}
    assert v0 == {(1, "a")}
    latest = {(r.doc_id, r.text) for r in read_keyed_table(spark, path).collect()}
    assert latest == {(1, "a2"), (2, "b")}

    vacuum(path, keep=1)
    assert list_versions(path) == [1]
    with pytest.raises(FileNotFoundError):
        read_keyed_table(spark, path, version=0)


def test_upsert_insert_update_passthrough(spark, tmp_path):
    path = str(tmp_path / "tbl")
    r0 = upsert(spark, path, _rows(spark, [(1, "a", 1.0), (2, "b", 2.0)]), ["doc_id"])
    assert r0 == {"version": 0, "rows": 2}

    # 1 updated (NULL score must win — MERGE takes the update row
    # wholesale), 3 inserted, 2 passes through untouched.
    r1 = upsert(
        spark, path, _rows(spark, [(1, "a2", None), (3, "c", 3.0)]), ["doc_id"]
    )
    assert r1 == {"version": 1, "rows": 3}
    assert _snapshot(spark, path) == {
        (1, "a2", None),
        (2, "b", 2.0),
        (3, "c", 3.0),
    }


def test_upsert_idempotent_reapplication(spark, tmp_path):
    path = str(tmp_path / "tbl")
    upsert(spark, path, _rows(spark, [(1, "a", 1.0), (2, "b", 2.0)]), ["doc_id"])
    updates = _rows(spark, [(2, "b2", None), (9, "z", 9.0)])
    upsert(spark, path, updates, ["doc_id"])
    first = _snapshot(spark, path)
    r = upsert(spark, path, updates, ["doc_id"])  # replay the same merge
    assert _snapshot(spark, path) == first and r["rows"] == len(first)


def test_upsert_deletes(spark, tmp_path):
    path = str(tmp_path / "tbl")
    upsert(
        spark,
        path,
        _rows(spark, [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)]),
        ["doc_id"],
    )
    updates = _rows(spark, [(2, "b2", 2.5), (3, None, None), (4, "d", 4.0)])
    updates = updates.withColumn("is_deleted", F.col("doc_id") == 3)
    upsert(spark, path, updates, ["doc_id"], delete_col="is_deleted")
    assert _snapshot(spark, path) == {
        (1, "a", 1.0),
        (2, "b2", 2.5),
        (4, "d", 4.0),
    }


def test_upsert_schema_mismatch_rejected(spark, tmp_path):
    path = str(tmp_path / "tbl")
    upsert(spark, path, _rows(spark, [(1, "a", 1.0)]), ["doc_id"])
    bad = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="schema mismatch"):
        upsert(spark, path, bad, ["doc_id"])


def test_upsert_versions_and_vacuum(spark, tmp_path):
    path = str(tmp_path / "tbl")
    upsert(spark, path, _rows(spark, [(1, "a", 1.0)]), ["doc_id"])
    upsert(spark, path, _rows(spark, [(2, "b", 2.0)]), ["doc_id"])
    upsert(spark, path, _rows(spark, [(3, "c", 3.0)]), ["doc_id"])
    assert sorted(d for d in os.listdir(path) if d.startswith("v=")) == [
        "v=0",
        "v=1",
        "v=2",
    ]
    assert vacuum(path, keep=1) == [0, 1]
    assert sorted(d for d in os.listdir(path) if d.startswith("v=")) == ["v=2"]
    assert len(_snapshot(spark, path)) == 3  # current version untouched
