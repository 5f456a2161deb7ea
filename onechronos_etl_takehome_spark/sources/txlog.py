"""ACID table format: file-level transaction log with snapshot reads,
time travel, copy-on-write deletes, and optimistic concurrency — the
Delta/Iceberg commit-protocol shape, engine-native.

``sources/upsert.py`` already gives MERGE semantics by rewriting the
WHOLE table per version; this module is the missing file-granular
half a 100-TB table actually needs — a delete that touches 0.1% of
rows must rewrite 0.1% of files, not the table:

- **Log**: ``<path>/_txlog/<version 08d>.json``, one manifest per
  commit, each a list of actions ``{"add": file, "rows": n}`` /
  ``{"remove": file}``. A snapshot at version v is the fold of
  actions 0..v — the live file SET, reconstructed from metadata only
  (no data read). Data files are immutable; nothing is ever modified
  in place, so readers at any version see a complete, consistent
  table (snapshot isolation) and a crashed writer leaves at most an
  orphaned data file, never a torn table.
- **Commit protocol**: write the manifest to a private temp name,
  then ``os.link`` it to ``<version>.json`` — link fails with EEXIST
  if another writer committed that version first (POSIX exclusive
  create; on an object store this is the conditional PUT every table
  format builds on). The loser re-reads the log, re-validates its
  transaction against the new snapshot, and retries at version+1 —
  textbook optimistic concurrency, exercised by a real two-writer
  race in tests/test_txlog.py.
- **Copy-on-write delete**: scan ONLY file provenance
  (``input_file_name`` over the live set) to find files containing
  matching rows; rewrite those files without the matching rows;
  commit remove(old)+add(new) atomically. Untouched files (the vast
  majority under selective predicates — partition-style pruning
  composes upstream) are carried by reference.
- **Time travel**: ``read(version=v)`` folds the log prefix. The x34
  catalog row hash-matches reads at THREE versions against a DuckDB
  oracle recomputing each state from the raw table — the
  cross-engine proof that append/delete/snapshot semantics are exact.

Scale posture: the log is metadata-plane (one JSON per commit, one
row per FILE action — the x29 compaction-planning regime); snapshot
resolution is a driver-side fold of manifest lists, O(commits +
files), exactly what Delta's log replay is before checkpointing; data
moves only through immutable parquet adds. Known beyond-scope bits,
honestly: no manifest checkpointing (fold cost grows with commit
count; Delta solves with _checkpoint parquet every N commits — same
fold, materialized), and exclusive-create needs a POSIX/HDFS-like FS
or a conditional-PUT object store.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LOG_DIR = "_txlog"


class CommitConflict(Exception):
    """Another writer committed this version first — re-validate and
    retry against the new snapshot."""


def _log_path(path: str) -> str:
    return os.path.join(path, _LOG_DIR)


def committed_versions(path: str) -> list[int]:
    d = _log_path(path)
    if not os.path.isdir(d):
        return []
    return sorted(
        int(f[:-5])
        for f in os.listdir(d)
        if f.endswith(".json") and f[:-5].isdigit()
    )


def _commit(
    path: str, version: int, actions: list[dict], extra: dict | None = None
) -> None:
    """Exclusive-create commit of one manifest; raises CommitConflict
    if ``version`` is already taken. ``extra`` merges additional
    manifest fields (the streaming sink stamps ``batch_id``)."""
    d = _log_path(path)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
    manifest = {"version": version, "ts": time.time(), "actions": actions}
    if extra:
        manifest.update(extra)
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    target = os.path.join(d, f"{version:08d}.json")
    try:
        os.link(tmp, target)  # atomic create-if-absent (POSIX)
    except FileExistsError:
        raise CommitConflict(f"version {version} already committed")
    finally:
        os.unlink(tmp)


def _commit_with_batch(
    path: str, version: int, actions: list[dict], batch_id: int
) -> None:
    """Commit carrying a streaming batch_id (see streaming/
    txlog_stream.py — the idempotence key for exactly-once appends)."""
    _commit(path, version, actions, extra={"batch_id": batch_id})


def live_files(path: str, *, version: int | None = None) -> dict[str, int]:
    """Fold the log through ``version`` (latest if None) → {data file
    name: row count}. Metadata-only; raises on an unknown version."""
    versions = committed_versions(path)
    if not versions:
        raise ValueError(f"not a txlog table (no commits): {path}")
    if version is None:
        version = versions[-1]
    elif version not in versions:
        raise ValueError(f"version {version} not in {versions}")
    live: dict[str, int] = {}
    for v in versions:
        if v > version:
            break
        with open(os.path.join(_log_path(path), f"{v:08d}.json")) as f:
            manifest = json.load(f)
        for a in manifest["actions"]:
            if "add" in a:
                live[a["add"]] = a.get("rows", -1)
            elif "remove" in a:
                live.pop(a["remove"], None)
    return live


def _stage_data(df: DataFrame, path: str) -> list[tuple[str, int]]:
    """Write ``df``'s rows as immutable parquet files under the table
    root with collision-free names; returns [(file name, rows)].
    Files are invisible to readers until a manifest references them —
    a crashed writer orphans bytes, never corrupts the table."""
    import pyarrow.parquet as pq

    stage = os.path.join(path, f"_stage-{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(stage)
    out = []
    for fname in sorted(os.listdir(stage)):
        if not fname.endswith(".parquet"):
            continue
        final = f"part-{uuid.uuid4().hex}.parquet"
        src = os.path.join(stage, fname)
        # footer metadata only — no data read for the manifest stats
        rows = pq.ParquetFile(src).metadata.num_rows
        os.rename(src, os.path.join(path, final))
        out.append((final, rows))
    shutil.rmtree(stage, ignore_errors=True)
    return out


def create_table(df: DataFrame, path: str) -> int:
    """Commit version 0 with ``df``'s data. Fails if the table exists."""
    os.makedirs(path, exist_ok=True)
    if committed_versions(path):
        raise ValueError(f"table already exists: {path}")
    adds = _stage_data(df, path)
    _commit(path, 0, [{"add": f, "rows": n} for f, n in adds])
    return 0


def append(df: DataFrame, path: str, *, max_retries: int = 5) -> int:
    """Append-only commit: stages data once, then retries the (cheap)
    manifest link under contention — appends never conflict
    semantically, so the retry needs no re-validation."""
    adds = [{"add": f, "rows": n} for f, n in _stage_data(df, path)]
    for _ in range(max_retries):
        version = committed_versions(path)[-1] + 1
        try:
            _commit(path, version, adds)
            return version
        except CommitConflict:
            continue
    raise CommitConflict(f"lost {max_retries} append races on {path}")


def read_table(
    spark: SparkSession, path: str, *, version: int | None = None
) -> DataFrame:
    """Snapshot read at ``version`` (latest if None): the live file
    set resolved from the log, read as one parquet scan.
    ``mergeSchema`` composes schema evolution across commits exactly
    as sources/partitioned.py's x33 does for raw layouts."""
    files = [os.path.join(path, f) for f in sorted(live_files(path, version=version))]
    if not files:
        raise ValueError(f"version has no live files: {path}@{version}")
    return spark.read.option("mergeSchema", "true").parquet(*files)


def delete_where(
    spark: SparkSession, path: str, condition, *, max_retries: int = 3
) -> int:
    """Copy-on-write DELETE: rewrite ONLY the live files that contain
    matching rows; untouched files carry by reference. One
    provenance scan (input_file_name over the snapshot) finds the
    touched set; the rewrite reads just those files."""
    for _ in range(max_retries):
        base = committed_versions(path)[-1]
        snapshot = live_files(path, version=base)
        paths = [os.path.join(path, f) for f in sorted(snapshot)]
        touched = [
            os.path.basename(r["f"])
            for r in spark.read.parquet(*paths)
            .filter(condition)
            .select(
                F.element_at(F.split(F.input_file_name(), "/"), -1).alias("f")
            )
            .distinct()
            .collect()  # bounded: one row per TOUCHED FILE (metadata-plane)
        ]
        actions: list[dict] = [{"remove": f} for f in touched]
        if touched:
            keep = (
                spark.read.parquet(
                    *[os.path.join(path, f) for f in sorted(touched)]
                )
                .filter(~condition)
            )
            actions += [
                {"add": f, "rows": n} for f, n in _stage_data(keep, path)
            ]
        try:
            _commit(path, base + 1, actions)
            return base + 1
        except CommitConflict:
            continue  # re-resolve the snapshot and re-plan
    raise CommitConflict(f"lost {max_retries} delete races on {path}")


def vacuum(path: str, *, keep_versions: int = 2) -> list[str]:
    """Physically remove data files referenced ONLY by versions older
    than the last ``keep_versions`` commits (they are unreachable
    from any retained snapshot). Returns the removed names."""
    versions = committed_versions(path)
    if len(versions) <= 1:
        return []
    retained = versions[-keep_versions:]
    reachable: set[str] = set()
    for v in retained:
        reachable |= set(live_files(path, version=v))
    removed = []
    for fname in os.listdir(path):
        if (
            fname.endswith(".parquet")
            and fname.startswith("part-")
            and fname not in reachable
        ):
            os.unlink(os.path.join(path, fname))
            removed.append(fname)
    return sorted(removed)
