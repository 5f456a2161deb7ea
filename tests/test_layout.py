"""Data-layout maintenance: compaction + range-partitioned writes."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from onechronos_etl_takehome_spark.sources.layout import (
    compact_parquet,
    parquet_dir_bytes,
    write_range_partitioned,
)

SF_DIR = "/root/testdata/sf0.001"


def _parquet_files(path: str) -> list[str]:
    return sorted(glob.glob(os.path.join(path, "*.parquet")))


def load_events(spark):
    from onechronos_etl_takehome_spark.session import pin_semantics
    from onechronos_etl_takehome_spark.sources.tables import load_table

    pin_semantics(spark)
    # sf0.01 for enough rows per file at n_files=16
    return load_table(spark, "/root/testdata/sf0.01", "events")


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    docs.repartition(64).write.parquet(src)
    assert len(_parquet_files(src)) == 64

    # Target = all input bytes in one file.
    n = compact_parquet(
        spark, src, dst, target_file_bytes=2 * parquet_dir_bytes(src)
    )
    assert n == 1
    assert len(_parquet_files(dst)) == 1
    # Row-level parity, not just counts.
    assert (
        spark.read.parquet(dst).exceptAll(docs).count() == 0
        and docs.exceptAll(spark.read.parquet(dst)).count() == 0
    )


def test_compact_parquet_targets_file_size(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    docs.repartition(16).write.parquet(src)
    total = parquet_dir_bytes(src)
    n = compact_parquet(spark, src, dst, target_file_bytes=total // 4 + 1)
    assert n == 4
    assert len(_parquet_files(dst)) == 4


def _avg_span_fraction(spark, path: str, col: str) -> float:
    """Mean per-file (max-min) span as a fraction of the global span —
    the file-pruning power of the layout for range predicates on col."""
    lo_g, hi_g, total = None, None, 0.0
    files = _parquet_files(path)
    for f in files:
        r = spark.read.parquet(f).agg(F.min(col), F.max(col)).collect()[0]
        lo, hi = float(r[0]), float(r[1])
        total += hi - lo
        lo_g = lo if lo_g is None else min(lo_g, lo)
        hi_g = hi if hi_g is None else max(hi_g, hi)
    return total / len(files) / (hi_g - lo_g)


def test_zorder_narrows_every_dimension(spark, tmp_path):
    """Morton layout: per-file ranges are narrow in BOTH columns, so
    footer min/max prunes files for predicates on either; a linear
    sort only prunes its leading column (measured here: ~0.06 on the
    sort key but ~0.67 on the other)."""
    from onechronos_etl_takehome_spark.sources.layout import write_zordered

    events = load_events(spark).select("event_id", "user_id", "value")
    zpath = str(tmp_path / "zorder")
    lpath = str(tmp_path / "linear")
    write_zordered(events, zpath, ["user_id", "value"], n_files=16)
    write_range_partitioned(events, lpath, ["user_id"], n_files=16)

    for col in ("user_id", "value"):
        assert _avg_span_fraction(spark, zpath, col) < 0.45, col
    # The contrast: linear is useless on the non-sort column.
    assert _avg_span_fraction(spark, lpath, "value") > 0.5
    # Layout rewrites lose nothing.
    assert spark.read.parquet(zpath).count() == events.count()


def test_range_partitioned_files_do_not_overlap(spark, tmp_path):
    dst = str(tmp_path / "ranged")
    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    write_range_partitioned(orders, dst, ["o_orderkey"], n_files=4)

    files = _parquet_files(dst)
    assert len(files) == 4
    spans = []
    for f in files:
        row = (
            spark.read.parquet(f)
            .agg(F.min("o_orderkey"), F.max("o_orderkey"))
            .collect()[0]
        )
        spans.append((row[0], row[1]))
    spans.sort()
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi < lo, f"file key ranges overlap: {spans}"
    # Nothing lost in the rewrite.
    assert spark.read.parquet(dst).count() == orders.count()
