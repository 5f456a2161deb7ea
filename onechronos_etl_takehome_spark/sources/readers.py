"""Readers for dirty external data.

The reference ingests every CSV column as StringType — header=true, no
inferSchema (etl_pipeline.py:66-91) — and types lazily with non-ANSI
casts so malformed values become NULL rather than errors. We keep that
contract but make it explicit and deterministic: the schema is declared
(all strings), never inferred, so a malformed file cannot silently shift
types between runs.

Scale posture: schema declaration also avoids the inferSchema extra
pass (a full scan) — at 100 TB an inference pass is a second read of
the dataset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType


def all_string_schema(columns: list[str]) -> StructType:
    return StructType([StructField(c, StringType(), True) for c in columns])


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan (Spark-native reader): schema from file metadata,
    filter pushdown + column pruning like parquet."""
    return spark.read.orc(path)


def read_dirty_csv(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
    *,
    rename: dict[str, str] | None = None,
) -> DataFrame:
    """Header CSV → all-string DataFrame (reference S1-S3 semantics).

    ``columns``: when given, the declared header order — read uses this
    exact all-string schema (no inference pass). When None, one cheap
    header-line read infers names only (types stay string).
    ``rename``: optional column renames applied on ingest (the reference
    aliases counterparty columns to cp_* at etl_pipeline.py:76-84).
    """
    reader = spark.read.option("header", True)
    if columns is not None:
        df = reader.schema(all_string_schema(columns)).csv(path)
    else:
        df = reader.csv(path)  # names from header; types default string
    if rename:
        df = df.withColumnsRenamed(rename)
    return df
