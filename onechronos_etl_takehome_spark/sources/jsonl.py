"""JSONL (newline-delimited JSON) corpus ingestion.

Raw training-data drops arrive as JSONL with a documented schema and a
real-world defect rate — truncated lines, bad escapes, schema drift.
The reader therefore:

- applies the EXPLICIT schema (no inference pass — inference reads the
  whole input twice and locks in whatever the first drop looked like);
- runs PERMISSIVE: a malformed line becomes a row with every data
  column NULL and the raw line preserved in ``_corrupt_record`` for
  quarantine, mirroring the reconciliation pipeline's exceptions-sink
  philosophy (bad input is data, not an exception);
- ``split_corrupt`` separates good rows from quarantine rows as two
  DataFrames over one scan lineage.

Writing uses Spark's native JSON sink (one JSON object per line — the
same format back out), partitioned like every other sink here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructType

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType | str
) -> DataFrame:
    """Schema-first permissive JSONL scan with corrupt-line capture."""
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if CORRUPT_COL not in schema.fieldNames():
        schema = schema.add(CORRUPT_COL, StringType())
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good_rows_without_corrupt_col, quarantine_rows).

    Spark refuses a query that references only ``_corrupt_record``
    from an uncached permissive scan (the parser would have nothing to
    fail on), so the split is served from one cached frame — also the
    right call operationally: one scan feeds both outputs.
    """
    cached = df.cache()
    good = cached.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = cached.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return good, bad


def write_jsonl(
    df: DataFrame,
    path: str,
    *,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.json(path)
