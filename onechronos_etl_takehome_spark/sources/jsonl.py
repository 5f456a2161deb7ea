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


def read_jsonl_stream(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    *,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming twin of ``read_jsonl``: a file-drop directory becomes
    a stream, new JSONL files become microbatches, corrupt lines ride
    along in ``_corrupt_record`` for the quarantining sink."""
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if CORRUPT_COL not in schema.fieldNames():
        schema = schema.add(CORRUPT_COL, StringType())
    reader = spark.readStream.schema(schema).option(
        "columnNameOfCorruptRecord", CORRUPT_COL
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path)


def write_stream_quarantined(
    df: DataFrame,
    good_path: str,
    bad_path: str,
    checkpoint: str,
    *,
    available_now: bool = True,
):
    """Quarantining streaming sink: each microbatch splits into parsed
    rows → ``good_path`` and corrupt raw lines → ``bad_path``, each
    written idempotently as a ``batch_id=<n>`` directory (replayed
    batches rewrite in place — same contract as write_stream_parquet).
    Inside foreachBatch the frame is a batch frame, so the cached
    split (``split_corrupt``) applies as-is."""
    import os

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        good, bad = split_corrupt(batch_df)
        good.write.mode("overwrite").parquet(
            os.path.join(good_path, f"batch_id={batch_id}")
        )
        bad.write.mode("overwrite").parquet(
            os.path.join(bad_path, f"batch_id={batch_id}")
        )
        batch_df.unpersist()

    writer = df.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


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
