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


def read_xml(
    spark: SparkSession,
    path: str,
    *,
    row_tag: str = "row",
    schema: StructType | None = None,
) -> DataFrame:
    """XML scan (Spark 4 built-in ``xml`` source): one row per
    ``row_tag`` element.  Feed/vendor-drop ingestion — the format a
    Spark-first engine still has to read, not one it should write hot
    data in (no columnar pruning or predicate pushdown; the scan
    parses every element).  Pass ``schema`` to skip the inference pass
    — like CSV, inference is a second full read of the dataset."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


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


def read_binary_dir(
    spark: SparkSession,
    path: str,
    *,
    glob: str | None = None,
    modality_from_extension: bool = True,
) -> DataFrame:
    """Opaque media ingestion via Spark's built-in ``binaryFile``
    source: (id, content, modality, n_bytes, mtime) — the real-world
    entry point for the multimodal operators (operators/multimodal.py
    consumes the same (id, content, modality) shape that
    ``attach_binary`` fabricates for the parquet demo corpus).

    ``id`` is the file path (stable, unique); ``modality`` maps from
    the extension (image/audio/video/text/binary). Scale notes: the
    source lists files distributed, prunes on ``pathGlobFilter``
    BEFORE reading bytes, and each file lands in one row — pair with
    sources/layout.py compaction for many-small-file corpora;
    ``spark.sql.files.maxPartitionBytes`` governs batching as usual.
    """
    from pyspark.sql import functions as F

    ext_map = {
        "jpg": "image", "jpeg": "image", "png": "image", "gif": "image",
        "wav": "audio", "mp3": "audio", "flac": "audio",
        "mp4": "video", "mkv": "video", "webm": "video",
        "txt": "text", "md": "text",
    }
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    ext = F.lower(F.regexp_extract(F.col("path"), r"\.([A-Za-z0-9]+)$", 1))
    modality = F.lit("binary")
    if modality_from_extension:
        mapping = F.create_map(
            *[F.lit(x) for kv in ext_map.items() for x in kv]
        )
        modality = F.coalesce(mapping[ext], F.lit("binary"))
    return df.select(
        F.col("path").alias("id"),
        F.col("content"),
        modality.alias("modality"),
        F.col("length").alias("n_bytes"),
        F.col("modificationTime").alias("mtime"),
    )


def read_text_corpus(
    spark: SparkSession, path: str, *, mode: str = "file"
) -> DataFrame:
    """Raw ``.txt`` corpus ingestion — the classic LLM-data entry path.

    - ``mode="file"``: one document per file (``wholetext``) —
      ``(doc_path, text)``, identity = the file path.  Right for
      article/book-shaped corpora.  Scale note: a wholetext file is
      one task and must fit one executor's memory; shard giant files
      upstream or use line mode.
    - ``mode="line"``: one record per line — ``(doc_path, text)``,
      splittable (a big file parallelizes across tasks).  Deliberately
      returns NO synthetic line-number id: Spark's text source gives
      no stable intra-file ordering once a file splits, so any
      generated id would be partitioning-dependent.  Line-addressed
      corpora should carry identity in the data itself (use the JSONL
      reader, ``sources/jsonl.py``) or derive content-addressed ids
      downstream (``xxhash64(doc_path, text)`` + dedup, the d01 shape).
    """
    from pyspark.sql import functions as F

    if mode not in ("file", "line"):
        raise ValueError(f"mode must be 'file' or 'line', got {mode!r}")
    return spark.read.text(path, wholetext=(mode == "file")).select(
        F.input_file_name().alias("doc_path"), F.col("value").alias("text")
    )
