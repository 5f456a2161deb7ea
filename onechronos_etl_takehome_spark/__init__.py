"""onechronos_etl_takehome_spark — a PySpark-native analytics engine.

A brand-new engine with the query & data-processing capabilities of the
reference repo (camrondennler/onechronos-etl-takehome), re-expressed
Spark-first:

- ``session``    — SparkSession factory pinning the semantics the engine
                   needs (UTC, non-ANSI casts, AQE).
- ``sources``    — schema'd readers (dirty all-string CSV, parquet star
                   schema) and scale-aware sinks (partitioned JSON/parquet
                   plus a small-result single-file mode).
- ``pipeline``   — the reference trade-reconciliation ETL, rebuilt as a
                   declarative rules engine with single-pass Observation
                   metrics (vs. the reference's 14 uncached actions,
                   etl_pipeline.py:94-393).
- ``operators``  — dedup (exact/MinHash-LSH/SimHash/n-gram Jaccard/
                   embedding-cosine), similarity search, as-of joins,
                   text analysis, multimodal column plumbing.
- ``plans``      — the relational query catalog exercised against a
                   DuckDB oracle.
- ``streaming``  — Structured Streaming variants (watermarked windows,
                   streaming dedup).

Everything rides on the DataFrame API so Catalyst/Tungsten pick the
physical plan; Python UDFs only appear where built-ins genuinely cannot
express the semantics (Arrow-batched, never per-row).
"""

__version__ = "0.1.0"
