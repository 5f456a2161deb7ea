"""Local replica of the driver's Spark-vs-DuckDB comparison.

Mirrors the documented contract: run the Spark query and the oracle SQL
on the same parquet tables, then compare row count, column names, and
an order-insensitive value multiset (columns sorted by name). Catching
a mismatch here is far cheaper than waiting for CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb

from onechronos_etl_takehome_spark.sources.tables import TABLE_NAMES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm_cell(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    # Decimal, timestamps, dates → canonical string
    if not isinstance(v, (str, int, bool, bytes)):
        return str(v)
    return v


def _canonical(rows: list[dict[str, Any]]) -> list[tuple]:
    if not rows:
        return []
    cols = sorted(rows[0].keys())
    out = [tuple(_norm_cell(r[c]) for c in cols) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def _pandas_hazards(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Replicate the driver's pandas canonicalization hazards.

    The driver compares ``spark_df.toPandas()`` against DuckDB's
    ``fetchdf()`` after sorting columns by name and ``sort_values`` over
    all columns, then hashes values *type-sensitively*.  Two failure
    classes slip past a ``fetchall()``-based compare:

    - dtype skew: DuckDB HUGEINT (``SUM`` over integers) comes back as
      float64 while Spark emits int64 → ``30.0`` vs ``30`` hash-mismatch;
    - unhashable cells: array columns break pandas ``sort_values``.
    """
    errors: list[str] = []
    spark_pdf = spark_df.toPandas()
    oracle_pdf = con.execute(sql).fetchdf()
    for name, df_name in ((spark_pdf, "spark"), (oracle_pdf, "oracle")):
        for col in name.columns:
            if name[col].map(lambda v: isinstance(v, (list, dict))).any():
                errors.append(f"{df_name}.{col}: unhashable (list/dict) cells")
    common = set(spark_pdf.columns) & set(oracle_pdf.columns)
    for col in sorted(common):
        a, b = spark_pdf[col].dtype, oracle_pdf[col].dtype
        if a != b and "object" not in (str(a), str(b)):
            errors.append(f"dtype skew on {col}: spark={a} oracle={b}")
    return errors


def compare(
    spark_df, con: duckdb.DuckDBPyConnection, sql: str, pandas_check: bool = True
) -> dict[str, Any]:
    """Return a diff report; empty 'errors' list means parity."""
    spark_rows = [r.asDict(recursive=True) for r in spark_df.collect()]
    cur = con.execute(sql)
    oracle_cols = [d[0] for d in cur.description]
    oracle_rows = [dict(zip(oracle_cols, row)) for row in cur.fetchall()]

    errors: list[str] = []
    if sorted(spark_df.columns) != sorted(oracle_cols):
        errors.append(
            f"columns differ: spark={sorted(spark_df.columns)} "
            f"oracle={sorted(oracle_cols)}"
        )
    if len(spark_rows) != len(oracle_rows):
        errors.append(f"row count: spark={len(spark_rows)} oracle={len(oracle_rows)}")
    if not errors:
        a, b = _canonical(spark_rows), _canonical(oracle_rows)
        if a != b:
            mism = [(x, y) for x, y in zip(a, b) if x != y][:5]
            errors.append(f"value mismatch; first diffs: {mism}")
    if not errors and pandas_check:
        errors.extend(_pandas_hazards(spark_df, con, sql))
    return {"errors": errors, "n_rows": len(spark_rows)}
