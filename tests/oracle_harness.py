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


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict[str, Any]:
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
    return {"errors": errors, "n_rows": len(spark_rows)}
