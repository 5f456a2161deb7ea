"""Dirty-data model test (FIXTURES.md): generated corruption through the
rules engine + reconcile, checked row-by-row against a pure-Python model
of the documented semantics (non-ANSI casts, 3-valued logic, exclusive
threshold, quirk Q5/Q6 edge cases)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from onechronos_etl_takehome_spark.pipeline import rules

SYMBOLS = {
    "AAPL": ("Apple", "true"),
    "OLDCO": ("Old Co", "false"),
}


def _py_int(s):
    # Spark non-ANSI cast string→int: trims, truncates decimals,
    # malformed → None.
    if s is None:
        return None
    t = s.strip()
    try:
        return int(t)
    except ValueError:
        try:
            return int(float(t))
        except (ValueError, OverflowError):
            return None


def _py_float(s):
    if s is None:
        return None
    try:
        return float(s.strip())
    except ValueError:
        return None


def _expected(row):
    qty, price = _py_int(row["quantity"]), _py_float(row["price"])
    company, active = SYMBOLS.get(row["symbol"], (None, None))
    types = []
    if not (company is not None and active == "true"):
        types.append("SYMBOL_INVALID")
    if not (qty is not None and qty > 0):
        types.append("QUANTITY_INVALID")
    if not (price is not None and price > 0):
        types.append("PRICE_INVALID")

    details = []
    if company is None:
        details.append("Symbol not found in reference data")
    if active == "false":
        details.append("Symbol is not active")
    if qty is None or qty <= 0:
        details.append("Quantity is null or non-integer/non-positive")
    if price is None or price <= 0:
        details.append("Price is null or non-numeric/non-positive")

    cq, cp = _py_int(row["cp_quantity"]), _py_float(row["cp_price"])
    confirmed = cq is not None or cp is not None

    # three-valued logic, as SQL computes it (quirk Q5)
    def tri_and(a, b):
        if a is False or b is False:
            return False
        if a is None or b is None:
            return None
        return True

    def tri_or(*vals):
        if any(v is True for v in vals):
            return True
        if any(v is None for v in vals):
            return None
        return False

    qty_mismatch = False if cq is None else (None if qty is None else cq != qty)
    price_mismatch = (
        False if cp is None else (None if price is None else abs(cp - price) > 0.01)
    )
    sym_mismatch = (
        False
        if row["cp_symbol"] is None
        else (None if row["symbol"] is None else row["cp_symbol"] != row["symbol"])
    )
    discrepant = tri_and(confirmed, tri_or(qty_mismatch, price_mismatch, sym_mismatch))
    return types, details, not types, confirmed, discrepant


def _gen_rows(n=300, seed=7):
    rng = random.Random(seed)
    dirty_qty = ["", "abc", "0", "-5", "12.5", "100", None, " 42 "]
    dirty_price = ["", "xyz", "0", "-1.5", "1e2", "99.99", None, "171.47999999"]
    symbols = ["AAPL", "OLDCO", "NOPE", None]
    rows = []
    for i in range(n):
        rows.append(
            {
                "trade_id": f"T{i:05d}",
                "symbol": rng.choice(symbols),
                "quantity": rng.choice(dirty_qty),
                "price": rng.choice(dirty_price),
                "cp_symbol": rng.choice(symbols),
                "cp_quantity": rng.choice(dirty_qty),
                "cp_price": rng.choice(dirty_price),
            }
        )
    return rows


def test_rules_engine_matches_model(spark):
    spark.conf.set("spark.sql.ansi.enabled", "false")
    rows = _gen_rows()
    schema = (
        "trade_id string, symbol string, quantity string, price string, "
        "cp_symbol string, cp_quantity string, cp_price string"
    )
    df = spark.createDataFrame(rows, schema=schema)
    enriched = df.withColumns(
        {
            "company_name": F.when(F.col("symbol") == "AAPL", "Apple").when(
                F.col("symbol") == "OLDCO", "Old Co"
            ),
            "is_active": F.when(F.col("symbol") == "AAPL", "true").when(
                F.col("symbol") == "OLDCO", "false"
            ),
            "quantity_int": F.col("quantity").cast("int"),
            "price_dec": F.col("price").cast("double"),
            "cp_quantity_int": F.col("cp_quantity").cast("int"),
            "cp_price_dec": F.col("cp_price").cast("double"),
        }
    )
    out = rules.reconcile(rules.apply_rules(enriched), price_threshold=0.01)
    got = {r["trade_id"]: r for r in out.collect()}

    for row in rows:
        types, details, valid, confirmed, discrepant = _expected(row)
        g = got[row["trade_id"]]
        assert g["exception_types"] == types, (row, g["exception_types"], types)
        assert g["exception_details"] == details, (row, g["exception_details"])
        assert g["is_valid"] == valid
        assert g["counterparty_confirmed"] == confirmed, row
        assert g["discrepancy_flag"] == discrepant, (
            row,
            g["discrepancy_flag"],
            discrepant,
        )
