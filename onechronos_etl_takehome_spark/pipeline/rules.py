"""Declarative validation rules for the trade-reconciliation pipeline.

The reference hardcodes four validation rules as a when/otherwise chain
(etl_pipeline.py:167-218). Here the rules are *data*: ordered lists of
(label, predicate) and (text, predicate) compiled into the same
exception-array accumulation. Order matters for golden parity —
exception types append SYMBOL→QUANTITY→PRICE and details append
not-found → inactive → quantity → price (SURVEY.md §2.9 Q6).

Three-valued-logic fidelity: a type label is appended when its *pass*
predicate is not true (NULL fails validation); a detail is appended
when its *applies* predicate is true (NULL does not fire the detail).
The two polarities are NOT interchangeable under SQL NULL semantics —
e.g. an unmatched symbol (NULL is_active) fails the SYMBOL pass rule
but does not fire the "Symbol is not active" detail (quirk Q6).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class TypeRule:
    """Append ``label`` to exception_types unless ``passes`` is true."""

    label: str
    passes: Callable[[], Column]


@dataclass(frozen=True)
class DetailRule:
    """Append ``text`` to exception_details when ``applies`` is true."""

    text: str
    applies: Callable[[], Column]


def _symbol_active() -> Column:
    # is_active is a string column from CSV; the reference compares it
    # as both string and boolean (etl_pipeline.py:171) — with string
    # input the boolean compare coerces, so "true" passes either way.
    return F.col("company_name").isNotNull() & (F.col("is_active") == "true")


TYPE_RULES: list[TypeRule] = [
    TypeRule("SYMBOL_INVALID", _symbol_active),
    TypeRule(
        "QUANTITY_INVALID",
        lambda: F.col("quantity_int").isNotNull() & (F.col("quantity_int") > 0),
    ),
    TypeRule(
        "PRICE_INVALID",
        lambda: F.col("price_dec").isNotNull() & (F.col("price_dec") > 0),
    ),
]

DETAIL_RULES: list[DetailRule] = [
    DetailRule(
        "Symbol not found in reference data",
        lambda: F.col("company_name").isNull(),
    ),
    DetailRule(
        "Symbol is not active",
        lambda: F.col("is_active") == "false",
    ),
    DetailRule(
        "Quantity is null or non-integer/non-positive",
        lambda: F.col("quantity_int").isNull() | (F.col("quantity_int") <= 0),
    ),
    DetailRule(
        "Price is null or non-numeric/non-positive",
        lambda: F.col("price_dec").isNull() | (F.col("price_dec") <= 0),
    ),
]


def apply_rules(
    df: DataFrame,
    type_rules: list[TypeRule] = TYPE_RULES,
    detail_rules: list[DetailRule] = DETAIL_RULES,
) -> DataFrame:
    """Accumulate exception arrays + validity flag in one projection."""
    types: Column = F.array().cast("array<string>")
    for rule in type_rules:
        types = F.when(rule.passes(), types).otherwise(
            F.array_append(types, F.lit(rule.label))
        )
    details: Column = F.array().cast("array<string>")
    for rule in detail_rules:
        details = F.when(rule.applies(), F.array_append(details, F.lit(rule.text))).otherwise(
            details
        )
    return df.withColumns(
        {
            "exception_types": types,
            "exception_details": details,
        }
    ).withColumn("is_valid", F.size("exception_types") == 0)


def reconcile(df: DataFrame, *, price_threshold: float) -> DataFrame:
    """Counterparty confirmation + discrepancy flags (quirk Q5 exact).

    confirmed = joined fill has a parseable quantity OR price; a matched
    fill with neither stays unconfirmed. discrepancy is 3-valued-safe:
    false (never NULL) when unconfirmed; threshold is exclusive (>).
    """
    confirmed = F.col("cp_quantity_int").isNotNull() | F.col("cp_price_dec").isNotNull()
    qty_mismatch = F.col("cp_quantity_int").isNotNull() & (
        F.col("cp_quantity_int") != F.col("quantity_int")
    )
    price_mismatch = F.col("cp_price_dec").isNotNull() & (
        F.abs(F.col("cp_price_dec") - F.col("price_dec")) > price_threshold
    )
    symbol_mismatch = F.col("cp_symbol").isNotNull() & (
        F.col("cp_symbol") != F.col("symbol")
    )
    return df.withColumns(
        {
            "counterparty_confirmed": confirmed,
            "discrepancy_flag": confirmed
            & (qty_mismatch | price_mismatch | symbol_mismatch),
        }
    )
