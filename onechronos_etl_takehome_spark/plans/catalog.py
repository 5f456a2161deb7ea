"""Query catalog: name → (spark, sf_dir) -> DataFrame, plus DuckDB oracle SQL.

Every relational capability the engine claims (SURVEY.md §2 generalized
to the full analytics surface, plus the LLM-data-pipeline operators) is
registered here with a matching ANSI-SQL oracle where SQL can express
the semantics. The driver (and tests/test_oracle_parity.py) run both
sides and compare row-count + schema + order-insensitive value hash.

Cross-engine exactness rules used throughout (see functions/exact.py):
- money math in DECIMAL, final cast to DOUBLE (order-independent);
- counts/lengths cast to BIGINT on both sides;
- timestamps rendered as strings (session TZ pinned to UTC);
- double passthrough columns are fine (no re-aggregation).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle`` is DuckDB SQL over the testdata views.

    Queries whose semantics SQL cannot express (LSH candidate generation,
    custom stateful streaming) register without an oracle — the driver
    then records a weaker rows-only check.
    """

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Populate the registry.
from . import relational  # noqa: E402,F401
from . import relational2  # noqa: E402,F401
from . import relational3  # noqa: E402,F401
from . import llm_ops  # noqa: E402,F401
