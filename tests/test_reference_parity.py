"""Golden-file regression against the reference's committed outputs.

Runs the rebuilt pipeline on the reference's own CSVs and compares to
its committed cleaned_trades.json / exceptions_report.json:
order-insensitive, missing-key ≡ NULL (quirk Q3). Session TZ is pinned
to America/New_York — the timezone the goldens were produced in
(quirk Q1: epoch-sourced timestamps render in session TZ with a
literal 'Z'); the engine default elsewhere is UTC.

Also checks the six logged metrics exactly (BASELINE.md).
"""

from __future__ import annotations

import json

import pytest

from onechronos_etl_takehome_spark.pipeline import ReconciliationPipeline

REF = "/root/reference"

GOLDEN_METRICS = {
    "processed_trades": 10_981,
    "successful_trades": 6_935,
    "discrepancy_trades": 4_774,
    "cancelled_trades": 2_004,
    "duplicate_trades": 981,
    "invalid_trades": 1_061,
}


def _canon(records: list[dict]) -> list[tuple]:
    def norm(v):
        if isinstance(v, dict):
            return tuple(sorted((k, norm(x)) for k, x in v.items() if x is not None))
        if isinstance(v, float):
            return round(v, 9)
        return v

    rows = [
        tuple(sorted((k, norm(v)) for k, v in r.items() if v is not None))
        for r in records
    ]
    return sorted(rows, key=repr)


@pytest.fixture(scope="module")
def pipeline_outputs(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("etl_out")
    pipe = ReconciliationPipeline(
        spark, input_dir=REF, session_tz="America/New_York"
    )
    metrics = pipe.run(str(out))
    with open(out / "cleaned_trades.json") as f:
        cleaned = json.load(f)
    with open(out / "exceptions_report.json") as f:
        exceptions = json.load(f)
    return metrics, cleaned, exceptions


def test_metrics_parity(pipeline_outputs):
    metrics, _, _ = pipeline_outputs
    assert metrics == GOLDEN_METRICS


def test_cleaned_trades_golden(pipeline_outputs):
    _, cleaned, _ = pipeline_outputs
    with open(f"{REF}/cleaned_trades.json") as f:
        golden = json.load(f)
    assert len(cleaned) == len(golden)
    assert _canon(cleaned) == _canon(golden)


def test_exceptions_golden(pipeline_outputs):
    _, _, exceptions = pipeline_outputs
    with open(f"{REF}/exceptions_report.json") as f:
        golden = json.load(f)
    assert len(exceptions) == len(golden)
    assert _canon(exceptions) == _canon(golden)
