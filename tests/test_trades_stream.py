"""Streaming twin of the trade-reconciliation pipeline.

Pins (a) batch-equivalence: a single-microbatch streaming run produces
exactly the batch pipeline's cleaned/exceptions rows on the same input
(duplicates are content-identical so the survivor-choice divergence
cannot surface), and (b) cross-batch dedup: a duplicate trade id
arriving in a later microbatch within the watermark horizon is dropped.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from onechronos_etl_takehome_spark.pipeline import ReconciliationPipeline
from onechronos_etl_takehome_spark.pipeline.etl import default_config
from onechronos_etl_takehome_spark.streaming.trades_stream import (
    start_reconciliation_stream,
)

TRADES_HEADER = (
    "trade_id,timestamp,symbol,quantity,price,buyer_id,seller_id,trade_status"
)
BATCH1 = [
    # valid, confirmed by fill
    "T1,2024-01-15T10:00:00.000Z,AAPL,100,10.00,B1,S1,EXECUTED",
    # exact duplicate row -> deduped everywhere
    "T1,2024-01-15T10:00:00.000Z,AAPL,100,10.00,B1,S1,EXECUTED",
    # cancelled -> filtered
    "T2,2024-01-15T10:01:00.000Z,MSFT,50,20.00,B2,S2,CANCELLED",
    # negative quantity -> exception
    "T3,2024-01-15T10:02:00.000Z,AAPL,-5,10.00,B3,S3,EXECUTED",
    # unparseable timestamp -> exception (bypasses streaming dedup)
    "T4,not-a-time,MSFT,10,30.00,B4,S4,EXECUTED",
    # unknown symbol -> exception
    "T5,2024-01-15T10:04:00.000Z,ZZZZ,10,30.00,B5,S5,EXECUTED",
]
BATCH2 = [
    # duplicate of T1 within the watermark horizon -> dropped
    "T1,2024-01-15T10:00:00.000Z,AAPL,100,10.00,B1,S1,EXECUTED",
    # new valid trade
    "T6,2024-01-15T10:30:00.000Z,MSFT,10,20.00,B6,S6,EXECUTED",
]
FILLS = [
    "external_ref_id,our_trade_id,timestamp,symbol,quantity,price,counterparty_id",
    "E1,T1,2024-01-15T10:00:01.000Z,AAPL,100,10.00,CP1",
    "E6,T6,2024-01-15T10:30:01.000Z,MSFT,10,20.00,CP1",
]
SYMBOLS = [
    "symbol,company_name,sector,is_active",
    "AAPL,Apple Inc.,Technology,true",
    "MSFT,Microsoft Corporation,Technology,true",
]


def _write(path: str, lines: list[str]) -> None:
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def _stage(tmp, batches: list[list[str]]) -> tuple[str, str]:
    trades_dir = os.path.join(str(tmp), "landing")
    dims_dir = os.path.join(str(tmp), "dims")
    os.makedirs(trades_dir, exist_ok=True)
    os.makedirs(dims_dir, exist_ok=True)
    for i, rows in enumerate(batches):
        _write(
            os.path.join(trades_dir, f"trades_{i}.csv"), [TRADES_HEADER, *rows]
        )
    _write(os.path.join(dims_dir, "counterparty_fills.csv"), FILLS)
    _write(os.path.join(dims_dir, "symbols_reference.csv"), SYMBOLS)
    return trades_dir, dims_dir


def _run_stream(spark, tmp, trades_dir, dims_dir, **kw):
    out = os.path.join(str(tmp), "out")
    q = start_reconciliation_stream(
        spark,
        trades_dir=trades_dir,
        dims_dir=dims_dir,
        output_dir=out,
        checkpoint_dir=os.path.join(str(tmp), "ckpt"),
        available_now=True,
        **kw,
    )
    try:
        finished = q.awaitTermination(120)
        assert finished, "streaming query did not drain within 120s"
    finally:
        # never leak an active query into later tests — leftover async
        # jobs race the suite's job-counter assertions
        if q.isActive:
            q.stop()
    cleaned = spark.read.parquet(os.path.join(out, "cleaned"))
    exceptions = spark.read.parquet(os.path.join(out, "exceptions"))
    return cleaned, exceptions


def test_single_batch_matches_batch_pipeline(spark, tmp_path):
    trades_dir, dims_dir = _stage(tmp_path, [BATCH1])
    cleaned, exceptions = _run_stream(spark, tmp_path, trades_dir, dims_dir)

    # batch pipeline on the identical input
    batch_in = os.path.join(str(tmp_path), "batch_in")
    os.makedirs(batch_in)
    _write(os.path.join(batch_in, "trades.csv"), [TRADES_HEADER, *BATCH1])
    _write(os.path.join(batch_in, "counterparty_fills.csv"), FILLS)
    _write(os.path.join(batch_in, "symbols_reference.csv"), SYMBOLS)
    cfg = default_config()
    cfg["output"]["single_file"] = False
    batch_out = os.path.join(str(tmp_path), "batch_out")
    pipe = ReconciliationPipeline(spark, config=cfg, input_dir=batch_in)
    metrics = pipe.run(batch_out)

    b_cleaned = spark.read.json(os.path.join(batch_out, "cleaned_trades.json"))
    got = sorted(
        cleaned.select(sorted(b_cleaned.columns)).collect(),
        key=lambda r: r.trade_id,
    )
    want = sorted(
        b_cleaned.select(sorted(b_cleaned.columns)).collect(),
        key=lambda r: r.trade_id,
    )
    assert [r.asDict() for r in got] == [r.asDict() for r in want]
    # T1 (confirmed) and T4 (valid fields; unparseable ts is NOT a
    # validity rule — reference parity, it lands as null timestamp_utc)
    assert metrics["successful_trades"] == cleaned.count() == 2

    exc = {
        r.record_id: r.exception_type for r in exceptions.collect()
    }
    assert set(exc) == {"T3", "T5"}
    assert exc["T3"] == "QUANTITY_INVALID"
    assert exc["T5"] == "SYMBOL_INVALID"


def test_checkpoint_resume_dedups_across_restarts(spark, tmp_path):
    """Restarting from the checkpoint must restore dedup state: a
    duplicate trade id arriving in a file dropped AFTER the first run
    finished is still deduped, and already-processed files are not
    reprocessed (their batch_id outputs are untouched)."""
    trades_dir, dims_dir = _stage(tmp_path, [BATCH1])
    cleaned1, _ = _run_stream(spark, tmp_path, trades_dir, dims_dir)
    assert {r.trade_id for r in cleaned1.collect()} == {"T1", "T4"}

    _write(os.path.join(trades_dir, "trades_late.csv"), [TRADES_HEADER, *BATCH2])
    cleaned2, _ = _run_stream(spark, tmp_path, trades_dir, dims_dir)
    rows = [r.trade_id for r in cleaned2.collect()]
    # T1's third arrival deduped via restored state; T6 new
    assert sorted(rows) == ["T1", "T4", "T6"]


def test_mixed_status_duplicate(spark, tmp_path):
    """Duplicate trade_id with mixed statuses: survivor choice happens
    BEFORE the cancelled filter, matching the batch transform's order.
    The CANCELLED row is first both in arrival order (the streaming
    survivor) and under the batch sort order (identical fields except
    status, 'C' < 'E'), so both engines must drop T7 entirely. The
    inverted order (filter cancelled, then dedup) would instead keep
    the EXECUTED duplicate and emit T7 — the divergence this pins."""
    rows = [
        "T7,2024-01-15T10:05:00.000Z,AAPL,10,10.00,B7,S7,CANCELLED",
        "T7,2024-01-15T10:05:00.000Z,AAPL,10,10.00,B7,S7,EXECUTED",
    ]
    trades_dir, dims_dir = _stage(tmp_path, [BATCH1 + rows])
    cleaned, exceptions = _run_stream(spark, tmp_path, trades_dir, dims_dir)
    assert cleaned.filter(F.col("trade_id") == "T7").count() == 0
    assert exceptions.filter(F.col("record_id") == "T7").count() == 0

    # batch pipeline on the identical input agrees: T7 vanishes
    batch_in = os.path.join(str(tmp_path), "batch_in")
    os.makedirs(batch_in)
    _write(os.path.join(batch_in, "trades.csv"), [TRADES_HEADER, *BATCH1, *rows])
    _write(os.path.join(batch_in, "counterparty_fills.csv"), FILLS)
    _write(os.path.join(batch_in, "symbols_reference.csv"), SYMBOLS)
    cfg = default_config()
    cfg["output"]["single_file"] = False
    batch_out = os.path.join(str(tmp_path), "batch_out")
    ReconciliationPipeline(spark, config=cfg, input_dir=batch_in).run(batch_out)
    b_cleaned = spark.read.json(os.path.join(batch_out, "cleaned_trades.json"))
    assert b_cleaned.filter(F.col("trade_id") == "T7").count() == 0


def test_cross_batch_dedup_within_watermark(spark, tmp_path):
    trades_dir, dims_dir = _stage(tmp_path, [BATCH1, BATCH2])
    cleaned, _ = _run_stream(
        spark, tmp_path, trades_dir, dims_dir, max_files_per_trigger=1
    )
    rows = {r.trade_id: r for r in cleaned.collect()}
    # T1 exactly once despite three arrivals across two microbatches
    assert sorted(rows) == ["T1", "T4", "T6"]
    assert cleaned.filter(F.col("trade_id") == "T1").count() == 1
