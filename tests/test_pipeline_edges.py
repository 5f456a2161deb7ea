"""Edge cases the reference leaves untested (FIXTURES.md): fill
fan-out on duplicate our_trade_id, and the partitioned output mode."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from onechronos_etl_takehome_spark.pipeline import (
    ReconciliationPipeline,
    default_config,
)


@pytest.fixture()
def tiny_inputs(tmp_path):
    (tmp_path / "trades.csv").write_text(
        "trade_id,timestamp,symbol,quantity,price,buyer_id,seller_id,trade_status\n"
        "T1,2024-01-15T10:00:00.000Z,AAPL,10,100.5,B1,S1,EXECUTED\n"
        "T2,2024-01-15T11:00:00.000Z,AAPL,20,200.5,B2,S2,EXECUTED\n"
    )
    # T1 has TWO fills — the fan-out case
    (tmp_path / "counterparty_fills.csv").write_text(
        "external_ref_id,our_trade_id,timestamp,symbol,quantity,price,counterparty_id\n"
        "E1,T1,2024-01-15T10:01:00.000Z,AAPL,10,100.5,CP1\n"
        "E2,T1,2024-01-15T10:02:00.000Z,AAPL,11,100.5,CP1\n"
    )
    (tmp_path / "symbols_reference.csv").write_text(
        "symbol,company_name,sector,is_active\nAAPL,Apple,Tech,true\n"
    )
    return str(tmp_path)


def test_fill_fanout_reference_behavior(spark, tiny_inputs, tmp_path):
    # default (reference semantics): duplicate fills fan the trade out
    out = tmp_path / "out_ref"
    out.mkdir()
    pipe = ReconciliationPipeline(spark, input_dir=tiny_inputs)
    m = pipe.run(str(out))
    assert m["successful_trades"] == 3  # T1 twice + T2


def test_fill_fanout_guard(spark, tiny_inputs, tmp_path):
    cfg = default_config()
    cfg["data_quality"]["dedupe_fills"] = True
    out = tmp_path / "out_guarded"
    out.mkdir()
    pipe = ReconciliationPipeline(spark, cfg, input_dir=tiny_inputs)
    m = pipe.run(str(out))
    assert m["successful_trades"] == 2  # one row per trade, fill E1 kept


def test_partitioned_output_mode(spark, tiny_inputs, tmp_path):
    cfg = default_config()
    cfg["output"]["single_file"] = False
    out = tmp_path / "out_part"
    out.mkdir()
    pipe = ReconciliationPipeline(spark, cfg, input_dir=tiny_inputs)
    m = pipe.run(str(out))
    back = spark.read.json(str(out / "cleaned_trades.json"))
    assert back.count() == m["successful_trades"]
    assert back.filter(F.col("trade_id") == "T2").count() == 1
