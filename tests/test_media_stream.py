"""Streaming twin of the perceptual image dedup (m08): incremental
fingerprint-and-match over a monitored landing zone."""

from __future__ import annotations

import os

import pytest

from onechronos_etl_takehome_spark.operators.multimodal import (
    _smooth_image,
    _variant_image,
    bmp_from_pixels,
    image_dhash,
)
from onechronos_etl_takehome_spark.streaming.media_stream import (
    match_against_index,
    start_image_neardup_stream,
)


def _payload_df(spark, rows):
    return spark.createDataFrame(
        [(i, bytearray(b)) for i, b in rows], "id long, content binary"
    )


@pytest.fixture()
def corpus_index(spark):
    """Static dHash index over 6 base scenes (ids 0..5)."""
    rows = [(i, bmp_from_pixels(_smooth_image(i))) for i in range(6)]
    return image_dhash(_payload_df(spark, rows)).localCheckpoint(eager=True)


def test_stream_matches_planted_neardups(spark, tmp_path, corpus_index):
    """Multi-trigger availableNow run: every re-lit variant matches
    its base scene (and only that scene); a fresh scene matches
    nothing."""
    land = tmp_path / "landing"
    land.mkdir()
    # two drops: variants of scenes 1 and 3, then scene 4's variant
    # plus a brand-new scene 77
    _payload_df(
        spark,
        [(101, bmp_from_pixels(_variant_image(1))),
         (103, bmp_from_pixels(_variant_image(3)))],
    ).coalesce(1).write.parquet(str(land / "drop1"))
    _payload_df(
        spark,
        [(104, bmp_from_pixels(_variant_image(4))),
         (177, bmp_from_pixels(_smooth_image(77)))],
    ).coalesce(1).write.parquet(str(land / "drop2"))

    out = tmp_path / "matches"
    q = start_image_neardup_stream(
        spark,
        payload_dir=f"{land}/*",
        index=corpus_index,
        output_dir=str(out),
        checkpoint_dir=str(tmp_path / "ckpt"),
        available_now=True,
        max_files_per_trigger=1,
    )
    q.awaitTermination(120)
    n_triggers = sum(
        1 for p in q.recentProgress if int(p["numInputRows"]) > 0
    )
    assert n_triggers >= 2  # maxFilesPerTrigger=1 → real increments

    got = {
        (r.new_id, r.corpus_id)
        for r in spark.read.option("basePath", str(out))
        .parquet(f"{out}/batch_id=*")
        .collect()
    }
    assert got == {(101, 1), (103, 3), (104, 4)}


def test_stream_agrees_with_batch_operator(spark, tmp_path, corpus_index):
    """The streaming match must equal the batch match_against_index
    on the same payloads (stream-batch parity, the engine's standard
    twin contract)."""
    payloads = _payload_df(
        spark,
        [(200 + i, bmp_from_pixels(_variant_image(i))) for i in range(6)],
    )
    batch = {
        (r.new_id, r.corpus_id, r.hamming)
        for r in match_against_index(payloads, corpus_index).collect()
    }
    assert {(n - 200, c) for n, c, _ in batch} == {(i, i) for i in range(6)}

    land = tmp_path / "landing"
    land.mkdir()
    payloads.coalesce(1).write.parquet(str(land / "drop"))
    out = tmp_path / "matches"
    q = start_image_neardup_stream(
        spark,
        payload_dir=f"{land}/*",
        index=corpus_index,
        output_dir=str(out),
        checkpoint_dir=str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination(120)
    streamed = {
        (r.new_id, r.corpus_id, r.hamming)
        for r in spark.read.option("basePath", str(out))
        .parquet(f"{out}/batch_id=*")
        .collect()
    }
    assert streamed == batch


def test_stream_replay_is_idempotent(spark, tmp_path, corpus_index):
    """Re-running with the same checkpoint adds nothing; re-running
    the sink for a batch id overwrites its own directory only."""
    land = tmp_path / "landing"
    land.mkdir()
    _payload_df(
        spark, [(300, bmp_from_pixels(_variant_image(2)))]
    ).coalesce(1).write.parquet(str(land / "drop"))
    out = tmp_path / "matches"

    for _ in range(2):  # second run: checkpoint says nothing new
        q = start_image_neardup_stream(
            spark,
            payload_dir=f"{land}/*",
            index=corpus_index,
            output_dir=str(out),
            checkpoint_dir=str(tmp_path / "ckpt"),
            available_now=True,
        )
        q.awaitTermination(120)

    rows = (
        spark.read.option("basePath", str(out))
        .parquet(f"{out}/batch_id=*")
        .collect()
    )
    assert [(r.new_id, r.corpus_id) for r in rows] == [(300, 2)]
