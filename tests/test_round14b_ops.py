"""Round-14 second-wave pins: FLAC ingest (m16) + the audio
metadata zoo (m17).

Codec-level pins (round-trips, CRC catalogue anchors, the
independently assembled stream) live in tests/test_flac.py; this
module pins the SPARK-level contracts: the mixed corpus really
contains FLAC bytes, the landmark join recovers exactly the planted
WAV↔FLAC twins, and the metadata zoo has no dead legs (every
container/rate/channel variant the oracle's CASE arms name actually
occurs — the round-13 advice lesson from m14's codec zoo).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from onechronos_etl_takehome_spark.operators import audio as au
from onechronos_etl_takehome_spark.operators.multimodal import sniff_modality

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    from onechronos_etl_takehome_spark.sources.tables import load_table

    return load_table(spark, SF, "documents")


def test_mixed_corpus_recaptures_are_flac(spark, docs):
    rows = au.demo_mixed_audio_payloads(docs, "doc_id").collect()
    kinds = {int(r["id"]): sniff_modality(bytes(r["content"])) for r in rows}
    assert kinds, "empty fixture corpus"
    for i, kind in kinds.items():
        expected = "flac" if (i // 10) % 2 == 1 else "wav"
        assert kind == expected, (i, kind)


def test_m16_recovers_exactly_the_planted_wav_flac_twins(spark, docs):
    payloads = au.demo_mixed_audio_payloads(docs, "doc_id")
    pairs = au.audio_match_pairs(payloads, min_containment=0.6).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    n = docs.where(F.col("doc_id") % 10 == 0).count()
    expected = {(g * 20, g * 20 + 10) for g in range(n // 2)}
    assert got == expected
    # twins sit far above threshold; FLAC is lossless so the only
    # fingerprint churn comes from the re-capture itself, not the codec
    assert min(r["containment"] for r in pairs) >= 0.9


def test_audio_samples_dispatcher_contract():
    with pytest.raises(ValueError):
        au.audio_samples(b"\x00\x01garbage")
    wave = 0.3 * np.sin(np.arange(4096) * 0.05)
    from onechronos_etl_takehome_spark.operators.flac import flac_from_samples
    from onechronos_etl_takehome_spark.operators.multimodal import (
        wav_from_samples,
    )

    via_wav = au.audio_samples(wav_from_samples(wave, 8000))
    via_flac = au.audio_samples(flac_from_samples(wave, 8000))
    assert via_wav[0] == via_flac[0] == 1
    assert via_wav[1] == via_flac[1] == 8000
    assert np.array_equal(via_wav[2], via_flac[2])


def test_m17_zoo_has_no_dead_legs(spark, docs):
    md = au.audio_stream_metadata(
        au.demo_audio_zoo_payloads(docs, "doc_id")
    ).collect()
    assert len(md) == docs.where(F.col("doc_id") % 10 == 0).count()
    containers = {r["container"] for r in md}
    rates = {r["sample_rate"] for r in md}
    chans = {r["channels"] for r in md}
    lens = {r["n_samples"] for r in md}
    assert containers == {"wav", "flac"}
    assert rates == {8000, 16000, 22050, 44100}
    assert chans == {1, 2}
    assert len(lens) == 8
    # stereo only ever occurs on the FLAC leg (WAV writer is mono)
    assert all(r["container"] == "flac" for r in md if r["channels"] == 2)


def test_m17_metadata_is_header_only_for_flac():
    # a FLAC payload with CORRUPT frame bytes but intact STREAMINFO
    # still catalogs — proof the metadata pass never opens frames
    from onechronos_etl_takehome_spark.operators.flac import (
        flac_stream_info,
        synthesize_flac,
    )

    payload = bytearray(synthesize_flac(2048, 16000, 440.0, 3))
    payload[-50] ^= 0xFF  # corrupt a frame body byte
    info = flac_stream_info(bytes(payload))
    assert info["sample_rate"] == 16000 and info["n_samples"] == 2048
