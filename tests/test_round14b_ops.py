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
    codecs = {r["codec"] for r in md}
    rates = {r["sample_rate"] for r in md}
    chans = {r["channels"] for r in md}
    assert containers == {"wav", "flac", "mp3", "adts"}
    assert codecs == {
        "pcm", "flac", "aac-lc",
        "mpeg1-layer3", "mpeg2-layer3", "mpeg2.5-layer3",
    }
    assert rates == {8000, 16000, 22050, 44100}
    assert chans == {1, 2}
    # the container and rate selectors are DISTINCT base-4 digits of
    # j, so the full container × rate cross is live — the round-13
    # advice failure mode (correlated selectors leaving zoo legs
    # unreachable) cannot recur silently
    combos = {(r["container"], r["sample_rate"]) for r in md}
    assert len(combos) == 16, sorted(combos)
    for c in containers:
        assert len({r["n_samples"] for r in md if r["container"] == c}) >= 3
    # stereo occurs on every non-WAV leg (the WAV writer is mono)
    stereo_containers = {r["container"] for r in md if r["channels"] == 2}
    assert stereo_containers == {"flac", "mp3", "adts"}
    # bit depth is a stream property only for the PCM-bearing legs
    for r in md:
        assert r["bits"] == (16 if r["container"] in ("wav", "flac") else 0)


def test_mpeg_audio_parsers_roundtrip_and_enforce():
    from onechronos_etl_takehome_spark.operators.mpeg_audio import (
        parse_adts_stream,
        parse_mp3_stream,
        sniff_mpeg_audio,
        synthesize_adts,
        synthesize_mp3,
    )

    for rate, spf, ver in (
        (44100, 1152, "mpeg1"), (22050, 576, "mpeg2"),
        (16000, 576, "mpeg2"), (8000, 576, "mpeg2.5"),
    ):
        p = synthesize_mp3(
            5, rate, channels=2,
            bitrate_kbps=128 if rate == 44100 else 64,
        )
        si = parse_mp3_stream(p)
        assert si["codec"] == f"{ver}-layer3"
        assert si["n_samples"] == 5 * spf
        assert sniff_mpeg_audio(p) == "mp3"
        with pytest.raises(ValueError):
            parse_mp3_stream(p[:-3])
    # ID3v2 prefixes are skipped by their syncsafe size
    p = synthesize_mp3(3, 44100)
    id3 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 10]) + bytes(10)
    assert parse_mp3_stream(id3 + p)["n_frames"] == 3
    a = synthesize_adts(4, 44100, channels=2)
    sa = parse_adts_stream(a)
    assert (sa["codec"], sa["n_samples"]) == ("aac-lc", 4096)
    assert sniff_mpeg_audio(a) == "adts"
    with pytest.raises(ValueError):
        parse_adts_stream(a[:-1])


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
