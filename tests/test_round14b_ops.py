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
    assert containers == {"wav", "flac", "mp3", "adts", "ogg"}
    assert codecs == {
        "pcm", "flac", "aac-lc", "opus", "vorbis",
        "mpeg1-layer3", "mpeg2-layer3", "mpeg2.5-layer3",
    }
    assert rates == {8000, 16000, 22050, 44100}
    assert chans == {1, 2}
    # the codec-leg and rate selectors are DISTINCT mixed-radix
    # digits of j, so the full leg × rate cross is live — the
    # round-13 advice failure mode (correlated selectors leaving zoo
    # legs unreachable) cannot recur silently
    legs = {
        (r["container"], r["codec"].split("-")[0], r["sample_rate"])
        for r in md
    }
    assert len(legs) == 24, sorted(legs)
    for c in containers:
        assert len({r["n_samples"] for r in md if r["container"] == c}) >= 2
    # stereo occurs on every non-WAV leg (the WAV writer is mono)
    stereo_containers = {r["container"] for r in md if r["channels"] == 2}
    assert stereo_containers == {"flac", "mp3", "adts", "ogg"}
    # bit depth is a stream property only for the PCM-bearing legs
    for r in md:
        assert r["bits"] == (16 if r["container"] in ("wav", "flac") else 0)


def test_t29_epoch_reshuffle_contract(spark, docs, tmp_path):
    """Epoch replay: files byte-identical across epochs, membership
    epoch-invariant, order epoch-varying but deterministic, and
    epoch 0 replays the layout's own pinned order."""
    import hashlib
    import os

    from onechronos_etl_takehome_spark.operators.shards import (
        read_training_shards,
        read_training_shards_epoch,
        write_training_shards,
    )

    path = str(tmp_path / "layout")
    ids = docs.select(F.col("doc_id").cast("long").alias("doc_id"))
    write_training_shards(ids, "doc_id", path, n_shards=4, seed=5)

    def file_state():
        out = {}
        for root, _, files in os.walk(path):
            for f in files:
                p = os.path.join(root, f)
                with open(p, "rb") as fh:
                    out[os.path.relpath(p, path)] = hashlib.md5(
                        fh.read()
                    ).hexdigest()
        return out

    before = file_state()

    def order(epoch):
        rows = read_training_shards_epoch(
            spark, path, "doc_id", epoch=epoch
        ).collect()
        return {
            s: [r["doc_id"] for r in sorted(rows, key=lambda r: r["_pos"])
                if r["_shard"] == s]
            for s in {r["_shard"] for r in rows}
        }

    e1, e2, e1_again = order(1), order(2), order(1)
    assert file_state() == before  # zero bytes moved for new epochs
    assert e1 == e1_again  # deterministic per epoch
    for s in e1:
        assert sorted(e1[s]) == sorted(e2[s])  # membership stable
    assert any(e1[s] != e2[s] for s in e1)  # order actually changes
    # epoch 0 == the layout's pinned (stored shuffle key) order
    pinned = read_training_shards(spark, path, "doc_id").collect()
    zero = read_training_shards_epoch(
        spark, path, "doc_id", epoch=0
    ).collect()
    key = lambda r: (r["_shard"], r["_pos"])  # noqa: E731
    assert (
        [r["doc_id"] for r in sorted(pinned, key=key)]
        == [r["doc_id"] for r in sorted(zero, key=key)]
    )


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
    # external anchor: the canonical FF FB 90 header (MPEG-1 layer
    # III, 128 kbps, 44100 Hz, stereo — the most common MP3 frame
    # header bytes in existence), hand-built here, frame length
    # floor(144000*128/44100) = 417 per the spec formula
    frame = b"\xff\xfb\x90\x00" + bytes(417 - 4)
    si = parse_mp3_stream(frame * 2)
    assert si["codec"] == "mpeg1-layer3"
    assert (si["sample_rate"], si["channels"], si["n_frames"]) == (
        44100, 2, 2,
    )
    a = synthesize_adts(4, 44100, channels=2)
    sa = parse_adts_stream(a)
    assert (sa["codec"], sa["n_samples"]) == ("aac-lc", 4096)
    assert sniff_mpeg_audio(a) == "adts"
    with pytest.raises(ValueError):
        parse_adts_stream(a[:-1])


def test_m18_segments_codec_transparent_and_tolerant(spark):
    """The same clip must segment identically from WAV and FLAC
    bytes, and an UNALIGNED burst (the real-world case the oracle's
    aligned fixture can't cover) must still be found within one
    frame of its true span."""
    from onechronos_etl_takehome_spark.operators.flac import flac_from_samples
    from onechronos_etl_takehome_spark.operators.multimodal import (
        wav_from_samples,
    )

    frame = 256
    wave = np.zeros(20 * frame)
    lo, hi = 5 * frame + 97, 11 * frame + 201  # deliberately unaligned
    wave[lo:hi] = 0.45 * np.sin(0.05 * np.arange(hi - lo))
    payloads = spark.createDataFrame(
        [
            (1, bytearray(wav_from_samples(wave, 8000)), "audio"),
            (2, bytearray(flac_from_samples(wave, 8000)), "audio"),
        ],
        "id long, content binary, modality string",
    )
    segs = au.voice_activity_segments(payloads, frame=frame).collect()
    by_id = {}
    for r in segs:
        by_id.setdefault(r["id"], []).append(
            (r["seg"], r["start_frame"], r["n_frames"])
        )
    assert by_id[1] == by_id[2]  # codec-transparent
    assert len(by_id[1]) == 1
    _, start, n = by_id[1][0]
    assert abs(start - lo // frame) <= 1
    assert abs((start + n) - (hi // frame + 1)) <= 1


def test_ogg_parsers_roundtrip_and_enforce():
    from onechronos_etl_takehome_spark.operators.ogg import (
        ogg_crc,
        parse_ogg_stream,
        synthesize_ogg_opus,
        synthesize_ogg_vorbis,
    )

    p = synthesize_ogg_opus(5, 16000, channels=2)
    si = parse_ogg_stream(p)
    assert (si["codec"], si["sample_rate"], si["channels"]) == (
        "opus", 16000, 2,
    )
    assert si["n_samples"] == 5 * 960  # EOS granule minus pre-skip
    v = parse_ogg_stream(synthesize_ogg_vorbis(2048, 44100))
    assert (v["codec"], v["n_samples"]) == ("vorbis", 2048)
    # every page CRC is enforced — one flipped body byte raises
    bad = bytearray(p)
    bad[len(bad) // 2] ^= 0x01
    with pytest.raises(ValueError):
        parse_ogg_stream(bytes(bad))
    with pytest.raises(ValueError):
        parse_ogg_stream(p[:-5])
    # the Ogg CRC-32 variant against an independent bitwise
    # reimplementation (poly 0x04C11DB7, init 0, unreflected)
    rng = np.random.RandomState(4)
    for _ in range(3):
        blob = rng.randint(0, 256, rng.randint(1, 300)).astype(
            np.uint8
        ).tobytes()
        crc = 0
        for byte in blob:
            crc ^= byte << 24
            for _ in range(8):
                crc = (
                    ((crc << 1) ^ 0x04C11DB7) if crc & 0x80000000
                    else crc << 1
                ) & 0xFFFFFFFF
        assert ogg_crc(blob) == crc


def test_html_extractor_on_tag_soup():
    """Hand-written messy HTML — unclosed tags, uppercase names,
    attributes containing '>', nested anchors, CDATA-ish script
    content — must still yield the right blocks and density calls."""
    from onechronos_etl_takehome_spark.operators.webtext import (
        extract_main_text,
    )

    soup = (
        "<HTML><HEAD><TITLE>  Messy   page </TITLE>"
        "<script>if (a > b) { document.write('<p>fake</p>') }</script>"
        "</HEAD><BODY>"
        "<P>First real paragraph with enough text"  # unclosed <p>
        '<div class="x" data-v="a>b">Second block, also real text here'
        "<ul><li><a href=x>one</a></li><li><a href=y>two</a></li></ul>"
        "<p>Entities: &lt;tag&gt; &amp; &quot;quotes&quot; decoded</p>"
        "</BODY>"
    )
    out = extract_main_text(soup)
    assert out["title"] == "Messy page"
    text = out["main_text"].split("\n")
    assert text[0] == "First real paragraph with enough text"
    assert text[1] == "Second block, also real text here"
    assert 'Entities: <tag> & "quotes" decoded' in text
    # the all-link list items died to the density gate, and nothing
    # from the script leaked (document.write's fake <p> included)
    assert "one" not in out["main_text"]
    assert "fake" not in out["main_text"]
    # a prose-heavy block with ONE link must survive (density < 0.5)
    rich = extract_main_text(
        "<p>Read the full forty-character analysis in our "
        '<a href="/x">report</a> today</p>'
    )
    assert out["n_dropped"] >= 1
    assert rich["n_kept"] == 1


def test_srt_parser_strict_and_roundtrip():
    from onechronos_etl_takehome_spark.operators.subtitles import (
        parse_srt,
        synthesize_srt,
    )

    # an independently hand-written SubRip document (not produced by
    # synthesize_srt): CRLF line endings, multi-line cue text
    doc = (
        "1\r\n00:00:01,500 --> 00:00:04,000\r\nhello\r\nworld\r\n"
        "\r\n"
        "2\r\n01:02:03,250 --> 01:02:05,775\r\nsecond cue\r\n"
    )
    cues = parse_srt(doc)
    assert cues[0] == (1, 1500, 4000, "hello\nworld")
    assert cues[1][1:3] == (3723250, 3725775)
    # round-trip through the writer
    again = parse_srt(synthesize_srt([(c[1], c[2], c[3]) for c in cues]))
    assert [c[1:] for c in again] == [c[1:] for c in cues]
    for bad in (
        "",  # empty
        "1\n00:00:02,000 --> 00:00:01,000\nbackwards\n",  # ends first
        "x\n00:00:01,000 --> 00:00:02,000\ntext\n",  # bad index
        "1\n00:00:01.000 --> 00:00:02,000\ntext\n",  # dot not comma
        "1\n00:00:01,000 --> 00:00:02,000\n",  # no text
    ):
        with pytest.raises(ValueError):
            parse_srt(bad)


def test_m19_alignment_end_to_end(spark, docs):
    from onechronos_etl_takehome_spark.operators import subtitles as st

    audio = au.demo_burst_audio_payloads(docs, "doc_id")
    srt = st.demo_srt_payloads(docs, "doc_id")
    rows = st.align_transcript_segments(audio, srt).collect()
    assert rows
    # every overlap is positive and bounded by both span lengths
    for r in rows:
        assert 1 <= r["overlap_frames"] <= 16
    # both cues and at least two distinct segments participate
    assert {r["cue"] for r in rows} == {1, 2}
    assert len({r["seg"] for r in rows}) >= 2


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
