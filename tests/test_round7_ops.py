"""Round-7 operators: MP4 (ISO BMFF) container codec, the m13
cross-container video witness, prefix-sum/SCD2 lineage truncation
invariance, and the segment-dedup max_segs guard.

Reference parity note: the reference (/root/reference, 447-line
PySpark script) has no media or sampling operators — these are the
beyond-reference LLM-pipeline family; semantics documented in
SURVEY.md §2.6.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from onechronos_etl_takehome_spark.operators.jpeg import jpeg_from_pixels
from onechronos_etl_takehome_spark.operators.mp4 import (
    _box,
    _full_box,
    mp4_frames,
    mp4_from_frames,
)
from onechronos_etl_takehome_spark.operators.multimodal import sniff_modality
from onechronos_etl_takehome_spark.operators.video import (
    avi_from_frames,
    frame_dhashes,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sf_dir():
    return SF


def _smooth_frames(n=5, h=40, w=56):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            np.clip(
                np.stack(
                    [
                        128 + 80 * np.sin(xx / 9.0 + k),
                        128 + 60 * np.cos(yy / 7.0),
                        128 + 40 * np.sin((xx + yy) / 11.0 + k),
                    ],
                    axis=-1,
                ),
                0,
                255,
            ).astype(np.uint8)
            for k in range(n)
        ]
    )


# ---------------------------------------------------------------------------
# MP4 container codec
# ---------------------------------------------------------------------------


class TestMp4Codec:
    def test_roundtrip_quantization_bounded(self):
        frames = _smooth_frames()
        payload = mp4_from_frames(frames)
        assert sniff_modality(payload) == "mp4"
        out = mp4_frames(payload)
        assert out.shape == frames.shape and out.dtype == np.uint8
        # JPEG quantization is the ONLY loss on smooth content
        err = np.abs(out.astype(float) - frames.astype(float)).mean()
        assert err < 6.0, err

    def test_cross_container_hashes_identical(self):
        # MJPEG-in-AVI and MJPEG-in-MP4 of the same footage carry
        # byte-identical JPEG samples → identical dHash sets; the
        # container walk is the only thing under test
        frames = _smooth_frames()
        assert frame_dhashes(
            avi_from_frames(frames, codec="MJPG")
        ) == frame_dhashes(mp4_from_frames(frames))

    def test_multi_chunk_sample_table(self):
        # hand-build a 2-chunk layout (3 + 2 samples) to exercise the
        # full stsc-run × stco × stsz resolution, not just the
        # single-chunk layout our writer emits
        frames = _smooth_frames(5)
        samples = [
            jpeg_from_pixels(frames[k][..., ::-1]) for k in range(5)
        ]
        sizes = [len(s) for s in samples]
        ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isom")
        gap = b"\xde\xad"  # non-contiguous chunks
        mdat_body = b"".join(samples[:3]) + gap + b"".join(samples[3:])
        mdat = _box(b"mdat", mdat_body)
        off1 = len(ftyp) + 8
        off2 = off1 + sum(sizes[:3]) + len(gap)
        ref = mp4_from_frames(frames)  # steal the full moov …
        moov_start = ref.index(b"moov") - 4
        moov = bytearray(ref[moov_start:])
        # … then swap its stsc and stco for the 2-chunk layout
        stsc_new = _full_box(
            b"stsc", 0, 0,
            struct.pack(">I", 2)
            + struct.pack(">III", 1, 3, 1)
            + struct.pack(">III", 2, 2, 1),
        )
        stco_new = _full_box(
            b"stco", 0, 0, struct.pack(">III", 2, off1, off2)
        )
        payload = bytes(moov)
        i_stsc = payload.index(b"stsc") - 4
        old_len = struct.unpack_from(">I", payload, i_stsc)[0]
        payload = (
            payload[:i_stsc] + stsc_new + payload[i_stsc + old_len:]
        )
        i_stco = payload.index(b"stco") - 4
        old_len = struct.unpack_from(">I", payload, i_stco)[0]
        payload = (
            payload[:i_stco] + stco_new + payload[i_stco + old_len:]
        )
        # fix every enclosing box size (moov/trak/mdia/minf/stbl)
        delta = len(payload) - len(ref[moov_start:])
        out = bytearray(payload)
        for fourcc in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
            j = out.index(fourcc) - 4
            struct.pack_into(
                ">I", out, j, struct.unpack_from(">I", out, j)[0] + delta
            )
        full = ftyp + mdat + bytes(out)
        decoded = mp4_frames(full)
        assert decoded.shape == frames.shape
        assert np.array_equal(decoded, mp4_frames(mp4_from_frames(frames)))

    @pytest.mark.parametrize(
        "mutate",
        [
            lambda p: p[:30],
            lambda p: p[:200],
            lambda p: p[:4] + b"ftyp" + b"\x00" * 8,
            lambda p: p.replace(b"jpeg", b"avc1", 1),  # unsupported codec
            lambda p: p.replace(b"moov", b"m00v", 1),
            lambda p: p[: len(p) // 2],  # truncated moov
        ],
    )
    def test_corrupt_payloads_raise_valueerror_only(self, mutate):
        payload = mp4_from_frames(_smooth_frames(3))
        with pytest.raises(ValueError):
            mp4_frames(mutate(payload))

    def test_decode_features_real_mp4_path(self, spark):
        from onechronos_etl_takehome_spark.operators import multimodal as mm

        frames = _smooth_frames(3)
        p = mp4_from_frames(frames)
        df = spark.createDataFrame(
            [(1, bytearray(p), "video"), (2, bytearray(b"junk" * 10), "binary")],
            "id long, content binary, modality string",
        )
        rows = {
            r["id"]: r for r in mm.decode_features(df).collect()
        }
        assert rows[1]["decoder"] == "mp4"
        assert rows[2]["decoder"] == "stub"
        # lead-frame dims land in the shared feature layout
        assert rows[1]["features"][0] == 56.0  # width
        assert rows[1]["features"][1] == 40.0  # height


class TestMp4Properties:
    """Hypothesis round-trips: the container walk must be exact for
    ANY frame count/geometry the writer emits (the JPEG sample codec's
    loss is pinned separately — here we pin container framing, sample
    boundaries, and the stsc/stco/stsz arithmetic)."""

    def test_container_roundtrip_any_geometry(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=20, deadline=None)
        @given(
            n=st.integers(1, 7),
            h=st.integers(8, 33),
            w=st.integers(8, 41),
            seed=st.integers(0, 2**31 - 1),
        )
        def check(n, h, w, seed):
            rng = np.random.RandomState(seed)
            # smooth per-frame gradients: container must carry any size
            base = rng.randint(0, 64, size=(n, 1, 1, 3))
            yy, xx = np.mgrid[0:h, 0:w]
            grad = (
                (96 + 64 * np.sin(xx / 7.0) + 48 * np.cos(yy / 5.0))[
                    None, :, :, None
                ]
            )
            frames = np.clip(base + grad, 0, 255).astype(np.uint8)
            payload = mp4_from_frames(frames)
            out = mp4_frames(payload)
            assert out.shape == frames.shape
            # per-sample JPEG loss is bounded; the CONTAINER adds none:
            # decoding the MP4 equals decoding each sample standalone
            from onechronos_etl_takehome_spark.operators.jpeg import (
                jpeg_pixels,
            )

            direct = np.stack(
                [
                    jpeg_pixels(
                        jpeg_from_pixels(frames[k][..., ::-1])
                    )[..., ::-1]
                    for k in range(n)
                ]
            )
            assert np.array_equal(out, direct)

        check()

    def test_truncation_never_escapes_valueerror(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        payload = mp4_from_frames(_smooth_frames(3))

        @settings(max_examples=60, deadline=None)
        @given(cut=st.integers(12, len(payload) - 1))
        def check(cut):
            try:
                mp4_frames(payload[:cut])
            except ValueError:
                pass  # the only allowed failure mode

        check()


# ---------------------------------------------------------------------------
# m13 — cross-container witness
# ---------------------------------------------------------------------------


class TestM13CrossContainer:
    def test_m13_pairs_equal_m12(self, spark, sf_dir):
        from onechronos_etl_takehome_spark.plans import QUERIES

        m12 = {
            (r["id_a"], r["id_b"])
            for r in QUERIES["m12_crosscodec_video_neardup"](
                spark, sf_dir
            ).collect()
        }
        m13 = {
            (r["id_a"], r["id_b"])
            for r in QUERIES["m13_crosscontainer_video_neardup"](
                spark, sf_dir
            ).collect()
        }
        assert m12 == m13 and len(m13) > 0

    def test_exact_containment_finds_zero_cross_container(self, spark, sf_dir):
        # raw-DIB frames vs JPEG-quantized frames share no exact
        # dHash → the tolerant join is doing real work
        from onechronos_etl_takehome_spark.operators import video as vid
        from onechronos_etl_takehome_spark.sources.readers import (
            read_binary_dir,
        )
        from pyspark.sql import functions as F

        corpus = vid.materialize_demo_video_corpus(sf_dir)
        payloads = read_binary_dir(spark, corpus, glob="*.{avi,mp4}").select(
            F.regexp_extract("id", r"doc_(\d+)\.(avi|mp4)$", 1)
            .cast("long")
            .alias("id"),
            "content",
            "modality",
        )
        assert vid.video_match_pairs(payloads, min_containment=0.3).count() == 0


# ---------------------------------------------------------------------------
# Lineage-truncation invariance (round-7 scan-fan-out fixes)
# ---------------------------------------------------------------------------


class TestTruncationInvariance:
    def test_prefix_sum_truncate_matches_untruncated(self, spark):
        from onechronos_etl_takehome_spark.operators.sampling import prefix_sum

        df = spark.createDataFrame(
            [(int(k), int(k % 7 + 1)) for k in range(200)], "k long, w long"
        )
        a = {
            (r["k"], r["cum"])
            for r in prefix_sum(df, "k", "w", truncate=True).collect()
        }
        b = {
            (r["k"], r["cum"])
            for r in prefix_sum(df, "k", "w", truncate=False).collect()
        }
        assert a == b

    def test_scd2_apply_truncate_matches_untruncated(self, spark):
        from onechronos_etl_takehome_spark.operators.scd2 import (
            scd2_apply,
            scd2_build,
        )

        log = spark.createDataFrame(
            [
                (1, "a", 1.0, 1), (1, "a", 2.0, 2), (1, "b", 3.0, 3),
                (2, "x", 1.5, 4), (2, "y", 4.0, 5),
            ],
            "user_id long, state string, ts double, eid long",
        )
        hist = log.filter("ts < 3")
        inc = log.filter("ts >= 3")
        dim = scd2_build(hist, "user_id", "state", "ts", "eid")

        def key(df):
            return {
                (r["user_id"], r["version"], r["state"], r["valid_from"],
                 r["valid_to"])
                for r in df.collect()
            }

        merged_t = scd2_apply(dim, inc, "user_id", "state", "ts", "eid")
        merged_u = scd2_apply(
            dim, inc, "user_id", "state", "ts", "eid", truncate=False
        )
        full = scd2_build(log, "user_id", "state", "ts", "eid")
        assert key(merged_t) == key(merged_u) == key(full)


# ---------------------------------------------------------------------------
# segment-dedup max_segs guard (round-7 ADVICE fix)
# ---------------------------------------------------------------------------


class TestSegmentGuard:
    def test_overflowing_document_raises(self, spark):
        from onechronos_etl_takehome_spark.operators.text import segment_dedup

        long_doc = " ".join(str(i) for i in range(65))
        df = spark.createDataFrame([(1, long_doc)], "id long, text string")
        with pytest.raises(Exception, match="max_segs"):
            segment_dedup(
                df, "id", "text", seg_tokens=1, max_segs=64
            ).collect()

    def test_at_bound_document_ok(self, spark):
        from onechronos_etl_takehome_spark.operators.text import segment_dedup

        doc = " ".join(str(i) for i in range(64))  # exactly max_segs
        df = spark.createDataFrame([(1, doc)], "id long, text string")
        rows = segment_dedup(
            df, "id", "text", seg_tokens=1, max_segs=64
        ).collect()
        assert rows[0]["n_segs"] == 64 and rows[0]["n_kept"] == 64


# ---------------------------------------------------------------------------
# 4:2:0 JPEG (round-8 de-stub: operators/jpeg.py chroma subsampling)
# ---------------------------------------------------------------------------


def test_jpeg_420_roundtrip_is_quantization_bounded():
    """4:2:0 adds 2×2 chroma box-averaging on top of Annex-K
    quantization — smooth gradients must still round-trip within a
    small bound (odd dims exercise the 16×16 MCU edge padding)."""
    import numpy as np

    from onechronos_etl_takehome_spark.operators.jpeg import (
        jpeg_from_pixels,
        jpeg_pixels,
    )

    for h, w in ((16, 16), (13, 21), (9, 40), (32, 24)):
        yy, xx = np.mgrid[0:h, 0:w]
        base = 128 + 70 * np.sin(2 * np.pi * xx / w) + 30 * np.cos(
            2 * np.pi * yy / h
        )
        px = np.clip(
            np.stack([base, base * 0.9, base * 1.1], axis=-1), 0, 255
        ).astype(np.uint8)
        enc = jpeg_from_pixels(px, subsampling="420")
        # the SOF really declares 2x2 luma sampling (not a 444 alias)
        assert bytes([1, 0x22, 0]) in enc
        got = jpeg_pixels(enc).astype(int)
        err = np.abs(got - px.astype(int))
        assert err.mean() < 5 and err.max() <= 30, (h, w, err.max())


def test_jpeg_420_dhash_matches_444_encode():
    """The perceptual property the near-dup family depends on: the
    dHash of a 4:2:0 re-encode stays within a small Hamming distance
    of the 4:4:4 encode of the same pixels (dHash is luma-driven;
    chroma subsampling must barely move it)."""
    import numpy as np

    from onechronos_etl_takehome_spark.operators.jpeg import (
        jpeg_from_pixels,
    )
    from onechronos_etl_takehome_spark.operators.jpeg import jpeg_pixels
    from onechronos_etl_takehome_spark.operators.multimodal import dhash64

    yy, xx = np.mgrid[0:24, 0:32]
    base = 128 + 70 * np.sin(2 * np.pi * xx / 32) + 30 * np.cos(
        2 * np.pi * yy / 24
    )
    px = np.clip(
        np.stack([base, base * 0.8, base * 1.2], axis=-1), 0, 255
    ).astype(np.uint8)

    def gray(payload):
        return jpeg_pixels(payload).astype(np.float64).mean(axis=2)

    h444 = dhash64(gray(jpeg_from_pixels(px)))
    h420 = dhash64(gray(jpeg_from_pixels(px, subsampling="420")))
    assert bin(h444 ^ h420).count("1") <= 4


def test_jpeg_420_rides_decode_features_dispatch(spark):
    """A 4:2:0 payload flows through the Arrow-batched decode dispatch
    like any other JPEG — no stub fallback, real dimensions."""
    import numpy as np

    from onechronos_etl_takehome_spark.operators.jpeg import (
        jpeg_from_pixels,
    )
    from onechronos_etl_takehome_spark.operators.multimodal import (
        decode_features,
    )

    px = np.clip(
        128 + 60 * np.sin(np.arange(20 * 24).reshape(20, 24) / 7.0), 0, 255
    ).astype(np.uint8)
    px = np.repeat(px[..., None], 3, axis=2)
    rows = [(0, jpeg_from_pixels(px, subsampling="420"), "image")]
    df = spark.createDataFrame(
        rows, "id long, content binary, modality string"
    )
    got = decode_features(df).collect()[0]
    assert got.decoder == "jpeg"
    # feature vector leads with (width, height)
    assert got.features[0] == 24.0 and got.features[1] == 20.0


def test_jpeg_rejects_fractional_sampling_ratio():
    import numpy as np

    import pytest

    from onechronos_etl_takehome_spark.operators.jpeg import (
        jpeg_from_pixels,
        jpeg_pixels,
    )

    px = np.full((16, 16, 3), 90, dtype=np.uint8)
    enc = jpeg_from_pixels(px)
    # patch SOF: Y 3x3, Cb 2x2 → vmax=3 not divisible by Cb's 2
    bad = enc.replace(bytes([1, 0x11, 0]), bytes([1, 0x33, 0]), 1).replace(
        bytes([2, 0x11, 1]), bytes([2, 0x22, 1]), 1
    )
    with pytest.raises(ValueError, match="sampling"):
        jpeg_pixels(bad)


def test_jpeg_restart_markers_decode_pixel_identical():
    """DRI/RSTn round-trip (round-8): restart markers only re-sync the
    entropy stream (byte alignment + DC predictor reset) — the decoded
    pixels must be EXACTLY the restart-free encode's, for every
    subsampling mode, gray, and odd dims."""
    import numpy as np

    from onechronos_etl_takehome_spark.operators.jpeg import (
        jpeg_from_pixels,
        jpeg_pixels,
    )

    yy, xx = np.mgrid[0:29, 0:37]
    base = 128 + 70 * np.sin(2 * np.pi * xx / 37) + 30 * np.cos(
        2 * np.pi * yy / 29
    )
    px = np.clip(
        np.stack([base, base * 0.9, base * 1.1], axis=-1), 0, 255
    ).astype(np.uint8)
    for sub in ("444", "420"):
        plain = jpeg_pixels(jpeg_from_pixels(px, subsampling=sub))
        for ri in (1, 3, 7):
            enc = jpeg_from_pixels(px, subsampling=sub, restart_interval=ri)
            assert b"\xff\xdd" in enc  # DRI present
            assert np.array_equal(plain, jpeg_pixels(enc)), (sub, ri)
    g = px[..., 0]
    assert np.array_equal(
        jpeg_pixels(jpeg_from_pixels(g)),
        jpeg_pixels(jpeg_from_pixels(g, restart_interval=2)),
    )


def test_jpeg_corrupt_restart_marker_raises():
    import numpy as np

    import pytest

    from onechronos_etl_takehome_spark.operators.jpeg import (
        jpeg_from_pixels,
        jpeg_pixels,
    )

    px = np.full((24, 24, 3), 77, dtype=np.uint8)
    enc = jpeg_from_pixels(px, restart_interval=1)
    # corrupt the first RST0 marker byte (FF D0 → FF C8 is a reserved
    # marker the scan must reject)
    bad = enc.replace(b"\xff\xd0", b"\xff\xc8", 1)
    with pytest.raises(ValueError):
        jpeg_pixels(bad)


def test_tolerant_matcher_arity3_recovers_planted_twins(spark):
    """The round-8 birthday-term lever: 3-chunk composite keys
    (C(8,3)=56 triples, 24-bit values — 128× fewer cross-video
    collisions than arity 2) must still recover every planted
    cross-codec twin at sf0.001 except the two whose surviving
    frames all sit in the 6-7-bit drift tail; frame-losslessness
    drops to 5 bits and most of the tail is containment-absorbed."""
    from onechronos_etl_takehome_spark.operators import video as vid
    from onechronos_etl_takehome_spark.session import pin_semantics

    pin_semantics(spark)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pay = vid.demo_crosscodec_video_payloads(docs, "doc_id")
    rows = vid.video_match_pairs_tolerant(
        pay, min_containment=0.6, composite_arity=3
    ).collect()
    got = {(r.id_a, r.id_b) for r in rows}
    want = {(40 * g, 40 * g + 10) for g in range(13)} | {
        (40 * g + 20, 40 * g + 30) for g in range(12)
    }
    # the documented trade: no false pairs, and 23 of the 25 planted
    # twins survive (the two losses are twins whose high-detail frames
    # drift 6-7 bits across >5 distinct chunks — arity 2 keeps them,
    # arity 3 spends that recall to divide cross-video collisions by
    # 128; measured and pinned, not asserted away)
    assert got <= want
    assert len(got) == 23, sorted(want - got)
    import pytest

    with pytest.raises(ValueError, match="composite_arity"):
        vid.video_match_pairs_tolerant(pay, composite_arity=4)


def test_jpeg_progressive_decodes_pixel_identical_to_baseline():
    """Progressive (SOF2) conformance oracle: the progressive encode
    carries EXACTLY the baseline's quantized coefficients, so decode
    must be PIXEL-IDENTICAL to the baseline decode — across 444/420/
    gray, smooth, noise (dense AC → ZRL + refinement paths), flat
    (EOB-heavy), and odd dims. No tolerance for a bug to hide behind."""
    import numpy as np

    from onechronos_etl_takehome_spark.operators.jpeg import (
        jpeg_from_pixels,
        jpeg_pixels,
    )

    rng = np.random.RandomState(42)
    cases = []
    yy, xx = np.mgrid[0:29, 0:37]
    base = 128 + 70 * np.sin(2 * np.pi * xx / 37) + 30 * np.cos(
        2 * np.pi * yy / 29
    )
    cases.append(
        np.clip(
            np.stack([base, base * 0.9, base * 1.1], -1), 0, 255
        ).astype(np.uint8)
    )
    cases.append(rng.randint(0, 256, (24, 31, 3), dtype=np.uint8))
    cases.append(np.full((17, 8, 3), 13, dtype=np.uint8))
    cases.append(rng.randint(0, 256, (33, 40), dtype=np.uint8))
    for px in cases:
        for sub in ("444", "420") if px.ndim == 3 else ("444",):
            enc = jpeg_from_pixels(px, subsampling=sub, progressive=True)
            assert b"\xff\xc2" in enc  # really SOF2
            assert np.array_equal(
                jpeg_pixels(enc),
                jpeg_pixels(jpeg_from_pixels(px, subsampling=sub)),
            ), (px.shape, sub)


def test_jpeg_progressive_rides_decode_dispatch(spark):
    import numpy as np

    from onechronos_etl_takehome_spark.operators.jpeg import (
        jpeg_from_pixels,
    )
    from onechronos_etl_takehome_spark.operators.multimodal import (
        decode_features,
    )

    px = np.clip(
        128 + 60 * np.sin(np.arange(18 * 22).reshape(18, 22) / 5.0), 0, 255
    ).astype(np.uint8)
    px = np.repeat(px[..., None], 3, axis=2)
    rows = [(0, jpeg_from_pixels(px, progressive=True), "image")]
    df = spark.createDataFrame(
        rows, "id long, content binary, modality string"
    )
    got = decode_features(df).collect()[0]
    assert got.decoder == "jpeg"  # real decode, not the stub
    assert got.features[0] == 22.0 and got.features[1] == 18.0


def test_jpeg_progressive_corrupt_payloads_raise():
    import numpy as np

    import pytest

    from onechronos_etl_takehome_spark.operators.jpeg import (
        jpeg_from_pixels,
        jpeg_pixels,
    )

    px = np.full((16, 16, 3), 90, dtype=np.uint8)
    enc = jpeg_from_pixels(px, progressive=True)
    with pytest.raises(ValueError):
        jpeg_pixels(enc[: len(enc) // 2])  # truncated mid-scan
    with pytest.raises(ValueError):
        jpeg_from_pixels(px, progressive=True, restart_interval=2)


def test_crossprofile_mjpeg_twins_pair_across_subsampling(spark):
    """A platform re-encode usually changes the CHROMA PROFILE too:
    the same footage as 4:4:4 MJPEG and as 4:2:0 MJPEG must still pair
    under the tolerant matcher (dHash is luma-driven; the measured
    420-vs-444 drift is <= 4 bits, inside the 7-bit radius), while the
    exact containment join sees nothing."""
    import numpy as np

    from onechronos_etl_takehome_spark.operators import video as vid

    frames = _smooth_frames(6, 40, 56)
    rows = [
        (0, bytearray(vid.avi_from_frames(frames, codec="MJPG")), "video"),
        (
            1,
            bytearray(
                vid.avi_from_frames(
                    frames, codec="MJPG", subsampling="420"
                )
            ),
            "video",
        ),
    ]
    pay = spark.createDataFrame(
        rows, "id long, content binary, modality string"
    )
    assert vid.video_match_pairs(pay, min_containment=0.6).count() == 0
    got = vid.video_match_pairs_tolerant(pay, min_containment=0.6).collect()
    assert [(r.id_a, r.id_b) for r in got] == [(0, 1)]
    assert got[0].containment >= 0.8
