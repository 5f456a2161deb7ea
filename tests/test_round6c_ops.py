"""Round-6c: the real PNG decoder (stdlib zlib + numpy) — round-trip,
all five predictor filters, all supported color types, corrupt-payload
contract, and the decode_features dispatch."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from onechronos_etl_takehome_spark.operators.multimodal import (
    _decode_png,
    png_from_pixels,
    png_pixels,
    sniff_modality,
    synthesize_png,
)

_MAGIC = b"\x89PNG\r\n\x1a\n"
SF = "/root/testdata/sf0.001"


def _chunk(ctype: bytes, data: bytes) -> bytes:
    crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
    return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)


def _png(width, height, color_type, channels, scanlines: bytes) -> bytes:
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(scanlines))
        + _chunk(b"IEND", b"")
    )


def _filter_row(ftype, cur, prev, channels):
    """Forward PNG filtering (encoder side) — the spec's reference."""
    out = np.zeros_like(cur, dtype=np.int32)
    c32, p32 = cur.astype(np.int32), prev.astype(np.int32)
    for i in range(len(cur)):
        a = c32[i - channels] if i >= channels else 0
        b = p32[i]
        c = p32[i - channels] if i >= channels else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) // 2
        else:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        out[i] = (c32[i] - pred) & 0xFF
    return out.astype(np.uint8)


def test_png_roundtrip_various_shapes():
    rng = np.random.RandomState(5)
    for h, w in ((1, 1), (1, 9), (9, 1), (16, 16), (13, 31)):
        px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (png_pixels(png_from_pixels(px)) == px).all(), (h, w)


def test_png_every_filter_type_decodes():
    """Encode with each predictor explicitly (spec-reference forward
    filter) and require exact reconstruction."""
    rng = np.random.RandomState(9)
    h, w, ch = 6, 7, 3
    px = rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)
    flat = px.reshape(h, w * ch)
    for ftype in range(5):
        lines = b""
        prev = np.zeros(w * ch, dtype=np.uint8)
        for y in range(h):
            lines += bytes([ftype]) + _filter_row(
                ftype, flat[y], prev, ch
            ).tobytes()
            prev = flat[y]
        got = png_pixels(_png(w, h, 2, ch, lines))
        assert (got == px).all(), f"filter {ftype}"


def test_png_color_types():
    rng = np.random.RandomState(2)
    h, w = 5, 4
    # grayscale (type 0)
    g = rng.randint(0, 256, size=(h, w), dtype=np.uint8)
    lines = b"".join(b"\x00" + g[y].tobytes() for y in range(h))
    got = png_pixels(_png(w, h, 0, 1, lines))
    assert (got == np.repeat(g[..., None], 3, axis=2)).all()
    # gray + alpha (type 4): alpha dropped
    ga = rng.randint(0, 256, size=(h, w, 2), dtype=np.uint8)
    lines = b"".join(
        b"\x00" + ga[y].reshape(-1).tobytes() for y in range(h)
    )
    got = png_pixels(_png(w, h, 4, 2, lines))
    assert (got == np.repeat(ga[..., :1], 3, axis=2)).all()
    # RGBA (type 6): alpha dropped
    rgba = rng.randint(0, 256, size=(h, w, 4), dtype=np.uint8)
    lines = b"".join(
        b"\x00" + rgba[y].reshape(-1).tobytes() for y in range(h)
    )
    got = png_pixels(_png(w, h, 6, 4, lines))
    assert (got == rgba[..., :3]).all()


def test_png_rejects_bad_payloads():
    with pytest.raises(ValueError):
        png_pixels(b"not a png at all")
    good = synthesize_png(8, 8, 1)
    with pytest.raises(ValueError):  # corrupt zlib stream
        png_pixels(good[:40] + b"\x00" * 8 + good[48:])
    with pytest.raises(ValueError):  # truncated
        png_pixels(good[:30])
    # palette (type 3) and 16-bit are declared unsupported
    ihdr16 = struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)
    with pytest.raises(ValueError):
        png_pixels(_MAGIC + _chunk(b"IHDR", ihdr16) + _chunk(b"IEND", b""))


def test_png_sniff_and_feature_battery():
    payload = synthesize_png(12, 10, 7)
    assert sniff_modality(payload) == "png"
    feats = _decode_png(payload, 16)
    px = png_pixels(payload).astype(np.float64)
    gray = 0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
    assert feats[0] == 12.0 and feats[1] == 10.0
    assert feats[2] == pytest.approx(px[..., 0].mean())
    assert feats[5] == pytest.approx(gray.mean())
    assert feats[13] == pytest.approx(12 / 10)


def test_decode_features_dispatches_png(spark):
    from onechronos_etl_takehome_spark.operators.multimodal import (
        decode_features,
    )

    rows = [
        (0, synthesize_png(8, 8, 0), "image"),
        (1, b"\x89PNG\r\n\x1a\n garbage after magic", "image"),  # corrupt
        (2, b"utterly opaque bytes", "blob"),
    ]
    df = spark.createDataFrame(rows, "id long, content binary, modality string")
    got = {r.id: r for r in decode_features(df).collect()}
    assert got[0].decoder == "png"
    assert got[1].decoder == "stub"  # corrupt PNG falls to stub, no crash
    assert got[2].decoder == "stub"
    assert got[0].features[0] == 8.0


def test_dhash_is_encoding_invariant(spark):
    """The SAME pixels encoded as BMP and as PNG must produce the SAME
    64-bit dHash — re-encoding invariance is what makes the perceptual
    hash usable across a mixed-format corpus."""
    from onechronos_etl_takehome_spark.operators.multimodal import (
        bmp_from_pixels,
        image_dhash,
    )

    rng = np.random.RandomState(21)
    rows = []
    for i in range(6):
        px_rgb = rng.randint(0, 256, size=(16, 20, 3), dtype=np.uint8)
        rows.append((2 * i, png_from_pixels(px_rgb), "image"))
        rows.append(
            (2 * i + 1, bmp_from_pixels(px_rgb[..., ::-1].copy()), "image")
        )  # BMP stores BGR
    df = spark.createDataFrame(rows, "id long, content binary, modality string")
    got = {r.id: r.dhash for r in image_dhash(df).collect()}
    assert len(got) == 12
    for i in range(6):
        assert got[2 * i] == got[2 * i + 1], i


# ---------------------------------------------------------------------------
# baseline JPEG codec (operators/jpeg.py)
# ---------------------------------------------------------------------------


def test_jpeg_constant_image_is_near_exact():
    """A constant block has only a DC coefficient — quantization loss
    is at most one luma quant step spread by the IDCT (±2 gray)."""
    from onechronos_etl_takehome_spark.operators.jpeg import (
        jpeg_from_pixels,
        jpeg_pixels,
    )

    for val in (0, 73, 128, 201, 255):
        px = np.full((16, 16, 3), val, dtype=np.uint8)
        got = jpeg_pixels(jpeg_from_pixels(px)).astype(int)
        assert np.abs(got - int(val)).max() <= 2, val


def test_jpeg_roundtrip_error_is_quantization_bounded():
    """Smooth gradients survive Annex-K quantization within a small
    bound; odd (non-multiple-of-8) dims exercise edge padding."""
    from onechronos_etl_takehome_spark.operators.jpeg import (
        jpeg_from_pixels,
        jpeg_pixels,
    )

    for h, w in ((8, 8), (16, 24), (13, 21), (9, 40)):
        yy, xx = np.mgrid[0:h, 0:w]
        base = 128 + 70 * np.sin(2 * np.pi * xx / w) + 30 * np.cos(
            2 * np.pi * yy / h
        )
        px = np.clip(
            np.stack([base, base * 0.9, base * 1.1], axis=-1), 0, 255
        ).astype(np.uint8)
        got = jpeg_pixels(jpeg_from_pixels(px)).astype(int)
        err = np.abs(got - px.astype(int))
        assert err.mean() < 4 and err.max() <= 25, (h, w, err.max())


def test_jpeg_grayscale_single_component():
    from onechronos_etl_takehome_spark.operators.jpeg import (
        jpeg_from_pixels,
        jpeg_pixels,
    )

    g = np.clip(
        128 + 60 * np.sin(np.arange(24) / 4.0)[None, :]
        + 20 * np.cos(np.arange(16) / 3.0)[:, None],
        0,
        255,
    ).astype(np.uint8)
    got = jpeg_pixels(jpeg_from_pixels(g))
    assert got.shape == (16, 24, 3)
    assert (got[..., 0] == got[..., 1]).all()  # gray replicated
    assert np.abs(got[..., 0].astype(int) - g.astype(int)).max() <= 10


def test_jpeg_rejects_unsupported_variants():
    from onechronos_etl_takehome_spark.operators.jpeg import (
        jpeg_pixels,
        synthesize_jpeg,
    )

    with pytest.raises(ValueError):
        jpeg_pixels(b"not a jpeg")
    good = synthesize_jpeg(16, 16, 1)
    # flip SOF0 (FFC0) to progressive SOF2 (FFC2)
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError):
        jpeg_pixels(prog)
    with pytest.raises(ValueError):
        jpeg_pixels(good[:40])  # truncated


def test_jpeg_byte_stuffing_roundtrips():
    """Content chosen to force 0xFF bytes in the entropy stream — the
    stuffed-byte path must round-trip."""
    from onechronos_etl_takehome_spark.operators.jpeg import (
        jpeg_from_pixels,
        jpeg_pixels,
    )

    rng = np.random.RandomState(17)
    for seed in range(5):
        px = rng.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)
        enc = jpeg_from_pixels(px)
        dec = jpeg_pixels(enc)  # hard content: just must not corrupt
        assert dec.shape == px.shape


def test_jpeg_dispatch_and_dhash_robustness(spark):
    """decode_features routes JPEG to the real decoder, and the dHash
    of a JPEG re-encode stays within a small Hamming distance of the
    lossless PNG encode of the same pixels (perceptual robustness —
    the property the near-dup family depends on)."""
    from onechronos_etl_takehome_spark.operators.jpeg import (
        jpeg_from_pixels,
        synthesize_jpeg,
    )
    from onechronos_etl_takehome_spark.operators.multimodal import (
        decode_features,
        image_dhash,
    )

    rows = [(0, synthesize_jpeg(16, 16, 4), "image")]
    df = spark.createDataFrame(rows, "id long, content binary, modality string")
    got = decode_features(df).collect()[0]
    assert got.decoder == "jpeg" and got.features[0] == 16.0

    yy, xx = np.mgrid[0:24, 0:32]
    base = 128 + 70 * np.sin(2 * np.pi * xx / 32) + 30 * np.cos(
        2 * np.pi * yy / 24
    )
    px = np.clip(
        np.stack([base, base * 0.8, base * 1.2], axis=-1), 0, 255
    ).astype(np.uint8)
    pair = [
        (0, png_from_pixels(px), "image"),
        (1, jpeg_from_pixels(px), "image"),
    ]
    hdf = spark.createDataFrame(pair, "id long, content binary, modality string")
    hashes = {r.id: r.dhash for r in image_dhash(hdf).collect()}
    ham = bin(hashes[0] ^ hashes[1]).count("1")
    assert ham <= 6, ham


# ---------------------------------------------------------------------------
# Motion-JPEG AVI ('00dc' compressed frame chunks)
# ---------------------------------------------------------------------------


def _smooth_frames(n=4, h=16, w=24):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            np.clip(
                np.stack(
                    [
                        128 + 60 * np.sin(2 * np.pi * (xx + 3 * k) / w),
                        100 + 50 * np.cos(2 * np.pi * yy / h),
                        np.full((h, w), 80 + 10 * k, dtype=float),
                    ],
                    axis=-1,
                ),
                0,
                255,
            ).astype(np.uint8)
            for k in range(n)
        ]
    )


def test_mjpeg_avi_roundtrip_is_quantization_bounded():
    from onechronos_etl_takehome_spark.operators.video import (
        avi_frames,
        avi_from_frames,
    )

    frames = _smooth_frames()
    dib = avi_from_frames(frames, codec="DIB")
    mjpg = avi_from_frames(frames, codec="MJPG")
    assert (avi_frames(dib) == frames).all()  # raw stays exact
    got = avi_frames(mjpg)
    err = np.abs(got.astype(int) - frames.astype(int))
    assert got.shape == frames.shape and err.mean() < 6 and err.max() <= 30


def test_mjpeg_avi_frame_dhashes_match_raw():
    """Perceptual frame hashes survive the MJPEG re-encode: every
    frame's dHash lands within a small Hamming distance of the raw
    encode's — the property the m10 containment join needs to match a
    re-encoded upload against the original."""
    from onechronos_etl_takehome_spark.operators.video import (
        avi_from_frames,
        frame_dhashes,
    )

    frames = _smooth_frames(n=5)
    raw = frame_dhashes(avi_from_frames(frames, codec="DIB"))
    mj = frame_dhashes(avi_from_frames(frames, codec="MJPG"))
    assert len(mj) == len(raw)
    # sets are sorted numerically, not temporally — match each raw
    # hash to its nearest re-encoded hash; random 64-bit pairs expect
    # Hamming ~32, so <=12 is a decisive perceptual match
    for a in raw:
        best = min(bin(a ^ b).count("1") for b in mj)
        assert best <= 12, hex(a)


def test_avi_unknown_compressed_codec_raises():
    from onechronos_etl_takehome_spark.operators.video import (
        avi_frames,
        avi_from_frames,
    )

    frames = _smooth_frames(n=1)
    mjpg = avi_from_frames(frames, codec="MJPG")
    # corrupt the JPEG magic inside the 00dc chunk → ValueError
    bad = mjpg.replace(b"00dc", b"00dc", 1)
    idx = bad.index(b"\xff\xd8\xff", 12)
    bad = bad[:idx] + b"\x00\x00\x00" + bad[idx + 3 :]
    with pytest.raises(ValueError):
        avi_frames(bad)
    with pytest.raises(ValueError):
        avi_from_frames(frames, codec="H264")


# ---------------------------------------------------------------------------
# m12 cross-codec video near-dup
# ---------------------------------------------------------------------------


def test_crosscodec_twins_found_only_by_tolerant_matcher(spark):
    """The planted MJPEG re-encodes defeat exact frame-hash
    containment (m10's join) and are recovered — all of them, and
    nothing else — by the banded-Hamming tolerant matcher."""
    from onechronos_etl_takehome_spark.operators import video as vid
    from onechronos_etl_takehome_spark.session import pin_semantics

    pin_semantics(spark)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pay = vid.demo_crosscodec_video_payloads(docs, "doc_id")
    assert vid.video_match_pairs(pay, min_containment=0.6).count() == 0
    rows = vid.video_match_pairs_tolerant(pay, min_containment=0.6).collect()
    got = {(r.id_a, r.id_b) for r in rows}
    want = {(40 * g, 40 * g + 10) for g in range(13)} | {
        (40 * g + 20, 40 * g + 30) for g in range(12)
    }
    assert got == want
    for r in rows:
        assert r.containment >= 0.6 and r.n_b == r.n_a - 1
    # aggregate quality: most twins match nearly every surviving frame
    # (an occasional high-detail frame drifts past the 7-bit radius)
    strong = sum(1 for r in rows if r.containment >= 0.85)
    assert strong >= len(rows) * 0.8, (strong, len(rows))


def test_tolerant_matcher_rejects_lossy_radius(spark):
    from onechronos_etl_takehome_spark.operators import video as vid

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pay = vid.demo_crosscodec_video_payloads(docs, "doc_id")
    with pytest.raises(ValueError):
        vid.video_match_pairs_tolerant(pay, max_hamming=9, bands=8)
