"""Round-14 optimization pins: the JPEG fast paths must be EXACTLY
the reference machinery.

The optimization round rewired the baseline JPEG entropy coder
(guide §4.2 — hoist per-block numpy into batched plane passes, LUT
huffman decode instead of per-bit dict probes) behind two module
flags, keeping the original per-bit walk as the reference
implementation. These tests pin byte- (encode) and pixel- (decode)
identity between the two, so the fast paths can never drift the
fixture payloads or the decoded hashes of the m08/m12 families.

Pure-python module: no SparkSession needed.
"""

from __future__ import annotations

import numpy as np
import pytest

from onechronos_etl_takehome_spark.operators import jpeg as J


@pytest.fixture(autouse=True)
def _restore_flags():
    yield
    J._FAST_ENCODE = True
    J._FAST_SCAN = True


def _images():
    rng = np.random.RandomState(7)
    out = []
    for h, w in [(40, 54), (24, 24), (16, 16), (29, 37), (8, 8), (13, 9)]:
        out.append(rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8))
        base = np.clip(
            128 + 80 * np.sin(np.mgrid[0:h, 0:w][1] / 5.0), 0, 255
        ).astype(np.uint8)
        out.append(np.repeat(base[..., None], 3, axis=2))
    return out


def test_stacked_matmul_is_bit_identical_to_per_block_dct():
    """The encoder's batched DCT relies on np.matmul over stacked
    (N, 8, 8) blocks reproducing per-block ``_dct2`` EXACTLY (a
    half-integer coefficient rounding differently would change
    payload bytes). einsum does NOT have this property — only the
    stacked matmul form may ever be substituted."""
    rng = np.random.RandomState(3)
    blocks = rng.rand(5000, 8, 8) * 255.0 - 128.0
    ref = np.stack([J._dct2(b) for b in blocks])
    assert np.array_equal(ref, J._DCT @ blocks @ J._DCT.T)


@pytest.mark.parametrize("sub", ["444", "420"])
@pytest.mark.parametrize("ri", [0, 1, 3])
@pytest.mark.parametrize("q", [None, 25, 90])
def test_fast_encode_bytes_identical(sub, ri, q):
    for px in _images():
        J._FAST_ENCODE = True
        fast = J.jpeg_from_pixels(
            px, subsampling=sub, restart_interval=ri, quality=q
        )
        J._FAST_ENCODE = False
        ref = J.jpeg_from_pixels(
            px, subsampling=sub, restart_interval=ri, quality=q
        )
        assert fast == ref


def test_fast_encode_bytes_identical_grayscale():
    for px in _images():
        for ri in (0, 2):
            J._FAST_ENCODE = True
            fast = J.jpeg_from_pixels(px[..., 0], restart_interval=ri)
            J._FAST_ENCODE = False
            ref = J.jpeg_from_pixels(px[..., 0], restart_interval=ri)
            assert fast == ref


def test_fast_decode_pixels_identical():
    payloads = []
    for px in _images():
        for sub in ("444", "420"):
            for ri in (0, 3):
                payloads.append(
                    J.jpeg_from_pixels(px, subsampling=sub, restart_interval=ri)
                )
        payloads.append(J.jpeg_from_pixels(px[..., 0], restart_interval=2))
        payloads.append(J.jpeg_from_pixels(px, progressive=True))
    for enc in payloads:
        J._FAST_SCAN = True
        fast = J.jpeg_pixels(enc)
        J._FAST_SCAN = False
        ref = J.jpeg_pixels(enc)
        assert np.array_equal(fast, ref)


def test_fast_decode_error_contract():
    """Corrupt payloads raise ValueError through the fast path too —
    the fall-to-stub contract every decoder in the package honors."""
    px = np.full((24, 24, 3), 77, dtype=np.uint8)
    enc = J.jpeg_from_pixels(px, restart_interval=1)
    bad = enc.replace(b"\xff\xd0", b"\xff\xc8", 1)
    with pytest.raises(ValueError):
        J.jpeg_pixels(bad)
    good = J.jpeg_from_pixels(px)
    with pytest.raises(ValueError):
        J.jpeg_pixels(good[:40])
    # truncated mid-scan: cut inside the entropy segment
    with pytest.raises(ValueError):
        J.jpeg_pixels(good[: len(good) - 10] + b"\xff")
    # huffman desync (flip entropy bytes until one fails) must raise,
    # never loop or return garbage silently from a DIFFERENT error
    # class than the reference path
    corrupt = bytearray(good)
    corrupt[-12] ^= 0x55
    try:
        J._FAST_SCAN = True
        a = J.jpeg_pixels(bytes(corrupt))
        fast_outcome = ("ok", a.shape)
    except ValueError:
        fast_outcome = ("raise", None)
    try:
        J._FAST_SCAN = False
        b = J.jpeg_pixels(bytes(corrupt))
        ref_outcome = ("ok", b.shape)
    except ValueError:
        ref_outcome = ("raise", None)
    assert fast_outcome[0] == ref_outcome[0]
    # FF FF fill bytes planted mid-scan (round-14 advice): the
    # reference _BitReader raises "unexpected marker" when it consumes
    # one; the fast pre-pass must reject the scan too, never treat the
    # first FF as entropy data and mis-decode.
    sos = good.find(b"\xff\xda")
    assert sos > 0
    scan_start = sos + 2 + int.from_bytes(good[sos + 2 : sos + 4], "big")
    filled = good[: scan_start + 2] + b"\xff\xff" + good[scan_start + 2 :]
    for flag in (True, False):
        try:
            J._FAST_SCAN = flag
            with pytest.raises(ValueError):
                J.jpeg_pixels(filled)
        finally:
            J._FAST_SCAN = True


def test_progressive_coefs_match_baseline_walk():
    """_plane_zz_coefs (now batched) still carries EXACTLY the
    baseline coefficients — the progressive == baseline pixel-identity
    oracle's precondition."""
    rng = np.random.RandomState(11)
    for h, w in [(16, 16), (24, 24), (18, 22)]:
        px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        for sub in ("444", "420"):
            prog = J.jpeg_pixels(
                J.jpeg_from_pixels(px, subsampling=sub, progressive=True)
            )
            base = J.jpeg_pixels(J.jpeg_from_pixels(px, subsampling=sub))
            assert np.array_equal(prog, base)
