"""FLAC codec pins (operators/flac.py) — no Spark session needed.

Self-reference honesty: beyond encoder→decoder round-trips, this
module anchors the codec externally three ways:

- the CRC-8/CRC-16 implementations are pinned against PUBLISHED
  check values from the CRC catalogue (``crc8("123456789") == 0xF4``
  for poly 0x07; ``0xFEE8`` for CRC-16/UMTS poly 0x8005) and against
  an independent bitwise reimplementation here;
- ``test_decodes_independently_assembled_stream`` decodes a stream
  hand-built bit-by-bit IN THIS FILE from the published spec layout
  (verbatim + fixed subframes, escaped + method-1 Rice partitions) —
  bytes the encoder under test never produced;
- losslessness is pinned against the WAV path: decode(flac(x)) must
  EXACTLY equal decode(wav(x)) for the same float input.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from onechronos_etl_takehome_spark.operators.flac import (
    crc8,
    crc16,
    flac_decode,
    flac_encode,
    flac_from_samples,
    flac_samples,
    flac_stream_info,
    synthesize_flac,
)


# ---------------------------------------------------------------------------
# CRC anchors.
# ---------------------------------------------------------------------------


def test_crc_published_check_values():
    # CRC catalogue check values for poly 0x07 (CRC-8) and poly
    # 0x8005 init 0 no-reflect (CRC-16/UMTS): external anchors no
    # shared bug between our encoder and decoder can satisfy.
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8


def _crc_bitwise(data: bytes, poly: int, width: int) -> int:
    """Independent no-table reimplementation."""
    crc = 0
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    for b in data:
        crc ^= b << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) if crc & top else crc << 1
            crc &= mask
    return crc


def test_crc_matches_independent_bitwise_form():
    rng = np.random.RandomState(3)
    for _ in range(5):
        blob = rng.randint(0, 256, rng.randint(1, 200)).astype(np.uint8)
        assert crc8(blob.tobytes()) == _crc_bitwise(blob.tobytes(), 0x07, 8)
        assert crc16(blob.tobytes()) == _crc_bitwise(
            blob.tobytes(), 0x8005, 16
        )


# ---------------------------------------------------------------------------
# Round-trips.
# ---------------------------------------------------------------------------


def _tone(n: int, seed: int, scale: float = 0.5) -> np.ndarray:
    rng = np.random.RandomState(seed)
    t = np.arange(n) / 8000.0
    return scale * np.sin(2 * np.pi * (300 * t + 200 * t * t)) + (
        0.01 * rng.standard_normal(n)
    )


@pytest.mark.parametrize(
    "bits,scale", [(8, 100), (16, 20000), (24, 4_000_000)]
)
def test_mono_roundtrip_all_depths(bits, scale):
    pcm = np.clip(
        _tone(9000, bits) * scale, -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    ).astype(np.int64)
    enc = flac_encode(pcm, 8000, bits=bits)
    ch, sr, b, dec = flac_decode(enc)
    assert (ch, sr, b) == (1, 8000, bits)
    assert np.array_equal(dec, pcm)


def test_stereo_roundtrip_and_compression():
    pcm = np.clip(_tone(12000, 7) * 20000, -32768, 32767).astype(np.int64)
    rng = np.random.RandomState(8)
    right = pcm + rng.randint(-4, 5, len(pcm))
    inter = np.empty(2 * len(pcm), np.int64)
    inter[0::2], inter[1::2] = pcm, right
    enc = flac_encode(inter, 44100, channels=2)
    ch, sr, b, dec = flac_decode(enc)
    assert (ch, sr) == (2, 44100)
    assert np.array_equal(dec, inter)
    # correlated stereo must beat 16-bit PCM size by a wide margin
    assert len(enc) < 2 * len(pcm) * 2 * 0.75


def test_constant_wasted_and_odd_blocks():
    # constant block → CONSTANT subframe, tiny stream
    const = np.full(5000, -77, np.int64)
    enc = flac_encode(const, 8000)
    assert len(enc) < 120
    assert np.array_equal(flac_decode(enc)[3], const)
    # shared trailing zero bits → wasted-bits path
    rng = np.random.RandomState(9)
    w = (rng.randint(-900, 900, 4096) * 32).astype(np.int64)
    assert np.array_equal(flac_decode(flac_encode(w, 8000))[3], w)
    # non-power-of-two block size → uncommon blocksize header codes
    pcm = np.clip(_tone(5000, 1) * 20000, -32768, 32767).astype(np.int64)
    for bs in (999, 200, 16):
        assert np.array_equal(
            flac_decode(flac_encode(pcm, 8000, block_size=bs))[3], pcm
        )


def test_wav_parity_exact():
    from onechronos_etl_takehome_spark.operators.multimodal import (
        wav_from_samples,
        wav_samples,
    )

    wave = _tone(8192, 4)
    _, _, via_flac = flac_samples(flac_from_samples(wave, 8000))
    _, _, via_wav = wav_samples(wav_from_samples(wave, 8000))
    assert np.array_equal(via_flac, via_wav)


def test_stream_info_fields():
    info = flac_stream_info(synthesize_flac(2048, 16000, 500.0, 7))
    assert info["container"] == "flac"
    assert info["sample_rate"] == 16000
    assert info["channels"] == 1
    assert info["bits"] == 16
    assert info["n_samples"] == 2048
    assert info["min_block_size"] == info["max_block_size"] == 4096


# ---------------------------------------------------------------------------
# Integrity enforcement.
# ---------------------------------------------------------------------------


def test_corruption_raises_not_garbage():
    pcm = np.clip(_tone(6000, 5) * 20000, -32768, 32767).astype(np.int64)
    enc = bytearray(flac_encode(pcm, 8000))
    for at in (len(enc) // 3, len(enc) // 2, len(enc) - 10):
        bad = bytearray(enc)
        bad[at] ^= 0x10
        with pytest.raises(ValueError):
            flac_decode(bytes(bad))
    with pytest.raises(ValueError):
        flac_decode(bytes(enc[: len(enc) // 2]))  # truncation
    with pytest.raises(ValueError):
        flac_decode(b"fLaC" + bytes(10))  # malformed metadata


def test_md5_mismatch_detected():
    pcm = np.clip(_tone(3000, 6) * 20000, -32768, 32767).astype(np.int64)
    enc = bytearray(flac_encode(pcm, 8000))
    # STREAMINFO MD5 lives at bytes [8+18, 8+34); flip one bit there.
    enc[8 + 20] ^= 0x01
    with pytest.raises(ValueError, match="MD5"):
        flac_decode(bytes(enc))


# ---------------------------------------------------------------------------
# Independently assembled stream (bytes the encoder never wrote).
# ---------------------------------------------------------------------------


class _W:
    """Minimal MSB-first bit writer, reimplemented here on purpose —
    the assembled stream must not share code with the module."""

    def __init__(self):
        self.bits = []

    def u(self, v, n):
        self.bits += [(v >> k) & 1 for k in range(n - 1, -1, -1)]

    def bytes(self):
        assert len(self.bits) % 8 == 0
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            out.append(int("".join(map(str, self.bits[i : i + 8])), 2))
        return bytes(out)


def test_decodes_independently_assembled_stream():
    frame0 = [3, -2, 5, 0, 127, -128, 10, -1]  # verbatim payload
    warm, res = 10, [1, -1, 2, 0, -2, 3, 1]  # fixed order-1 payload
    frame1 = [warm]
    for r in res:
        frame1.append(frame1[-1] + r)
    all_samples = np.asarray(frame0 + frame1, np.int64)

    # STREAMINFO: block size 8, 8 kHz, mono, 8-bit, 16 samples
    si = _W()
    si.u(8, 16)
    si.u(8, 16)
    si.u(0, 24)  # min/max frame size unknown
    si.u(0, 24)
    si.u(8000, 20)
    si.u(0, 3)  # channels - 1
    si.u(7, 5)  # bits - 1
    si.u(16, 36)
    md5 = hashlib.md5(all_samples.astype("<i1").tobytes()).digest()
    stream = b"fLaC" + bytes([0x80, 0, 0, 34]) + si.bytes() + md5

    def header(frame_no):
        h = _W()
        h.u(0b11111111111110, 14)  # sync
        h.u(0, 2)  # reserved + fixed blocking strategy
        h.u(6, 4)  # block size: uncommon, 8-bit field follows
        h.u(4, 4)  # sample rate code: 8 kHz
        h.u(0, 4)  # channels: mono
        h.u(1, 3)  # sample size: 8-bit
        h.u(0, 1)
        h.u(frame_no, 8)  # coded number (< 0x80 → one byte)
        h.u(8 - 1, 8)  # uncommon block size - 1
        hb = h.bytes()
        return hb + bytes([_crc_bitwise(hb, 0x07, 8)])

    # frame 0: VERBATIM subframe
    f0 = _W()
    f0.u(0b0_000001_0, 8)  # pad, type=verbatim, no wasted bits
    for s in frame0:
        f0.u(s & 0xFF, 8)
    body0 = header(0) + f0.bytes()
    body0 += struct.pack(">H", _crc_bitwise(body0, 0x8005, 16))

    # frame 1: FIXED order 1, method-1 Rice, ESCAPED partition
    f1 = _W()
    f1.u(0b0_001001_0, 8)  # pad, type=fixed order 1, no wasted bits
    f1.u(warm & 0xFF, 8)  # warmup sample
    f1.u(1, 2)  # residual coding method 1 (5-bit params)
    f1.u(0, 4)  # partition order 0
    f1.u(0b11111, 5)  # escape code
    f1.u(3, 5)  # raw residuals at 3 bits each
    for r in res:
        f1.u(r & 0b111, 3)
    f1.u(0, (8 - len(f1.bits) % 8) % 8)  # byte-align the frame
    body1 = header(1) + f1.bytes()
    body1 += struct.pack(">H", _crc_bitwise(body1, 0x8005, 16))

    ch, sr, bits, dec = flac_decode(stream + body0 + body1)
    assert (ch, sr, bits) == (1, 8000, 8)
    assert np.array_equal(dec, all_samples)
