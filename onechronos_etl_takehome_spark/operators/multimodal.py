"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: the payload is an opaque
``binary`` column riding next to typed metadata (modality, byte size,
checksum, decode hints). Heavy per-item work (decode, resize, feature
extraction) runs in Arrow-batched ``mapInPandas`` so batches stream
through Python without row-at-a-time overhead, and the *schema* of the
result is declared up front so Catalyst can prune/pushdown around it.

Decoders: four formats decode FOR REAL with pure numpy + stdlib —
uncompressed 24-bit BMP (``_decode_bmp``), 16-bit PCM WAV
(``_decode_wav``), 8-bit PNG (``png_pixels`` — stdlib-zlib inflate +
all five predictor filters), and JPEG — baseline, any integer-ratio
chroma subsampling, restart markers, AND progressive
(``operators/jpeg.py`` — huffman entropy decode + exact 8×8 IDCT;
MJPEG MP4 rides ``operators/mp4.py``).
``decode_features`` sniffs each payload's magic bytes and dispatches;
formats that genuinely need a media library (AVC/HEVC
samples, ...) fall to the clearly-marked deterministic stub
(``_fake_decode``), or raise under ``require_real_decoder=True``.
``synthesize_bmp`` / ``synthesize_wav`` / ``synthesize_png`` /
``jpeg.synthesize_jpeg`` build valid fixtures for tests and demos.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BINARY_META_SCHEMA = "id long, n_bytes long, checksum string"
FEATURE_SCHEMA = (
    "id long, modality string, n_bytes long, decoder string, "
    "features array<double>"
)


def attach_binary(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Demo payload builder: utf-8 bytes of a text column as the opaque
    binary + modality tag. Real ingestion would read image/audio bytes
    via spark.read.format('binaryFile').

    The input must be scan-shaped (every call site passes a
    freshly-loaded table — the ``spread`` contract): downstream
    consumers are CPU-bound per-payload stages (interpreted CDC
    lambdas, Arrow decode), which otherwise run at the file-split
    count of a small corpus — one task at bench scale."""
    from .util import spread

    return spread(df).select(
        F.col(id_col).alias("id"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.lit("text").alias("modality"),
    )


def binary_metadata(payloads: DataFrame) -> DataFrame:
    """(id, n_bytes, checksum) via mapInPandas over the binary column.

    Arrow ships each batch as pandas; hashlib is deterministic, so this
    is oracle-checkable (md5 of utf-8 bytes == md5 of the string).
    """

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_bytes": pdf["content"].map(len).astype("int64"),
                    "checksum": pdf["content"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    # id type passes through: long for the demo corpus, string paths
    # for binaryFile ingestion (sources/readers.read_binary_dir)
    id_type = payloads.schema["id"].dataType.simpleString()
    return payloads.mapInPandas(
        compute, schema=BINARY_META_SCHEMA.replace("id long", f"id {id_type}")
    )


def _fake_decode(payload: bytes, n_features: int) -> list[float]:
    """STUB decoder for formats that need a real media library.

    Deterministic fake: md5-seeded bytes → n_features doubles in [0,1).
    """
    h = hashlib.md5(payload).digest()
    raw = (h * ((n_features // len(h)) + 1))[:n_features]
    return [b / 256.0 for b in raw]


def _pad(vals: list[float], n_features: int) -> list[float]:
    vals = [float(v) for v in vals[:n_features]]
    return vals + [0.0] * (n_features - len(vals))


def _decode_bmp(payload: bytes, n_features: int) -> list[float]:
    """REAL decode of an uncompressed 24-bit BMP (BITMAPINFOHEADER).

    Fixed-offset header + raw BGR rows (bottom-up, 4-byte row padding)
    — numpy reshapes the pixel array directly from the payload bytes.
    Features: dims, per-channel means, gray stats, and 2×2 quadrant
    gray means (a crude layout signature a near-dup pass can use).
    """
    import struct

    import numpy as np

    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    width = struct.unpack_from("<i", payload, 18)[0]
    height = struct.unpack_from("<i", payload, 22)[0]
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0 or width <= 0 or height == 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp})")
    bottom_up = height > 0
    h = abs(height)
    stride = (width * 3 + 3) // 4 * 4
    px = (
        np.frombuffer(payload, np.uint8, count=stride * h, offset=data_off)
        .reshape(h, stride)[:, : width * 3]
        .reshape(h, width, 3)
        .astype(np.float64)
    )
    if bottom_up:
        px = px[::-1]
    b, g, r = px[..., 0], px[..., 1], px[..., 2]
    gray = 0.299 * r + 0.587 * g + 0.114 * b
    h2, w2 = max(h // 2, 1), max(width // 2, 1)
    return _pad(
        [
            width,
            h,
            r.mean(),
            g.mean(),
            b.mean(),
            gray.mean(),
            gray.std(),
            gray.min(),
            gray.max(),
            gray[:h2, :w2].mean(),
            gray[:h2, w2:].mean() if width > 1 else 0.0,
            gray[h2:, :w2].mean() if h > 1 else 0.0,
            gray[h2:, w2:].mean() if h > 1 and width > 1 else 0.0,
            width / h,
        ],
        n_features,
    )


def wav_samples(payload: bytes) -> tuple[int, int, "object"]:
    """Parse a 16-bit PCM RIFF/WAVE payload → (n_channels,
    sample_rate, float64 samples in [-1, 1), channel-interleaved).
    Proper chunk walk (fmt may be followed by LIST/fact/... before
    data). Raises ValueError for non-WAV / unsupported encodings."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                # truncated fmt chunk behind valid RIFF/WAVE magic:
                # honor the documented ValueError contract (a raw
                # struct.error here would escape every caller's
                # malformed-payload skip path and kill the job).
                raise ValueError("truncated WAV fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"unsupported WAV encoding (fmt={audio_format}, bits={bits})")
    samples = np.frombuffer(
        data, "<i2", count=len(data) // 2
    ).astype(np.float64) / 32768.0
    return n_channels, sample_rate, samples


def _decode_wav(payload: bytes, n_features: int) -> list[float]:
    """REAL decode of a 16-bit PCM RIFF/WAVE payload (see
    :func:`wav_samples`): stream params plus amplitude stats (RMS,
    peak, zero-crossing rate)."""
    import numpy as np

    n_channels, sample_rate, samples = wav_samples(payload)
    n_frames = len(samples) // max(n_channels, 1)
    if n_frames == 0:
        return _pad([n_channels, sample_rate, 0.0], n_features)
    mono = samples[: n_frames * n_channels].reshape(n_frames, n_channels).mean(axis=1)
    zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
    return _pad(
        [
            n_channels,
            sample_rate,
            n_frames,
            n_frames / sample_rate,
            mono.mean(),
            float(np.sqrt(np.mean(mono**2))),
            float(np.abs(mono).max()),
            zcr,
        ],
        n_features,
    )


def sniff_modality(payload: bytes) -> str:
    """Container sniff by magic bytes: 'bmp' / 'png' / 'jpeg' / 'wav'
    / 'flac' / 'ogg' / 'avi' / 'mp4'; anything else is 'opaque'
    (stub or raise)."""
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"fLaC":
        return "flac"
    if payload[:4] == b"OggS":
        return "ogg"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return "avi"
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        return "mp4"
    return "opaque"


def bmp_from_pixels(px: "object") -> bytes:
    """Serialize an (h, w, 3) uint8 BGR array as a valid 24-bit BMP."""
    import struct

    import numpy as np

    height, width = px.shape[:2]
    stride = (width * 3 + 3) // 4 * 4
    rows = np.zeros((height, stride), dtype=np.uint8)
    rows[:, : width * 3] = px.reshape(height, width * 3)
    pixel_bytes = rows[::-1].tobytes()  # bottom-up
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(pixel_bytes), 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixel_bytes),
        2835, 2835, 0, 0,
    )
    return header + pixel_bytes


def synthesize_bmp(width: int, height: int, seed: int) -> bytes:
    """Deterministic valid 24-bit BMP (seeded pixels) — test/demo
    fixture builder; the decoder above must round-trip its stats."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return bmp_from_pixels(
        rng.randint(0, 256, size=(height, width, 3), dtype=np.uint8)
    )


def wav_from_samples(wave: "object", sample_rate: int) -> bytes:
    """Serialize float samples in [-1, 1] as a 16-bit PCM mono WAV."""
    import struct

    import numpy as np

    pcm = np.clip(wave * 32767.0, -32768, 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        struct.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt) + 8 + len(pcm), b"WAVE")
        + struct.pack("<4sI", b"fmt ", len(fmt))
        + fmt
        + struct.pack("<4sI", b"data", len(pcm))
        + pcm
    )


def synthesize_wav(
    n_frames: int, sample_rate: int, freq_hz: float, seed: int
) -> bytes:
    """Deterministic valid 16-bit PCM mono WAV (sine + seeded noise)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    t = np.arange(n_frames, dtype=np.float64) / sample_rate
    wave = 0.6 * np.sin(2 * np.pi * freq_hz * t) + 0.05 * rng.standard_normal(
        n_frames
    )
    return wav_from_samples(wave, sample_rate)


def sample_frames(
    payloads: DataFrame, *, every_n_bytes: int = 64, max_frames: int = 8
) -> DataFrame:
    """One-to-many extraction: emit up to ``max_frames`` pseudo-frames
    per payload (every_n_bytes stride) — the mapInPandas shape of video
    frame-sampling, where one input row yields N output rows with a
    declared schema. Real decoders replace the stride slice with an
    ffmpeg keyframe walk; the Spark plumbing is identical.
    """

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads_b = [bytes(b) for b in pdf["content"]]
            sizes = np.fromiter(
                (len(p) for p in payloads_b), np.int64, count=len(payloads_b)
            )
            # Vectorized frame fan-out (repeat/arange); only the md5 per
            # chunk — the stand-in for the real decode — stays Python.
            n_frames = np.minimum(max_frames, np.maximum(1, sizes // every_n_bytes))
            ids = np.repeat(pdf["id"].to_numpy(np.int64), n_frames)
            idxs = (
                np.concatenate([np.arange(k) for k in n_frames])
                if len(n_frames)
                else np.empty(0, np.int64)
            )
            offs = idxs * every_n_bytes
            checks = [
                hashlib.md5(p[o : o + every_n_bytes]).hexdigest()
                for p, k in zip(payloads_b, n_frames)
                for o in range(0, int(k) * every_n_bytes, every_n_bytes)
            ]
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "byte_offset": pd.Series(offs, dtype="int64"),
                    "frame_checksum": checks,
                }
            )

    return payloads.mapInPandas(
        frames,
        schema="id long, frame_idx long, byte_offset long, frame_checksum string",
    )


def dhash64(gray: "object") -> int:
    """64-bit difference hash of a grayscale image array: nearest-
    neighbor downsample to 9×8, then one bit per horizontal gradient
    sign. The classic perceptual hash — stable under re-encoding,
    mild noise, and resizing; Hamming distance ≈ visual distance."""
    import numpy as np

    h, w = gray.shape
    # nearest-neighbor sample grid (works for any input size ≥ 1×1)
    ys = (np.arange(8) * h) // 8
    xs = (np.arange(9) * w) // 9
    small = gray[np.ix_(ys, xs)]
    bits = (small[:, 1:] > small[:, :-1]).flatten()
    return int(np.packbits(bits).view(">u8")[0])


def image_gray(payload: bytes) -> "object":
    """Decode any supported image container (24-bit BMP or 8-bit PNG)
    to a float64 grayscale array — the shared front door of the
    perceptual-hash family, so a BMP and a PNG of the SAME pixels hash
    identically (re-encoding invariance is the point of dHash).
    Raises ValueError on non-image / unsupported payloads."""
    import struct

    import numpy as np

    kind = sniff_modality(payload)
    if kind in ("png", "jpeg"):
        if kind == "png":
            px = png_pixels(payload).astype(np.float64)  # RGB
        else:
            from .jpeg import jpeg_pixels

            px = jpeg_pixels(payload).astype(np.float64)  # RGB
        return 0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
    if kind != "bmp":
        raise ValueError(f"not a decodable image container ({kind})")
    try:
        data_off = struct.unpack_from("<I", payload, 10)[0]
        width = struct.unpack_from("<i", payload, 18)[0]
        height = struct.unpack_from("<i", payload, 22)[0]
        bottom_up = height > 0
        hh = abs(height)
        stride = (width * 3 + 3) // 4 * 4
        px = (
            np.frombuffer(
                payload, np.uint8, count=stride * hh, offset=data_off
            )
            .reshape(hh, stride)[:, : width * 3]
            .reshape(hh, width, 3)
            .astype(np.float64)
        )
    except (ValueError, struct.error) as e:
        raise ValueError(f"corrupt BMP: {e}") from e
    if bottom_up:
        px = px[::-1]
    # BMP rows are BGR
    return 0.299 * px[..., 2] + 0.587 * px[..., 1] + 0.114 * px[..., 0]


def image_dhash(payloads: DataFrame) -> DataFrame:
    """(id, dhash BIGINT, width, height) per decodable image payload
    (BMP or PNG — both real decoders, shared ``image_gray`` front
    door); non-image payloads are dropped. Arrow-batched; per-image
    work is pure numpy."""
    import numpy as np

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes, ws, hs = [], [], [], []
            for i, b in zip(pdf["id"], pdf["content"]):
                data = bytes(b)
                try:
                    gray = image_gray(data)
                except ValueError:
                    continue
                hh, width = gray.shape
                ids.append(int(i))
                # store as signed BIGINT (Spark has no unsigned 64)
                hashes.append(
                    int(np.uint64(dhash64(gray)).astype(np.int64))
                )
                ws.append(width)
                hs.append(hh)
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="int64"),
                    "dhash": pd.Series(hashes, dtype="int64"),
                    "width": pd.Series(ws, dtype="int64"),
                    "height": pd.Series(hs, dtype="int64"),
                }
            )

    return payloads.mapInPandas(
        compute, schema="id long, dhash long, width long, height long"
    )


def dhash_near_pairs(
    hashed: DataFrame, *, max_hamming: int | None = None, bands: int = 4
) -> DataFrame:
    """(id_a < id_b, hamming) pairs of perceptually-similar images.

    Banded pigeonhole blocking, same scheme as the SimHash text path
    (``operators/dedup.simhash_near_pairs``): split the 64-bit hash
    into ``bands`` 16-bit chunks — any pair within ``max_hamming``
    ≤ bands-1 differing CHUNKS must collide on at least one intact
    chunk, so candidates come from equality joins on (chunk_idx,
    chunk_value), never an all-pairs scan. Verify with exact popcount
    (bit_count of XOR — JVM codegen).

    The blocking is lossless ONLY for ``max_hamming <= bands - 1``
    (the pigeonhole bound: a pair may flip one bit in every chunk
    once the distance reaches ``bands``), so the default tracks
    ``bands`` and a wider threshold raises rather than silently
    returning incomplete recall — callers who want a lossy wide
    radius must raise ``bands`` to ``max_hamming + 1`` instead.
    """
    if max_hamming is None:
        max_hamming = bands - 1
    if max_hamming > bands - 1:
        raise ValueError(
            f"banded blocking is lossless only for max_hamming <= "
            f"bands-1 ({bands - 1}); got {max_hamming} — raise bands "
            f"to at least {max_hamming + 1}"
        )
    chunks = F.array(
        *[
            F.struct(
                F.lit(i).alias("ci"),
                F.shiftrightunsigned("dhash", 16 * i)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("cv"),
            )
            for i in range(bands)
        ]
    )
    # Both sides of the banded self-join re-execute ``hashed`` — for
    # the m08 family that subtree is the full image decode (Arrow
    # python stage). Materialize the (id, dhash) rows once, same as
    # chunk_pair_join / video_match_pairs_tolerant (guide §8: the
    # decode runs exactly once, the join works on 16-byte proxies).
    # Measured m08 1.9 → 1.0 s, its 10× probe 3.1 → 1.6 s.
    if not hashed.isStreaming:
        from .util import truncate_lineage

        hashed = truncate_lineage(hashed)
    sig = hashed.select(
        F.col("id"), F.col("dhash"), F.explode(chunks).alias("c")
    ).select("id", "dhash", F.col("c.ci").alias("ci"), F.col("c.cv").alias("cv"))
    a, b = sig.alias("a"), sig.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.ci") == F.col("b.ci"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.dhash").alias("_ha"),
            F.col("b.dhash").alias("_hb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    from ..observability import observe_count

    cand = observe_count("dhash.candidates", cand)
    ham = F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb")))
    return (
        cand.withColumn("hamming", ham.cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def _smooth_image(seed: int, h: int = 40, w: int = 54) -> "object":
    """Seeded blocky grayscale scene as (h, w, 3) uint8: an 8×9 random
    grid upsampled 5×6. Distinct scenes then carry ~independent dHash
    bits (cross-scene Hamming ≈ 32), while the wide inter-block value
    margins mean mild pixel noise flips almost no gradient signs —
    the contrast a perceptual-hash fixture needs. (The first sinusoid
    version of this fixture aliased under the 9×8 dHash downsample:
    different scenes collided at Hamming 0.)"""
    import numpy as np

    rng = np.random.RandomState(seed)
    grid = rng.randint(0, 256, size=(8, 9))
    ys = (np.arange(h) * 8) // h
    xs = (np.arange(w) * 9) // w
    img = grid[np.ix_(ys, xs)]
    return np.repeat(img[..., None], 3, axis=2).astype(np.uint8)


def _variant_image(seed: int, h: int = 40, w: int = 54) -> "object":
    """The near-dup sibling of :func:`_smooth_image`: same scene with
    two blocks re-lit (±96 — enough to flip the adjacent gradient
    signs, i.e. 1-4 dHash bits) plus faint pixel noise that stays
    inside the block margins. Perceptually 'the same photo, slightly
    different exposure patch' — what dHash is built to catch."""
    import numpy as np

    rng = np.random.RandomState(seed)
    grid = rng.randint(0, 256, size=(8, 9))
    vrng = np.random.RandomState(seed + 70_001)
    for _ in range(2):
        r, c = vrng.randint(0, 8), vrng.randint(0, 9)
        grid[r, c] = (grid[r, c] + 96) % 256
    ys = (np.arange(h) * 8) // h
    xs = (np.arange(w) * 9) // w
    img = grid[np.ix_(ys, xs)].astype(np.int64)
    noise_mask = vrng.rand(h, w) < 0.03
    img = np.clip(img + noise_mask * vrng.randint(-8, 9, (h, w)), 0, 255)
    return np.repeat(img[..., None], 3, axis=2).astype(np.uint8)


def demo_noisy_image_payloads(
    df: DataFrame, id_col: str, *, modulus: int = 10
) -> DataFrame:
    """Perceptual near-dup image fixture stream: ``id % modulus == 0``
    rows each get an image; consecutive qualifying ids pair up
    (``id // (2·modulus)`` shares a base scene) and the odd member
    carries mild sensor noise — one visually-near-duplicate pair per
    group, distinct scenes across groups. Executor-side, id-seeded.

    Containers (the round-12 verdict's 4:2:0 leg): even (clean)
    members are BMP; the noisy twin of every ODD group re-encodes as
    a REAL 4:2:0 JPEG (quality=100 — near-lossless, so the planted
    pair set is pinned unchanged against the all-BMP corpus in
    tests/test_round13_ops.py) — the 'same photo, re-encoded lossy'
    case the tolerant near-dup family exists for, riding the
    subsampled decode path (16×16 MCUs) end-to-end."""
    from .util import spread

    # payload synthesis + downstream decode are pure-CPU per-id work:
    # spread the (scan-shaped) id frame so they use every core
    base = spread(
        df.select(F.col(id_col).cast("long").alias("id")).where(
            F.col(id_col) % modulus == 0
        )
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = []
            for i in pdf["id"]:
                i = int(i)
                grp = i // (2 * modulus)
                # seed = grp DIRECTLY (fits uint32 at any probed
                # corpus size): a modulus here (the old % 9973) makes
                # bench's 10× copies — offset by 10M ids — wrap onto
                # the same seed ring, planting cross-copy identical
                # scenes that blow the scale probe superlinear
                if (i // modulus) % 2 == 1:
                    px = _variant_image(grp)
                    if grp % 2 == 1:
                        from .jpeg import jpeg_from_pixels

                        content.append(
                            jpeg_from_pixels(
                                px, subsampling="420", quality=100
                            )
                        )
                        continue
                else:
                    px = _smooth_image(grp)
                content.append(bmp_from_pixels(px))
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "content": content,
                    "modality": ["image"] * len(content),
                }
            )

    return base.mapInPandas(gen, schema="id long, content binary, modality string")


def binaryfile_image_payloads(spark, corpus_dir: str) -> DataFrame:
    """The m11 ingest subtree, shared verbatim by the catalog query
    and its lineage test (round-14 advice: the test used to hand-
    rebuild this construction, so catalog drift to demo synthesis
    could not fail it): a real ``binaryFile`` scan over the
    materialized mixed-format corpus, file name parsed back to the
    doc id, modality tagged for the decode stage."""
    from pyspark.sql import functions as F

    from ..sources.readers import read_binary_dir

    return read_binary_dir(
        spark, corpus_dir, glob="*.{bmp,png,jpg}"
    ).select(
        F.regexp_extract("id", r"doc_(\d+)\.(bmp|png|jpg)$", 1)
        .cast("long")
        .alias("id"),
        "content",
        "modality",
    )


def materialize_demo_image_corpus(sf_dir: str, *, modulus: int = 10) -> str:
    """Land the m08 fixture BMPs as REAL FILES on disk, once per
    ``sf_dir`` — the corpus behind the m11 catalog row, whose point is
    the *ingestion lineage* (``binaryFile`` scan → decode → near-dup
    join): a real deployment starts from files that already exist, so
    the write here is test scaffolding only, NOT part of the measured
    data plane. Content is byte-for-byte the stream
    :func:`demo_noisy_image_payloads` fabricates (a pure function of
    doc_id), so m11's pair set must equal m08's — pinned in the gate.

    Concurrency: the corpus is built in a private temp dir and
    atomically renamed into place; a session that loses the race to a
    concurrent builder just uses the winner's (identical) files.
    """
    import os
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    # v2: scene seeds switched from grp % 9973 to grp (copy-safe)
    # v3: every other file lands as PNG instead of BMP — SAME pixels,
    # different container, so the pair set still equals m08's (dHash
    # is encoding-invariant) while the lineage proves mixed-format
    # disk ingestion through one binaryFile scan
    # v4: odd groups' noisy twins land as 4:2:0 quality-100 JPEG —
    # byte-identical to the stream's encode (deterministic encoder),
    # so m11 == m08 stays EXACT even though JPEG is lossy
    out = f"/tmp/spark_graft_media_{tag}_m{modulus}_v4"
    if os.path.isdir(out):
        return out
    # driver-side fixture write: bounded at n_docs/modulus small files
    # (500 at sf0.01) — generation scaffolding, not a data-plane loop
    ids = (
        pq.read_table(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
        )
        .column("doc_id")
        .to_pylist()
    )
    tmp = tempfile.mkdtemp(dir="/tmp", prefix="spark_graft_media_build_")
    for i in sorted(int(x) for x in ids if int(x) % modulus == 0):
        grp = i // (2 * modulus)
        if (i // modulus) % 2 == 1:
            px = _variant_image(grp)
        else:
            px = _smooth_image(grp)
        if (i // modulus) % 2 == 0:
            with open(os.path.join(tmp, f"doc_{i:09d}.png"), "wb") as f:
                f.write(png_from_pixels(px[..., ::-1].copy()))  # BGR→RGB
        elif grp % 2 == 1:
            from .jpeg import jpeg_from_pixels

            with open(os.path.join(tmp, f"doc_{i:09d}.jpg"), "wb") as f:
                f.write(jpeg_from_pixels(px, subsampling="420", quality=100))
        else:
            with open(os.path.join(tmp, f"doc_{i:09d}.bmp"), "wb") as f:
                f.write(bmp_from_pixels(px))
    try:
        os.rename(tmp, out)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)  # another builder won
    return out


def demo_media_payloads(
    df: DataFrame, id_col: str, *, modulus: int = 10
) -> DataFrame:
    """Deterministic real-media payloads keyed off the id — the demo
    stand-in for ``spark.read.format('binaryFile')`` ingestion so real
    decodes ride the corpus queries: ``id % modulus == 0`` → BMP,
    ``== 1`` → WAV, ``== 2`` → PNG, ``== 3`` → baseline JPEG
    (synthesized executor-side, id-seeded, so the frame is
    reproducible and distributed — no driver materialization)."""

    base = df.select(F.col(id_col).cast("long").alias("id")).where(
        F.col(id_col) % modulus < 4
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content, modality = [], []
            for i in pdf["id"]:
                i = int(i)
                if i % modulus == 0:
                    content.append(
                        synthesize_bmp(16 + i % 16, 8 + i % 8, seed=i % 997)
                    )
                    modality.append("image")
                elif i % modulus == 2:
                    content.append(
                        synthesize_png(12 + i % 12, 6 + i % 6, seed=i % 997)
                    )
                    modality.append("image")
                elif i % modulus == 3:
                    from .jpeg import synthesize_jpeg

                    # rotate through the real-world JPEG profiles:
                    # baseline 4:4:4, 4:2:0, and progressive — all
                    # decode FOR REAL through the same dispatch
                    variant = (i // modulus) % 3
                    content.append(
                        synthesize_jpeg(
                            16 + i % 8,
                            16 + i % 8,
                            seed=i % 997,
                            subsampling="420" if variant == 1 else "444",
                            progressive=variant == 2,
                        )
                    )
                    modality.append("image")
                else:
                    content.append(
                        synthesize_wav(
                            800 + i % 100, 8000, 220.0 + i % 200, seed=i % 997
                        )
                    )
                    modality.append("audio")
            yield pd.DataFrame(
                {"id": pdf["id"], "content": content, "modality": modality}
            )

    return base.mapInPandas(gen, schema="id long, content binary, modality string")


def decode_features(
    payloads: DataFrame, *, n_features: int = 16, require_real_decoder: bool = False
) -> DataFrame:
    """Feature-extraction stage over opaque binary payloads.

    Per-payload magic-byte sniff: BMP, PNG (stdlib-zlib inflate +
    per-row unfilter — a REAL compressed format), baseline JPEG (the
    pure-numpy huffman + IDCT codec in ``operators/jpeg.py``), MJPEG
    MP4 (the ISO-BMFF box walk in ``operators/mp4.py`` — features of
    the lead frame) and 16-bit-PCM WAV decode FOR REAL (see
    ``_decode_bmp`` / ``_decode_png`` / ``_decode_jpeg`` /
    ``_decode_mp4`` / ``_decode_wav``; round 14: ``avc1`` tracks
    whose slices are I_PCM decode for real through the same MP4
    path); the remaining variants (entropy-coded AVC/HEVC) fall to
    the deterministic stub, or raise NotImplementedError under
    ``require_real_decoder=True``. The ``decoder`` output column says
    which path each row took.
    """

    import struct

    real = {
        "bmp": _decode_bmp,
        "png": _decode_png,
        "jpeg": _decode_jpeg,
        "mp4": _decode_mp4,
        "wav": _decode_wav,
    }

    def decode_one(b: bytes) -> tuple[str, list[float]]:
        kind = sniff_modality(b)
        if kind in real:
            try:
                return kind, real[kind](b, n_features)
            except (ValueError, struct.error):
                # matched magic, unsupported/corrupt variant — one bad
                # payload must fall to the stub, not crash the job
                kind = "opaque"
        if require_real_decoder:
            raise NotImplementedError(
                "payload is not a self-decodable format (BMP/PNG/JPEG/"
                "MJPEG-MP4/WAV) and real media decoders (PIL/ffmpeg) "
                "are not installed"
            )
        return "stub", _fake_decode(b, n_features)

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decode_one(bytes(b)) for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["content"].map(len).astype("int64"),
                    "decoder": [d[0] for d in decoded],
                    "features": [d[1] for d in decoded],
                }
            )

    return payloads.mapInPandas(compute, schema=FEATURE_SCHEMA)


def chunk_fingerprints(
    payloads: DataFrame, *, chunk_bytes: int = 64
) -> DataFrame:
    """(id, chash): md5 fingerprint per distinct fixed-size block of the
    binary payload — the storage-dedup block map (ZFS/backup-style
    fixed-block dedup). Pure Column expressions: one higher-order
    transform slices the payload, hashes ride the same projection, and
    array_distinct gives set semantics per payload.

    Cross-engine: the payload hexes ONCE (uppercase in both engines;
    neither can md5 a BLOB slice portably) and blocks slice the hex
    string at 2·chunk_bytes characters — hex(chunk) == chunk-of-hex at
    byte-aligned offsets, so fingerprints agree bit-for-bit.

    Fixed-offset blocks are alignment-sensitive (a one-byte insert
    shifts every later block — the classic trade-off vs content-defined
    chunking); right for exact/append-shaped binary duplication, which
    is what multimodal corpus dedup mostly sees (re-encoded copies are
    a different modality's problem).
    """
    hex_chars = 2 * chunk_bytes
    hexed = F.hex(F.col("content"))
    n_chunks = F.ceil(F.length(hexed) / F.lit(hex_chars)).cast("int")
    # guard: Spark's sequence(1, 0) counts DOWN ([1, 0]); empty payloads
    # must yield no chunks, matching DuckDB's empty generate_series.
    chunks = F.when(n_chunks >= 1, F.sequence(F.lit(1), n_chunks)).otherwise(
        F.array().cast("array<int>")
    )
    hashes = F.array_distinct(
        F.transform(
            chunks,
            lambda i: F.md5(
                hexed.substr(
                    (i - F.lit(1)) * F.lit(hex_chars) + F.lit(1),
                    F.lit(hex_chars),
                )
            ),
        )
    )
    return payloads.select(
        F.col("id"), F.explode(hashes).alias("chash")
    )


def cdc_chunk_arrays(
    payloads: DataFrame, *, window: int = 8, boundary_prefix: str = "00"
) -> DataFrame:
    """Content-defined chunking: (id, n_bytes, chashes array) with
    chunk boundaries decided by CONTENT, not position.

    A boundary falls after byte ``p`` iff the md5 of the trailing
    ``window``-byte context ends a chunk — here: md5 of the hex of
    bytes (p-window, p] starts with ``boundary_prefix`` ('00' → 1/256
    of positions → ~256-byte mean chunks). Because the predicate sees
    only a local window, inserting or deleting bytes re-aligns
    boundaries within one window of the edit and every later chunk
    hash is PRESERVED — the property fixed-offset blocks
    (:func:`chunk_fingerprints`) lose, where a one-byte insert shifts
    and invalidates every subsequent block (rsync/LBFS/restic-style
    dedup vs ZFS-style).

    Everything is higher-order Column expressions over the hexed
    payload (hex once, same trick as m04): positions → filter →
    boundary list → zip_with chunk hashes. Zero Python, zero shuffle
    — fuses into the scan stage, and the identical
    md5-over-hex-substring arithmetic runs as the DuckDB oracle, so
    CDC is fully hash-matched cross-engine (m05/m06).

    Production note: real CDC replaces md5 with a gear/buzhash
    (one multiply+shift per byte) and adds min/max chunk bounds (a
    sequential constraint); md5-over-hex is the portability choice
    that makes the oracle exact, and the unbounded form keeps every
    boundary position-independent — which is precisely what makes it
    SQL-expressible.
    """
    # Each intermediate is MATERIALIZED as a column before any lambda
    # references it: higher-order functions evaluate interpreted (no
    # whole-stage codegen, no common-subexpression elimination), so a
    # lambda capturing the hex() EXPRESSION would re-hex the whole
    # payload once per array element — measured O(len²) per doc, 100×
    # slower. Capturing the column reference reads the row's computed
    # value instead.
    w2 = 2 * window
    hx, nn = F.col("_hex"), F.col("_n")
    staged = (
        payloads.where(F.length("content") > 0)
        .withColumn("_hex", F.hex(F.col("content")))
        .withColumn("_n", (F.length("_hex") / 2).cast("int"))
        .withColumn(
            "_bpos",
            F.filter(
                F.when(
                    nn >= window, F.sequence(F.lit(window), nn)
                ).otherwise(F.array().cast("array<int>")),
                lambda p: F.md5(
                    hx.substr((p - window) * 2 + 1, F.lit(w2))
                ).startswith(boundary_prefix),
            ),
        )
        # final chunk always ends at n (unless a boundary already
        # does). try_element_at: the queries self-pin non-ANSI
        # semantics, but the operator must also survive a vanilla ANSI
        # session, where element_at on an empty boundary list throws.
        .withColumn(
            "_ends",
            F.when(
                F.try_element_at(F.col("_bpos"), F.lit(-1)) == nn,
                F.col("_bpos"),
            ).otherwise(F.array_append(F.col("_bpos"), nn)),
        )
        .withColumn(
            "_starts",
            F.transform(
                F.sequence(F.lit(1), F.size("_ends")),
                lambda i: F.when(i == 1, F.lit(1)).otherwise(
                    F.try_element_at(F.col("_ends"), (i - 1).cast("int")) + 1
                ),
            ),
        )
    )
    chashes = F.zip_with(
        F.col("_starts"),
        F.col("_ends"),
        lambda s, e: F.md5(hx.substr((s - 1) * 2 + 1, (e - s + 1) * 2)),
    )
    sizes = F.zip_with(
        F.col("_starts"),
        F.col("_ends"),
        lambda s, e: (e - s + 1).cast("bigint"),
    )
    return staged.select(
        F.col("id"),
        nn.cast("bigint").alias("n_bytes"),
        chashes.alias("chashes"),
        sizes.alias("chunk_sizes"),
    )


_GEAR_TABLE = None


def _gear_table():
    """Seeded 256-entry uint64 gear table (deterministic)."""
    global _GEAR_TABLE
    if _GEAR_TABLE is None:
        import numpy as np

        rng = np.random.RandomState(42)
        # two 32-bit draws per entry — RandomState has no uint64 draw
        hi = rng.randint(0, 2**32, size=256, dtype=np.uint64)
        lo = rng.randint(0, 2**32, size=256, dtype=np.uint64)
        _GEAR_TABLE = (hi << np.uint64(32)) | lo
    return _GEAR_TABLE


def gear_boundaries(data: bytes, *, mask_bits: int) -> "list[int]":
    """Natural gear-hash boundary positions (1-based byte index of a
    chunk END) — the vectorized closed form of the canonical iterative
    gear ``h = (h << 1 + G[b]) mod 2^64``: since each shift ages a
    byte one bit, only the trailing 64 bytes contribute, so
    ``h_p = Σ_{k<64} G[b_{p-k}] << k`` — 64 numpy vector ops per
    payload instead of a per-byte Python loop. Boundary where the low
    ``mask_bits`` bits are zero (mean chunk ≈ 2^mask_bits bytes)."""
    import numpy as np

    g = _gear_table()[np.frombuffer(data, np.uint8)]
    acc = np.zeros(len(data), np.uint64)
    for k in range(min(64, len(data))):
        if k == 0:
            acc += g
        else:
            acc[k:] += g[:-k] << np.uint64(k)
    mask = np.uint64((1 << mask_bits) - 1)
    return (np.nonzero((acc & mask) == 0)[0] + 1).tolist()


def cdc_gear_chunks(
    payloads: DataFrame,
    *,
    mask_bits: int = 6,
    min_chunk: int = 16,
    max_chunk: int = 1024,
) -> DataFrame:
    """PRODUCTION-path CDC: gear rolling hash (integer multiply-free
    vector math — ~100× cheaper per byte than the md5 oracle form in
    :func:`cdc_chunk_arrays`) WITH real min/max chunk bounds.

    The bounds are a sequential constraint — a boundary is accepted
    only ≥ ``min_chunk`` bytes after the previously ACCEPTED one, and
    a cut is forced at ``max_chunk`` — which no per-position SQL
    predicate can express; that is exactly why this operator is
    rows-only (m07) while the unbounded md5 twin (m05) carries the
    cross-engine hash match. The suppression loop walks only the
    candidate list (O(chunks), not O(bytes)); the per-byte work is
    vectorized numpy inside Arrow batches.

    Output shape matches m05: (id, n_bytes, n_chunks, cdc_digest,
    max_chunk_bytes).
    """

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out_cols = {
            "id": [],
            "n_bytes": [],
            "n_chunks": [],
            "cdc_digest": [],
            "max_chunk_bytes": [],
        }

        def flush():
            df = pd.DataFrame(
                {
                    "id": pd.Series(out_cols["id"], dtype="int64"),
                    "n_bytes": pd.Series(out_cols["n_bytes"], dtype="int64"),
                    "n_chunks": pd.Series(
                        out_cols["n_chunks"], dtype="int64"
                    ),
                    "cdc_digest": out_cols["cdc_digest"],
                    "max_chunk_bytes": pd.Series(
                        out_cols["max_chunk_bytes"], dtype="int64"
                    ),
                }
            )
            for k in out_cols:
                out_cols[k] = []
            return df

        for pdf in batches:
            for i, b in zip(pdf["id"], pdf["content"]):
                data = bytes(b)
                n = len(data)
                if n == 0:
                    continue
                natural = gear_boundaries(data, mask_bits=mask_bits)
                # sequential min/max suppression over candidates only
                ends: list[int] = []
                last = 0
                for p in natural:
                    while p - last > max_chunk:
                        last += max_chunk
                        ends.append(last)
                    if p - last >= min_chunk:
                        ends.append(p)
                        last = p
                while n - last > max_chunk:
                    last += max_chunk
                    ends.append(last)
                if not ends or ends[-1] != n:
                    ends.append(n)
                digest = hashlib.md5()
                max_len = 0
                prev = 0
                for e in ends:
                    digest.update(hashlib.md5(data[prev:e]).digest())
                    max_len = max(max_len, e - prev)
                    prev = e
                out_cols["id"].append(int(i))
                out_cols["n_bytes"].append(n)
                out_cols["n_chunks"].append(len(ends))
                out_cols["cdc_digest"].append(digest.hexdigest())
                out_cols["max_chunk_bytes"].append(max_len)
            yield flush()

    return payloads.mapInPandas(
        compute,
        schema="id long, n_bytes long, n_chunks long, cdc_digest string, "
        "max_chunk_bytes long",
    )


def cdc_chunk_fingerprints(
    payloads: DataFrame, *, window: int = 8, boundary_prefix: str = "00"
) -> DataFrame:
    """(id, chash) rows — CDC counterpart of :func:`chunk_fingerprints`
    (set semantics per payload), ready for the inverted-index join."""
    ch = cdc_chunk_arrays(
        payloads, window=window, boundary_prefix=boundary_prefix
    )
    return ch.select(
        "id", F.explode(F.array_distinct("chashes")).alias("chash")
    )


def binary_chunk_neardup(
    payloads: DataFrame,
    *,
    chunk_bytes: int = 64,
    min_containment: float = 0.5,
    max_block_df: int | None = None,
) -> DataFrame:
    """Near-duplicate binary payload pairs by shared fixed-size blocks:
    (id_a < id_b, shared_chunks, containment) where containment =
    shared / min(|blocks_a|, |blocks_b|) — 1.0 means the smaller
    payload's blocks all appear in the larger (append/truncate dups).

    Inverted-index join on block fingerprints — same shape (and same
    100-TB posture notes) as the n-gram Jaccard index in
    operators/dedup.py; block sizes ride the exploded rows as min()
    aggregates.

    ``max_block_df``: the posting-list cap, and for BINARY corpora it
    matters even more than for text — uniform blocks (zero fill,
    padding, shared headers) recur across millions of files and fan
    the index out quadratically. Blocks whose document frequency
    exceeds the cap leave the INDEX only (sizes stay exact, via a
    window over the join's own exchange); pairs sharing only
    ultra-common blocks are missed — the same deliberate trade as
    ``ngram_jaccard_pairs(max_shingle_df=...)``. ``None`` (default)
    is the exact oracle form.
    """
    ch = chunk_fingerprints(payloads, chunk_bytes=chunk_bytes)
    return chunk_pair_join(
        ch, min_containment=min_containment, max_block_df=max_block_df
    )


def cdc_chunk_neardup(
    payloads: DataFrame,
    *,
    window: int = 8,
    boundary_prefix: str = "00",
    min_containment: float = 0.5,
    max_block_df: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by shared CONTENT-DEFINED chunks — the
    same inverted-index join as :func:`binary_chunk_neardup`, fed by
    :func:`cdc_chunk_fingerprints`. Catches append/insert/truncate
    duplication that shifts byte offsets (where fixed blocks lose
    every post-edit block; pinned by the shift-robustness test)."""
    ch = cdc_chunk_fingerprints(
        payloads, window=window, boundary_prefix=boundary_prefix
    )
    return chunk_pair_join(
        ch, min_containment=min_containment, max_block_df=max_block_df
    )


def chunk_pair_join(
    ch: DataFrame,
    *,
    min_containment: float,
    max_block_df: int | None = None,
) -> DataFrame:
    """Shared inverted-index pair join over any (id, chash) frame
    (fixed-block or CDC fingerprints); see
    :func:`binary_chunk_neardup` for the posture notes."""
    from pyspark.sql.window import Window

    from .util import truncate_lineage

    # The sizes/a/b branches below would re-execute the fingerprint
    # subtree per branch — for the media operators that subtree is the
    # expensive decode (PLANS.md showed m09/m10 running their Arrow
    # stages 4×; measured 4.5→2.3 s on m10). Materialize it once.
    # Streaming callers keep their lineage (checkpoint is batch-only).
    if not ch.isStreaming:
        ch = truncate_lineage(ch)

    sizes = ch.groupBy("id").agg(F.count(F.lit(1)).alias("_n"))
    chs = ch.join(sizes, "id")
    if max_block_df is not None:
        wdf = Window.partitionBy("chash")
        chs = (
            chs.withColumn("_df", F.count(F.lit(1)).over(wdf))
            .filter(F.col("_df") <= max_block_df)
            .drop("_df")
        )
    a = chs.select(
        F.col("id").alias("id_a"), "chash", F.col("_n").alias("n_a")
    ).hint("merge")
    b = chs.select(
        F.col("id").alias("id_b"), "chash", F.col("_n").alias("n_b")
    )
    containment = F.col("shared_chunks").cast("double") / F.least(
        "n_a", "n_b"
    ).cast("double")
    from ..observability import observe_count

    pairs = (
        a.join(
            b, (a["chash"] == b["chash"]) & (F.col("id_a") < F.col("id_b"))
        )
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("shared_chunks"),
            F.min("n_a").alias("n_a"),
            F.min("n_b").alias("n_b"),
        )
    )
    # bench observability: distinct candidate PAIRS surviving the
    # inverted-index join, before the containment threshold
    pairs = observe_count("chunk_join.candidates", pairs)
    return pairs.select(
        "id_a",
        "id_b",
        "shared_chunks",
        containment.alias("containment"),
    ).filter(F.col("containment") >= min_containment)


# ---------------------------------------------------------------------------
# PNG: a REAL compressed-format decoder (stdlib zlib + numpy)
# ---------------------------------------------------------------------------

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def png_pixels(payload: bytes) -> "object":
    """REAL decode of an 8-bit PNG (grayscale / gray+alpha / RGB /
    RGBA, non-interlaced) to an (h, w, 3) uint8 RGB array.

    PNG is chunked zlib-compressed scanlines with a per-row predictor
    (None/Sub/Up/Average/Paeth). Chunk walk + ``zlib.decompress`` are
    stdlib; unfiltering runs row-by-row (the format is sequential by
    construction — each row's predictor references the row above), with
    the channel arithmetic vectorized per row. Raises ValueError on
    non-PNG magic and unsupported variants (16-bit, palette,
    interlaced), so callers' corrupt-payload contract (fall to the
    stub, never crash the job) holds — same as ``_decode_bmp``.
    """
    import struct
    import zlib

    import numpy as np

    if payload[: len(_PNG_MAGIC)] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, width = len(_PNG_MAGIC), None
    idat = b""
    try:
        while pos + 8 <= len(payload):
            length, ctype = struct.unpack_from(">I4s", payload, pos)
            data = payload[pos + 8 : pos + 8 + length]
            pos += 12 + length  # length + type + data + crc
            if ctype == b"IHDR":
                width, height, bit_depth, color_type, _comp, _filt, interlace = (
                    struct.unpack(">IIBBBBB", data)
                )
                if bit_depth != 8 or interlace != 0:
                    raise ValueError(
                        f"unsupported PNG (depth={bit_depth}, interlace={interlace})"
                    )
                channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
                if channels is None:
                    raise ValueError(f"unsupported PNG color type {color_type}")
            elif ctype == b"IDAT":
                idat += data
            elif ctype == b"IEND":
                break
    except struct.error as e:
        raise ValueError(f"truncated PNG chunk: {e}") from e
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    try:
        raw = zlib.decompress(idat)
    except zlib.error as e:
        raise ValueError(f"corrupt PNG stream: {e}") from e
    stride = width * channels
    if len(raw) < height * (stride + 1):
        raise ValueError("truncated PNG scanlines")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        row_off = y * (stride + 1)
        ftype = raw[row_off]
        line = np.frombuffer(
            raw, np.uint8, count=stride, offset=row_off + 1
        ).copy()
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = (line.astype(np.int32) + prev).astype(np.uint8)
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth: sequential
            cur = line.astype(np.int32)
            pv = prev.astype(np.int32)
            for i in range(stride):
                a = cur[i - channels] if i >= channels else 0
                b = pv[i]
                if ftype == 1:
                    cur[i] = (cur[i] + a) & 0xFF
                elif ftype == 3:
                    cur[i] = (cur[i] + (a + b) // 2) & 0xFF
                else:
                    c = pv[i - channels] if i >= channels else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[i] = (cur[i] + pr) & 0xFF
            cur = cur.astype(np.uint8)
        else:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[y] = cur
        prev = cur
    px = out.reshape(height, width, channels)
    if channels == 1:
        return np.repeat(px, 3, axis=2)
    if channels == 2:  # gray + alpha → drop alpha
        return np.repeat(px[..., :1], 3, axis=2)
    return px[..., :3]  # RGB / RGBA → RGB


def png_from_pixels(px: "object") -> bytes:
    """Serialize an (h, w, 3) uint8 RGB array as a valid PNG
    (filter-None scanlines, one zlib IDAT, CRC'd chunks) — stdlib-only
    encoder for fixtures; ``png_pixels`` must round-trip it exactly."""
    import struct
    import zlib

    import numpy as np

    height, width = px.shape[:2]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    rows = np.concatenate(
        [
            np.zeros((height, 1), dtype=np.uint8),  # filter type 0
            px.reshape(height, width * 3),
        ],
        axis=1,
    )
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(rows.tobytes(), 6))
        + chunk(b"IEND", b"")
    )


def synthesize_png(width: int, height: int, seed: int) -> bytes:
    """Deterministic valid 8-bit RGB PNG (seeded pixels)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return png_from_pixels(
        rng.randint(0, 256, size=(height, width, 3), dtype=np.uint8)
    )


def _decode_png(payload: bytes, n_features: int) -> list[float]:
    """Feature battery over a real PNG decode — same signature as
    ``_decode_bmp`` (dims, channel means, gray stats, quadrant means),
    channel order adjusted (PNG is RGB, BMP is BGR)."""
    import numpy as np

    return _image_features_rgb(
        png_pixels(payload).astype(np.float64), n_features
    )


def _decode_jpeg(payload: bytes, n_features: int) -> list[float]:
    """Feature battery over a real baseline-JPEG decode (see
    ``operators/jpeg.py`` — pure numpy huffman + IDCT)."""
    import numpy as np

    from .jpeg import jpeg_pixels

    return _image_features_rgb(
        jpeg_pixels(payload).astype(np.float64), n_features
    )


def _decode_mp4(payload: bytes, n_features: int) -> list[float]:
    """REAL decode of an MJPEG MP4 (ISO-BMFF box walk + sample-table
    resolution in ``operators/mp4.py``): features of the LEAD frame —
    the still-image signature convention for video containers (a
    thumbnail-grade layout fingerprint; full frame-set matching is
    the video_fingerprints path)."""
    import numpy as np

    from .mp4 import mp4_frames

    # frames come back BGR (the avi_frames contract) → flip for the
    # shared RGB feature extractor
    return _image_features_rgb(
        mp4_frames(payload)[0][..., ::-1].astype(np.float64), n_features
    )


def _image_features_rgb(px: "object", n_features: int) -> list[float]:
    h, width = px.shape[:2]
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    gray = 0.299 * r + 0.587 * g + 0.114 * b
    h2, w2 = max(h // 2, 1), max(width // 2, 1)
    return _pad(
        [
            width,
            h,
            r.mean(),
            g.mean(),
            b.mean(),
            gray.mean(),
            gray.std(),
            gray.min(),
            gray.max(),
            gray[:h2, :w2].mean(),
            gray[:h2, w2:].mean() if width > 1 else 0.0,
            gray[h2:, :w2].mean() if h > 1 else 0.0,
            gray[h2:, w2:].mean() if h > 1 and width > 1 else 0.0,
            width / h,
        ],
        n_features,
    )
