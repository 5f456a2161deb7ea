"""Video near-duplicate detection: real AVI decode → per-frame dHash
→ frame-set containment join.

The video member of the multimodal near-dup family (image → m08 dHash
+ banded Hamming, audio → m09 spectral landmarks, raw binary →
m04/m06 chunk maps). A video fingerprint here is the SET of per-frame
64-bit dHashes — the "frame constellation" — so two uploads match
when they share frames perceptually, regardless of byte-level
re-encoding and regardless of temporal edits (trims, appended intros/
outros): containment on the frame-hash set is exactly the trimmed-
re-upload detector the CDC chunk map is for byte streams.

Container: minimal RIFF/AVI. ``avi_from_frames`` writes and
``avi_frames`` parses two codecs for real: 'DIB ' ('00db' raw-BGR
frame chunks, the original Microsoft layout — a RIFF chunk walker +
the same bottom-up stride-padded pixel reshape the BMP decoder uses)
and 'MJPG' ('00dc' compressed chunks, each frame a standalone
baseline JPEG decoded by ``operators/jpeg.py`` — the Motion-JPEG
layout real capture hardware emits). MP4 adds MJPEG tracks and —
round 14 — real H.264 in the I_PCM intra subset
(``mp4.mp4_from_frames_avc`` / the avc1 branch of ``mp4_frames``);
entropy-coded H.264/HEVC still needs ffmpeg, and a production
deployment swaps the decode for an ffmpeg-backed frame sampler
behind the same (id, content) → (id, chash) contract.

Pipeline shape on Spark: decode + dHash runs in Arrow-batched
``mapInPandas`` emitting (id, chash) rows; matching is the shared
inverted-index + containment join (``multimodal.chunk_pair_join``),
so the 100-TB posture notes (posting-cap for ubiquitous frames — title
cards, black frames — no all-pairs scan) carry over unchanged.

Rows-only at the catalog (m10): SQL cannot parse RIFF containers.
Pinned instead by an exact container round-trip, a brute-force
set-intersection replay, and temporal-edit robustness properties in
tests/test_round5_ops.py. m08 witnesses TOLERANT (banded Hamming)
hash matching at the image level; m10 deliberately pins frame hashes
exactly and exercises the temporal-set dimension.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .multimodal import chunk_pair_join, dhash64, sniff_modality


def avi_from_frames(
    frames: "object",
    *,
    fps: int = 10,
    codec: str = "DIB",
    subsampling: str = "444",
) -> bytes:
    """Serialize an (n, h, w, 3) uint8 BGR array as a minimal valid
    AVI: RIFF('AVI ') → LIST(hdrl){avih, LIST(strl){strh, strf}} →
    LIST(movi){frame chunks ×n}. ``codec='DIB'`` stores raw
    uncompressed frames ('00db' chunks, exactly BMP pixel layout:
    bottom-up rows, 4-byte stride); ``codec='MJPG'`` stores each frame
    as a baseline JPEG ('00dc' compressed chunks — the Motion-JPEG
    layout real capture hardware emits), encoded by
    ``operators/jpeg.py``; ``subsampling='420'`` encodes the frames
    4:2:0, the profile real MJPEG hardware actually ships."""
    import numpy as np

    n, h, w = frames.shape[:3]
    stride = (w * 3 + 3) // 4 * 4
    frame_bytes = []
    if codec == "MJPG":
        from .jpeg import jpeg_from_pixels

        for k in range(n):
            # frames carry BGR (the BMP/DIB convention); JPEG is RGB
            frame_bytes.append(
                jpeg_from_pixels(
                    frames[k][..., ::-1], subsampling=subsampling
                )
            )
    elif codec == "DIB":
        for k in range(n):
            rows = np.zeros((h, stride), dtype=np.uint8)
            rows[:, : w * 3] = frames[k].reshape(h, w * 3)
            frame_bytes.append(rows[::-1].tobytes())
    else:
        raise ValueError(f"unsupported AVI codec {codec!r}")
    fsize = stride * h

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(fourcc: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", fourcc + payload)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        fsize * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags (AVIF_HASINDEX off, 0x10 = was captured; benign)
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        fsize,  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,  # dwReserved
    )
    strh = (
        b"vids"
        + (b"MJPG" if codec == "MJPG" else b"DIB ")
        + struct.pack("<IHHIIIIIIII4h", 0, 0, 0, 0, 1, fps, 0, n, fsize,
                      0xFFFFFFFF, 0, 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, fsize, 2835, 2835, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    tag = b"00dc" if codec == "MJPG" else b"00db"
    movi = lst(b"movi", b"".join(chunk(tag, fb) for fb in frame_bytes))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def avi_frames(payload: bytes) -> "object":
    """REAL decode of the minimal AVI: RIFF chunk walk → (width,
    height) from avih → every '00db' chunk reshaped from bottom-up
    stride-padded BGR rows, every '00dc' chunk decoded as a
    Motion-JPEG frame (operators/jpeg.py). Returns (n, h, w, 3)
    uint8 BGR."""
    import numpy as np

    if sniff_modality(payload) != "avi":
        raise ValueError("not an AVI payload")
    w = h = None
    frames = []

    def walk(off: int, end: int) -> None:
        nonlocal w, h
        while off + 8 <= end:
            fourcc = payload[off:off + 4]
            size = struct.unpack_from("<I", payload, off + 4)[0]
            data_off = off + 8
            if fourcc == b"LIST":
                walk(data_off + 4, data_off + size)
            elif fourcc == b"avih":
                w = struct.unpack_from("<I", payload, data_off + 32)[0]
                h = struct.unpack_from("<I", payload, data_off + 36)[0]
            elif fourcc == b"00db":
                if w is None or h is None:
                    raise ValueError("frame chunk before avih header")
                stride = (w * 3 + 3) // 4 * 4
                px = (
                    np.frombuffer(
                        payload, np.uint8, count=stride * h, offset=data_off
                    )
                    .reshape(h, stride)[:, : w * 3]
                    .reshape(h, w, 3)
                )
                frames.append(px[::-1])
            elif fourcc == b"00dc":
                # compressed frame chunk: Motion-JPEG (each frame a
                # standalone baseline JPEG — decoded by operators/jpeg)
                from .jpeg import jpeg_pixels

                data = payload[data_off : data_off + size]
                if data[:3] != b"\xff\xd8\xff":
                    raise ValueError("unsupported compressed AVI codec")
                rgb = jpeg_pixels(data)
                frames.append(rgb[..., ::-1])  # contract is BGR
            off = data_off + size + (size % 2)

    walk(12, 8 + struct.unpack_from("<I", payload, 4)[0])
    if not frames:
        raise ValueError("AVI has no frames")
    return np.stack(frames)


def frame_dhashes(payload: bytes) -> list[int]:
    """Sorted-unique per-frame dHash set for one video payload (AVI,
    MP4, or animated GIF — the container is sniffed per payload, so
    one decode stage serves a mixed corpus), as signed BIGINT (Spark has no
    unsigned 64 — same two's-complement reinterpretation as
    ``image_dhash``). Set semantics: a looped/duplicated frame adds
    nothing, mirroring the landmark sets of m09."""
    import numpy as np

    kind = sniff_modality(payload)
    if kind == "mp4":
        from .mp4 import mp4_frames

        px = mp4_frames(payload).astype("float64")
    elif kind == "gif":
        from .gif import gif_frames

        px = gif_frames(payload).astype("float64")
    else:
        px = avi_frames(payload).astype("float64")
    b, g, r = px[..., 0], px[..., 1], px[..., 2]
    gray = 0.299 * r + 0.587 * g + 0.114 * b
    return sorted(
        {
            int(np.uint64(dhash64(gray[k])).astype(np.int64))
            for k in range(gray.shape[0])
        }
    )


def video_fingerprints(payloads: DataFrame) -> DataFrame:
    """(id, chash) frame-hash rows per decodable video payload — AVI,
    MP4, and animated GIF through ONE Arrow-batched decode stage (the
    container is sniffed per payload; non-video payloads dropped). Column named
    ``chash`` so the frame plugs straight into
    ``multimodal.chunk_pair_join``."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for i, bpayload in zip(pdf["id"], pdf["content"]):
                data = bytes(bpayload)
                if sniff_modality(data) not in ("avi", "mp4", "gif"):
                    continue
                try:
                    fhs = frame_dhashes(data)
                except (ValueError, struct.error):
                    # truncated/corrupt container: skip the payload,
                    # same contract as image_dhash/audio_fingerprints
                    continue
                ids.extend([int(i)] * len(fhs))
                hashes.extend(fhs)
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="int64"),
                    "chash": pd.Series(hashes, dtype="int64"),
                }
            )

    return payloads.mapInPandas(compute, schema="id long, chash long")


def video_match_pairs(
    payloads: DataFrame,
    *,
    min_containment: float = 0.6,
    max_hash_df: int | None = None,
) -> DataFrame:
    """(id_a < id_b, shared_chunks, containment) pairs of videos
    sharing per-frame dHashes — same join/posture as the chunk maps;
    ``max_hash_df`` is the posting cap for ubiquitous frames (black
    frames, title cards)."""
    fp = video_fingerprints(payloads)
    return chunk_pair_join(
        fp, min_containment=min_containment, max_block_df=max_hash_df
    )


def _scene_frame(scene_seed: int, frame_idx: int) -> "object":
    """One frame of a synthetic 'scene': the blocky random grid of
    multimodal._smooth_image, re-seeded per frame (fixture frames are
    temporally independent — enough to exercise set containment; real
    footage correlates, which only makes frame hashes MORE stable)."""
    from .multimodal import _smooth_image

    # no modulus: scene_seed·31+idx fits uint32 at any probed corpus
    # size, and a wrap here would plant cross-copy identical frames
    # in bench's 10× fixture (same trap as the old % 9973 scene seed)
    return _smooth_image(scene_seed * 31 + frame_idx)


def _offlattice_noise(px: "object", seed: int) -> "object":
    """Mild pixel noise that avoids the 9×8 dHash sampling lattice, so
    the frame's BYTES change (byte-level dedup like m04/m06 misses it)
    while its dHash is bit-stable. Deliberate fixture design: m08
    already witnesses hash-TOLERANT (banded Hamming) matching; m10
    pins frame hashes exactly to isolate the temporal-set dimension."""
    import numpy as np

    h, w = px.shape[:2]
    rng = np.random.RandomState(seed)
    mask = rng.rand(h, w) < 0.05
    ys = (np.arange(8) * h) // 8
    xs = (np.arange(9) * w) // 9
    mask[np.ix_(ys, xs)] = False
    noise = rng.randint(-6, 7, (h, w, 1)) * mask[..., None]
    return np.clip(px.astype(np.int64) + noise, 0, 255).astype(np.uint8)


def demo_noisy_video_payloads(
    df: DataFrame, id_col: str, *, modulus: int = 10, n_frames: int = 8
) -> DataFrame:
    """Near-dup video fixture stream (the video twin of
    ``demo_noisy_image_payloads``/``demo_noisy_audio_payloads``):
    ``id % modulus == 0`` rows each get an AVI; paired ids share a
    scene and the odd member is a re-encoded RE-CUT — the lead frame
    trimmed, a fresh outro frame appended, and off-lattice pixel noise
    on every kept frame (bytes differ, frame dHashes survive). Shared
    frames: n_frames-1 of n_frames → containment 0.875 at the default
    8 frames, vs ~0 across scenes (independent random grids)."""
    import numpy as np

    from pyspark.sql import functions as F

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
                # copy-safe direct seed (see the image/audio twins)
                scene = grp
                frames = [
                    _scene_frame(scene, k) for k in range(n_frames)
                ]
                if (i // modulus) % 2 == 1:
                    kept = [
                        _offlattice_noise(f, 50_000 + scene * 97 + k)
                        for k, f in enumerate(frames[1:])
                    ]
                    kept.append(_scene_frame(scene + 7919, n_frames))
                    frames = kept
                content.append(avi_from_frames(np.stack(frames)))
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "content": content,
                    "modality": ["video"] * len(content),
                }
            )

    return base.mapInPandas(gen, schema="id long, content binary, modality string")


# Measured cross-vs-within candidate parity of the composite blocking
# at this fixture family's frame statistics (~7.5 frames/video; README
# bench notes carry the full derivation): below ~6,200 videos arity-2
# traffic is dominated by the linear within-copy term and arity 2's
# stronger frame-losslessness (bands-2 bits) wins; above it the
# arity-2 cross-video birthday term dominates and arity 3's 67×
# measured cross-candidate cut wins. Scale by κ·C(bands,2)·C(F,2)/2¹⁶
# for corpora with different frame counts.
ARITY_CROSSOVER_VIDEOS = 6_200


def _select_arity(composite_arity: int | None, n_videos: int | None) -> int:
    """Composite-key arity: an explicit value wins; ``None`` = auto —
    arity 3 once the corpus size hint passes the measured crossover,
    else the more recall-lossless arity 2 (round-8 verdict: the lever
    existed but nothing pulled it)."""
    if composite_arity is not None:
        return composite_arity
    if n_videos is not None and n_videos > ARITY_CROSSOVER_VIDEOS:
        return 3
    return 2


def video_match_pairs_tolerant(
    payloads: DataFrame,
    *,
    max_hamming: int = 7,
    bands: int = 8,
    min_containment: float = 0.6,
    max_chunk_df: int | None = None,
    composite_bands: bool = True,
    composite_arity: int | None = None,
    n_videos: int | None = None,
) -> DataFrame:
    """Cross-CODEC video near-dup: (id_a < id_b, shared_frames, n_a,
    n_b, containment) where frames match within ``max_hamming`` bits
    of dHash instead of exactly.

    The tolerant sibling of :func:`video_match_pairs`: a lossy
    re-encode (MJPEG of the same footage) perturbs every frame hash by
    a few bits, so the exact containment join sees ~zero shared
    hashes; here frame pairs come from banded pigeonhole blocking over
    the 64-bit hash and verify with one JVM popcount. Containment
    counts each of the smaller video's frames at most once (the
    SMALLER of the two sides' distinct matched-hash counts /
    min(n_a, n_b) — so many-to-one tolerant matches can never push
    containment past 1.0).

    Blocking scheme — the round-7 scale fix. Single 8-bit chunks
    (``composite_bands=False``) are frame-lossless to ``bands-1``
    bits, but 8-bit buckets are DENSE: the bench's 10× probe measured
    the candidate join going quadratic (404 k → 40.6 M, 100× at 10×
    corpus — the birthday term over 2048 buckets), and a posting cap
    tight enough to tame it destroys recall (measured: cap 16 keeps
    247 of 2,443 pairs). The default blocks on TWO-CHUNK COMPOSITE
    keys instead — C(bands,2)=28 ordered chunk pairs, 16-bit values
    over a 28·65536 key space: drift of ≤ bands-2 bits leaves ≥ 2
    intact chunks whose pair key matches (frame-lossless to 6 bits at
    the default), and a frame in the measured 7-bit tail is missed
    only when all 7 flipped bits land in 7 DISTINCT chunks — rare at
    the frame level and absorbed at the VIDEO level by containment
    over the remaining frames. Measured: every planted twin at
    sf0.001 (the gate pin) and 2,440 of 2,443 at the 10× sf0.1 probe
    (the 3 lost pairs are twins whose few surviving frames all sat in
    the 7-bit tail); candidates drop 40.6 M → 1.07 M at 10×. Keys
    per frame go 8 → 28; candidate output collapses quadratically —
    the right trade at any corpus size.

    Scale posture: ``max_chunk_df`` stays as the posting cap for
    genuinely ubiquitous composite buckets (black frames, title
    cards), the same lever as the exact form's ``max_hash_df``.

    ``composite_arity=3`` is the round-8 birthday-term lever the bench
    decomposition documents: THREE-chunk keys (C(bands,3)=56 ordered
    triples, 24-bit values) shrink the cross-video collision term —
    uniform-hash theory (56/28)·2^16/2^24 = 1/128, MEASURED 67× at
    the 10× bench probe (951,315 → 14,258 cross candidates; total
    traffic 34× lower) — at the cost of frame-losslessness dropping
    to ``bands-3`` bits (≥3 intact chunks needed; most of the 6-7
    bit tail is absorbed at the video level by containment, measured
    97.6% verified-pair retention).

    Round 9: the arity SELF-SELECTS. ``composite_arity=None`` (the
    default) picks 3 when the ``n_videos`` corpus-size hint exceeds
    ``ARITY_CROSSOVER_VIDEOS`` (~6,200 at this fixture family's frame
    statistics — the measured parity point of the arity-2 cross-video
    birthday term vs the within-copy linear term), else 2. Callers
    pass ``n_videos`` from cheap metadata (a parquet count of ids —
    never a decode); an explicit ``composite_arity`` always wins.
    """
    composite_arity = _select_arity(composite_arity, n_videos)
    if composite_bands:
        if composite_arity not in (2, 3):
            raise ValueError(
                f"composite_arity must be 2 or 3, got {composite_arity}"
            )
        if max_hamming > bands - 1:
            raise ValueError(
                f"composite banding covers max_hamming <= bands-1 "
                f"({bands - 1}: lossless to bands-{composite_arity}, "
                f"containment-absorbed above); got {max_hamming}"
            )
    elif max_hamming > bands - 1:
        raise ValueError(
            f"banded blocking is lossless only for max_hamming <= "
            f"bands-1 ({bands - 1}); got {max_hamming}"
        )
    from pyspark.sql import functions as F

    from .util import truncate_lineage

    fp = video_fingerprints(payloads)  # (id, chash), distinct per video
    # The sizes/a/b branches below would re-execute the fingerprint
    # subtree per branch — and for this operator that subtree is the
    # FULL container+codec decode (the most expensive python stage in
    # the catalog: MJPEG entropy decode per frame). Materialize it
    # once (guide §8: decide on small rows — (id, chash) is 16 bytes
    # per frame — move/decode the heavy payloads exactly once);
    # measured (with the round-14 JPEG fast paths) m12 4.6 → 2.3 s,
    # its 10× probe 18.8 → 5.7 s, m15 5.4 → 2.4 s, m20 4.8 → 2.2 s.
    if not fp.isStreaming:
        fp = truncate_lineage(fp)
    sizes = fp.groupBy("id").agg(F.count(F.lit(1)).cast("long").alias("n"))
    width = 64 // bands
    mask = (1 << width) - 1

    def _chunk(i):
        return F.shiftrightunsigned("chash", width * i).bitwiseAND(
            F.lit(mask)
        )

    if composite_bands and composite_arity == 3:
        chunks = F.array(
            *[
                F.struct(
                    F.lit((i * bands + j) * bands + k).alias("ci"),
                    (
                        (_chunk(i) * F.lit(1 << width) + _chunk(j))
                        * F.lit(1 << width)
                        + _chunk(k)
                    ).alias("cv"),
                )
                for i in range(bands)
                for j in range(i + 1, bands)
                for k in range(j + 1, bands)
            ]
        )
    elif composite_bands:
        chunks = F.array(
            *[
                F.struct(
                    F.lit(i * bands + j).alias("ci"),
                    (
                        _chunk(i) * F.lit(1 << width) + _chunk(j)
                    ).alias("cv"),
                )
                for i in range(bands)
                for j in range(i + 1, bands)
            ]
        )
    else:
        chunks = F.array(
            *[
                F.struct(F.lit(i).alias("ci"), _chunk(i).alias("cv"))
                for i in range(bands)
            ]
        )
    sig = fp.select("id", "chash", F.explode(chunks).alias("c")).select(
        "id", "chash", F.col("c.ci").alias("ci"), F.col("c.cv").alias("cv")
    )
    if max_chunk_df is not None:
        from pyspark.sql.window import Window

        w = Window.partitionBy("ci", "cv").orderBy("id", "chash")
        sig = (
            sig.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= max_chunk_df)
            .drop("_rn")
        )
    a, b = sig.alias("a"), sig.alias("b")
    ver = (
        a.join(
            b,
            (F.col("a.ci") == F.col("b.ci"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.chash").alias("_ha"),
            F.col("b.chash").alias("_hb"),
        )
        .dropDuplicates(["id_a", "id_b", "_ha", "_hb"])
    )
    from ..observability import observe_count

    ver = observe_count("video_tolerant.candidates", ver)
    ver = ver.filter(
        F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb"))) <= max_hamming
    )
    # tolerant matches can be many-to-one in either direction; the
    # smaller side's distinct-hash count is the only one guaranteed
    # ≤ min(n_a, n_b), so containment stays ≤ 1.0
    matched = ver.groupBy("id_a", "id_b").agg(
        F.least(
            F.count_distinct("_ha"), F.count_distinct("_hb")
        ).cast("long").alias("shared_frames")
    )
    na = sizes.select(F.col("id").alias("id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("id").alias("id_b"), F.col("n").alias("n_b"))
    return (
        matched.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "containment",
            F.col("shared_frames").cast("double")
            / F.least("n_a", "n_b").cast("double"),
        )
        .filter(F.col("containment") >= min_containment)
        .select("id_a", "id_b", "shared_frames", "n_a", "n_b", "containment")
    )


def demo_crosscodec_video_payloads(
    df: DataFrame, id_col: str, *, modulus: int = 10, n_frames: int = 8
) -> DataFrame:
    """Cross-codec near-dup fixture: paired ids share a scene; the
    even member is the raw-DIB AVI, the odd member is the SAME footage
    re-encoded as Motion-JPEG with the lead frame trimmed — bytes and
    frame hashes both drift (JPEG quantization IS the perturbation),
    so only hash-tolerant matching can pair them."""
    import numpy as np

    from pyspark.sql import functions as F

    from .util import spread

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
                scene = i // (2 * modulus)
                frames = [_scene_frame(scene, k) for k in range(n_frames)]
                if (i // modulus) % 2 == 1:
                    content.append(
                        avi_from_frames(
                            np.stack(frames[1:]), codec="MJPG"
                        )
                    )
                else:
                    content.append(avi_from_frames(np.stack(frames)))
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "content": content,
                    "modality": ["video"] * len(content),
                }
            )

    return base.mapInPandas(gen, schema="id long, content binary, modality string")


def demo_avc_twin_payloads(
    df: DataFrame, id_col: str, *, modulus: int = 10, n_frames: int = 8
) -> DataFrame:
    """AVC-ingest near-dup fixture: paired ids share a scene; the
    even member is a lossy Motion-JPEG MP4, the odd member the SAME
    footage (lead frame trimmed) as an ``avc1`` MP4 whose samples are
    REAL spec-conformant I_PCM slices (``mp4.mp4_from_frames_avc``).
    The MJPEG side's quantization drifts every frame hash a few bits
    while the AVC side reconstructs bit-exactly, so only
    hash-tolerant matching can pair them — the m12 contrast, now with
    a genuine H.264 leg the engine both writes and decodes."""
    import numpy as np

    from pyspark.sql import functions as F

    from .mp4 import mp4_from_frames, mp4_from_frames_avc
    from .util import spread

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
                scene = i // (2 * modulus)
                frames = [_scene_frame(scene, k) for k in range(n_frames)]
                if (i // modulus) % 2 == 1:
                    content.append(
                        mp4_from_frames_avc(np.stack(frames[1:]))
                    )
                else:
                    content.append(mp4_from_frames(np.stack(frames)))
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "content": content,
                    "modality": ["video"] * len(content),
                }
            )

    return base.mapInPandas(
        gen, schema="id long, content binary, modality string"
    )


def demo_gif_twin_payloads(
    df: DataFrame, id_col: str, *, modulus: int = 10, n_frames: int = 8
) -> DataFrame:
    """GIF-ingest near-dup fixture: paired ids share a scene; the
    even member is a lossy Motion-JPEG MP4, the odd member the SAME
    footage (lead frame trimmed) re-published as an animated GIF.
    The scene frames carry <=64 distinct colors, so the GIF side is
    pixel-EXACT (LZW is lossless once content fits a palette) while
    JPEG quantization drifts the MP4 side's frame hashes a few bits —
    the m15 contrast with the codec roles reversed onto the format
    every meme re-encode uses; only hash-tolerant matching pairs
    them. Content wider than 256 colors would need a quantizer
    first — ``gif_from_frames`` refuses it, like the format."""
    import numpy as np

    from pyspark.sql import functions as F

    from .gif import gif_from_frames
    from .mp4 import mp4_from_frames
    from .util import spread

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
                scene = i // (2 * modulus)
                frames = [_scene_frame(scene, k) for k in range(n_frames)]
                if (i // modulus) % 2 == 1:
                    content.append(
                        gif_from_frames(
                            np.stack(frames[1:]).astype(np.uint8)
                        )
                    )
                else:
                    content.append(mp4_from_frames(np.stack(frames)))
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "content": content,
                    "modality": ["video"] * len(content),
                }
            )

    return base.mapInPandas(
        gen, schema="id long, content binary, modality string"
    )


def materialize_demo_video_corpus(
    sf_dir: str, *, modulus: int = 10, n_frames: int = 8
) -> str:
    """Land the m12 scene pairs as REAL FILES in MIXED CONTAINERS —
    the even member as a raw-DIB ``.avi``, the odd member (same
    footage, lead frame trimmed) as an MJPEG ``.mp4`` — the corpus
    behind the m13 catalog row, whose point is the cross-CONTAINER
    ingestion lineage: one ``binaryFile`` scan, one sniffing decode
    stage, one tolerant frame join across both container families.
    Frame content is a pure function of doc_id (identical to
    :func:`demo_crosscodec_video_payloads` modulo container), so
    m13's pair set must equal m12's — pinned in the gate.

    Same scaffolding contract as ``materialize_demo_image_corpus``:
    driver-side bounded fixture write (n_docs/modulus small files),
    private temp dir + atomic rename for concurrent builders.
    """
    import os
    import shutil
    import tempfile

    import numpy as np
    import pyarrow.parquet as pq

    from .mp4 import mp4_from_frames

    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    out = f"/tmp/spark_graft_video_{tag}_m{modulus}_v1"
    if os.path.isdir(out):
        return out
    ids = (
        pq.read_table(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
        )
        .column("doc_id")
        .to_pylist()
    )
    tmp = tempfile.mkdtemp(dir="/tmp", prefix="spark_graft_video_build_")
    for i in sorted(int(x) for x in ids if int(x) % modulus == 0):
        scene = i // (2 * modulus)
        frames = [_scene_frame(scene, k) for k in range(n_frames)]
        if (i // modulus) % 2 == 1:
            with open(os.path.join(tmp, f"doc_{i:09d}.mp4"), "wb") as f:
                f.write(mp4_from_frames(np.stack(frames[1:])))
        else:
            with open(os.path.join(tmp, f"doc_{i:09d}.avi"), "wb") as f:
                f.write(avi_from_frames(np.stack(frames)))
    try:
        os.rename(tmp, out)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)  # another builder won
    return out


def avi_video_metadata(payload: bytes) -> dict:
    """Container + codec metadata from the AVI header chunks (avih
    dims/frame count, strh fccHandler) — a proper RIFF walk, no frame
    decode. Raises ValueError on non-AVI / torn payloads."""
    if sniff_modality(payload) != "avi":
        raise ValueError("not an AVI payload")
    out: dict = {"container": "avi", "profile_idc": None, "level_idc": None}

    def walk(off: int, end: int) -> None:
        while off + 8 <= end:
            fourcc = payload[off : off + 4]
            size = struct.unpack_from("<I", payload, off + 4)[0]
            body = off + 8
            if body + size > len(payload):
                raise ValueError("AVI chunk overruns payload")
            if fourcc == b"LIST":
                walk(body + 4, body + size)
            elif fourcc == b"avih":
                # dwTotalFrames at +16, dwWidth/dwHeight at +32/+36
                out["n_samples"] = struct.unpack_from(
                    "<I", payload, body + 16
                )[0]
                out["width"], out["height"] = struct.unpack_from(
                    "<II", payload, body + 32
                )
            elif fourcc == b"strh" and payload[body : body + 4] == b"vids":
                handler = payload[body + 4 : body + 8]
                out["codec"] = (
                    "mjpeg" if handler == b"MJPG" else
                    handler.decode("latin-1").strip().lower() or "raw"
                )
            off = body + size + (size & 1)

    walk(12, len(payload))
    if "width" not in out or "codec" not in out:
        raise ValueError("AVI missing avih/strh headers")
    return out


def video_stream_metadata(payloads: DataFrame) -> DataFrame:
    """The CATALOGING pass of a video corpus: per payload — container,
    codec, coded dimensions, sample count, and (AVC/HEVC) the
    profile/level a decode pool needs to check BEFORE claiming the
    payload. MP4 metadata walks the real box tree (avc1 parses the
    avcC record's SPS bit-exactly — operators/avc.py; MJPEG reports
    its sample table); AVI walks the RIFF headers. NO pixel decode
    anywhere — this is the layer that routes 100 TB of mixed-codec
    uploads to the right decoder fleet (or to quarantine) at
    metadata cost. Non-video payloads are dropped; torn containers
    raise ValueError per-payload and fall out as nulls-free drops."""
    from .mp4 import mp4_video_metadata

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, b in zip(pdf["id"], pdf["content"]):
                data = bytes(b)
                kind = sniff_modality(data)
                try:
                    if kind == "mp4":
                        meta = mp4_video_metadata(data)
                    elif kind == "avi":
                        meta = avi_video_metadata(data)
                    else:
                        continue
                except ValueError:
                    continue  # torn container: drop, never crash
                rows.append(
                    (
                        int(i),
                        meta["container"],
                        meta["codec"],
                        meta["width"],
                        meta["height"],
                        meta["n_samples"],
                        meta["profile_idc"],
                        meta["level_idc"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "container", "codec", "width", "height",
                    "n_samples", "profile_idc", "level_idc",
                ],
            ).astype(
                {
                    "id": "int64", "width": "int64", "height": "int64",
                    "n_samples": "int64",
                    "profile_idc": "Int64", "level_idc": "Int64",
                }
            )

    return payloads.mapInPandas(
        compute,
        schema=(
            "id long, container string, codec string, width long, "
            "height long, n_samples long, profile_idc long, "
            "level_idc long"
        ),
    )


def demo_codec_zoo_payloads(
    df: DataFrame, id_col: str, *, modulus: int = 10
) -> DataFrame:
    """Mixed-codec video fixture stream for the metadata pass
    (``id % modulus == 0`` rows): rotating MJPEG-MP4 / avc1-MP4 /
    MJPEG-AVI / hvc1-MP4 containers whose dimensions, profile, and
    level are pure functions of the id — so a relational oracle can
    recompute what the parser must extract. Executor-side, id-seeded
    (the same pattern as demo_media_payloads)."""
    import numpy as np

    from .util import spread

    base = spread(
        df.select(F.col(id_col).cast("long").alias("id")).where(
            F.col(id_col) % modulus == 0
        )
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .mp4 import mp4_avc_fixture, mp4_from_frames

        for pdf in batches:
            content = []
            for i in pdf["id"]:
                i = int(i)
                w = 34 + (i % 7) * 2
                h = 18 + (i % 5) * 2
                # Derive the rotation selectors from the QUALIFYING-ROW
                # index (i // modulus), not i itself: with modulus=10,
                # i % 4 only ever hits {0, 2} (and i % 2 only 0), so the
                # avc1/hvc1 legs — and their profile alternation — were
                # unreachable (round-13 advice).
                kind = (i // modulus) % 4
                # ...and the profile alternator from the next index
                # digit: (i // modulus) % 2 is CORRELATED with kind
                # (kind 1/3 rows always have an odd index), which
                # would again pin one profile per codec.
                alt = (i // (modulus * 4)) % 2
                if kind in (0, 2):
                    rng = np.random.RandomState(i % 997)
                    frames = rng.randint(
                        0, 256, size=(2, h, w, 3)
                    ).astype(np.uint8)
                    content.append(
                        mp4_from_frames(frames)
                        if kind == 0
                        else avi_from_frames(frames, codec="MJPG")
                    )
                elif kind == 1:
                    content.append(
                        mp4_avc_fixture(
                            w,
                            h,
                            n_samples=2,
                            profile_idc=100 if alt else 66,
                            level_idc=30 + i % 3,
                            seed=i % 997,
                        )
                    )
                else:  # kind == 3: hvc1 (HEVC main=1 / main-10=2)
                    content.append(
                        mp4_avc_fixture(
                            w,
                            h,
                            n_samples=2,
                            profile_idc=2 if alt else 1,
                            level_idc=90 + (i % 3) * 3,
                            seed=i % 997,
                            codec="hevc",
                        )
                    )
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "content": content,
                    "modality": ["video"] * len(content),
                }
            )

    return base.mapInPandas(
        gen, schema="id long, content binary, modality string"
    )
