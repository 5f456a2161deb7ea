"""ISO BMFF (MP4) container codec in pure stdlib + numpy — the last
media container de-stub.

Scope (exactly what the fixtures and the cross-container near-dup
family need, honestly documented):

- **Writer** (``mp4_from_frames``): a minimal standards-conformant
  ISO/IEC 14496-12 file — ``ftyp`` (isom) → ``mdat`` (concatenated
  samples) → ``moov`` with a full sample-table suite (``stsd stts
  stsc stsz stco``), one video track whose samples are baseline JPEGs
  from ``operators/jpeg.py`` (the ``'jpeg'`` VisualSampleEntry —
  Motion-JPEG-in-MP4, the layout QuickTime and capture pipelines
  emit). The output is a REAL .mp4 any external player can open.
- **Parser** (``mp4_frames``): a real box walk — top-level boxes →
  ``moov`` → each ``trak`` → ``hdlr`` (video tracks only) → ``stbl``,
  then the FULL sample-location algorithm of the spec: ``stsc`` runs
  (sample-to-chunk mapping) × ``stco``/``co64`` chunk offsets ×
  ``stsz`` sample sizes resolve every sample to an absolute byte
  range, each decoded by the pure-numpy JPEG codec. Codecs beyond
  MJPEG (``avc1``/``hvc1``/``mp4v``) raise ValueError — a production
  deployment swaps the sample decoder for ffmpeg behind the same
  contract, exactly the ``avi_frames`` note in ``operators/video.py``.

Corrupt/truncated payloads raise ValueError only (the fall-to-stub
contract every decoder in this package honors — one bad upload must
never crash a 100-TB scan).

At Spark level MP4 rides the SAME Arrow-batched fingerprint stage as
AVI (``video.video_fingerprints`` sniffs the container per payload),
so a mixed .avi/.mp4 corpus flows through ONE binaryFile scan and one
decode stage — the m13 catalog row is the witness.
"""

from __future__ import annotations

import struct


def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def _full_box(fourcc: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(fourcc, struct.pack(">I", (version << 24) | flags) + payload)


def mp4_from_frames(frames: "object", *, fps: int = 10) -> bytes:
    """Serialize an (n, h, w, 3) uint8 BGR array as a minimal valid
    MP4 with one Motion-JPEG video track (``'jpeg'`` sample entry).
    BGR input mirrors ``avi_from_frames`` so the two writers are
    drop-in container swaps of the same footage."""
    from .jpeg import jpeg_from_pixels

    n, h, w = frames.shape[:3]
    samples = [jpeg_from_pixels(frames[k][..., ::-1]) for k in range(n)]
    sizes = [len(s) for s in samples]

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41")
    # mdat directly after ftyp → first sample's absolute offset is
    # len(ftyp) + 8 (the mdat header); all samples land in ONE chunk.
    mdat = _box(b"mdat", b"".join(samples))
    chunk_off = len(ftyp) + 8

    # ---- moov ----------------------------------------------------
    timescale = 1000
    duration = n * timescale // fps
    mvhd = _full_box(
        b"mvhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, timescale, duration)  # times
        + struct.pack(">iHH", 0x00010000, 0x0100, 0)  # rate, volume
        + b"\x00" * 8  # reserved
        + struct.pack(  # identity matrix (16.16 / 2.30 fixed)
            ">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
        )
        + b"\x00" * 24  # pre_defined
        + struct.pack(">I", 2),  # next_track_ID
    )
    tkhd = _full_box(
        b"tkhd",
        0,
        3,  # enabled + in movie
        struct.pack(">IIIII", 0, 0, 1, 0, duration)
        + b"\x00" * 8
        + struct.pack(">hhhH", 0, 0, 0, 0)  # layer, group, volume, rsvd
        + struct.pack(
            ">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
        )
        + struct.pack(">II", w << 16, h << 16),  # 16.16 fixed dims
    )
    mdhd = _full_box(
        b"mdhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, fps, n)  # media timescale=fps → Δ=1
        + struct.pack(">HH", 0x55C4, 0),  # language 'und'
    )
    hdlr = _full_box(
        b"hdlr",
        0,
        0,
        struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"VideoHandler\x00",
    )
    vmhd = _full_box(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full_box(
        b"dref", 0, 0, struct.pack(">I", 1) + _full_box(b"url ", 0, 1, b"")
    )
    dinf = _box(b"dinf", dref)
    # VisualSampleEntry for 'jpeg' (ISO 14496-12 §12.1.3)
    entry = _box(
        b"jpeg",
        b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16  # pre_defined / reserved
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0)  # reserved
        + struct.pack(">H", 1)  # frame_count
        + b"\x00" * 32  # compressorname
        + struct.pack(">Hh", 24, -1),  # depth, pre_defined
    )
    stsd = _full_box(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stts = _full_box(b"stts", 0, 0, struct.pack(">III", 1, n, 1))
    stsc = _full_box(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full_box(
        b"stsz",
        0,
        0,
        struct.pack(">II", 0, n) + struct.pack(f">{n}I", *sizes),
    )
    stco = _full_box(b"stco", 0, 0, struct.pack(">II", 1, chunk_off))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _iter_boxes(payload: bytes, off: int, end: int):
    """Yield (fourcc, body_start, body_end) for the sibling boxes in
    [off, end); handles 64-bit largesize boxes. Malformed sizes raise
    ValueError (never walk past the buffer or loop forever)."""
    while off + 8 <= end:
        size = struct.unpack_from(">I", payload, off)[0]
        fourcc = payload[off + 4 : off + 8]
        body = off + 8
        if size == 1:  # 64-bit largesize
            if off + 16 > end:
                raise ValueError("truncated largesize box header")
            size = struct.unpack_from(">Q", payload, off + 8)[0]
            body = off + 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - off
        if size < body - off or off + size > end:
            raise ValueError(f"box {fourcc!r} overruns its container")
        yield fourcc, body, off + size
        off += size


def _find(payload: bytes, off: int, end: int, fourcc: bytes):
    for fc, b, e in _iter_boxes(payload, off, end):
        if fc == fourcc:
            return b, e
    return None


def mp4_frames(payload: bytes) -> "object":
    """REAL decode of an MJPEG or I_PCM-AVC MP4: box walk → video
    trak → sample table → per-sample decode (JPEG entropy decode for
    ``jpeg`` entries; the byte-exact I_PCM slice layer of
    ``operators/avc.py`` for ``avc1`` entries). Returns (n, h, w, 3)
    uint8 BGR (the ``avi_frames`` contract, so fingerprinting is
    container-agnostic). ValueError on non-MP4 magic, entropy-coded
    AVC / HEVC (ffmpeg territory), and any truncated/corrupt
    structure."""
    import numpy as np

    from .jpeg import jpeg_pixels

    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an MP4 payload")
    try:
        frames = _mp4_frames_checked(payload, jpeg_pixels, np)
    except (IndexError, struct.error) as e:
        raise ValueError(f"corrupt MP4 payload: {type(e).__name__}: {e}")
    if not frames:
        raise ValueError("MP4 has no decodable video samples")
    return np.stack(frames)


def _mp4_frames_checked(payload: bytes, jpeg_pixels, np) -> list:
    moov = _find(payload, 0, len(payload), b"moov")
    if moov is None:
        raise ValueError("MP4 missing moov box")
    frames: list = []
    for fc, tb, te in _iter_boxes(payload, *moov):
        if fc != b"trak":
            continue
        mdia = _find(payload, tb, te, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(payload, *mdia, b"hdlr")
        if hdlr is None or payload[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        minf = _find(payload, *mdia, b"minf")
        stbl = minf and _find(payload, *minf, b"stbl")
        if not stbl:
            raise ValueError("video trak missing stbl")
        stsd = _find(payload, *stbl, b"stsd")
        if stsd is None:
            raise ValueError("stbl missing stsd")
        codec = payload[stsd[0] + 12 : stsd[0] + 16]
        decode_avc = None
        if codec == b"avc1":
            decode_avc = _avc_sample_decoder(payload, stsd, np)
        elif codec not in (b"jpeg", b"mjpa", b"MJPG"):
            raise ValueError(
                f"unsupported MP4 codec {codec!r} (MJPEG + I_PCM AVC "
                "only; entropy-coded AVC / HEVC need ffmpeg)"
            )
        sizes = _parse_stsz(payload, stbl)
        offsets = _parse_chunk_offsets(payload, stbl)
        runs = _parse_stsc(payload, stbl)
        # resolve every sample to an absolute byte range: walk chunks
        # in order, each chunk's samples laid out back-to-back from
        # its stco offset, samples-per-chunk given by the active stsc
        # run (a run covers [first_chunk, next run's first_chunk)).
        si = 0
        for ci in range(len(offsets)):
            spc = _samples_in_chunk(runs, ci + 1)
            pos = offsets[ci]
            for _ in range(spc):
                if si >= len(sizes):
                    break
                data = payload[pos : pos + sizes[si]]
                if len(data) != sizes[si]:
                    raise ValueError("sample overruns mdat")
                if decode_avc is not None:
                    frames.extend(
                        rgb[..., ::-1] for rgb in decode_avc(data)
                    )
                else:
                    rgb = jpeg_pixels(data)
                    frames.append(rgb[..., ::-1])  # contract is BGR
                pos += sizes[si]
                si += 1
    return frames


def _avc_sample_decoder(payload: bytes, stbl_stsd, np):
    """Build the per-sample decoder for an ``avc1`` track: parse the
    sample entry's avcC record (SPS + NAL length size), then decode
    each sample's length-prefixed NALs through the I_PCM layer.
    Entropy-coded slices raise ValueError — the fall-to-stub contract
    — while I_PCM streams (our own writer, or any conformant encoder
    in PCM mode) reconstruct bit-exactly."""
    from .avc import decode_ipcm_idr, parse_avcc
    from .jpeg import _ycbcr_to_rgb

    stsd0 = stbl_stsd[0]
    entry_size = struct.unpack_from(">I", payload, stsd0 + 8)[0]
    entry_end = stsd0 + 8 + entry_size
    # children follow the 78-byte VisualSampleEntry fixed fields
    avcc_loc = _find(payload, stsd0 + 16 + 78, entry_end, b"avcC")
    if avcc_loc is None:
        raise ValueError("avc1 entry missing avcC record")
    cfg = parse_avcc(payload[avcc_loc[0] : avcc_loc[1]])
    nls = cfg["nal_length_size"]
    x0, y0 = cfg["crop_left"], cfg["crop_top"]
    w, h = cfg["width"], cfg["height"]

    def decode(sample: bytes) -> list:
        out = []
        pos = 0
        while pos < len(sample):
            if pos + nls > len(sample):
                raise ValueError("AVC NAL length field truncated")
            ln = int.from_bytes(sample[pos : pos + nls], "big")
            pos += nls
            nal = sample[pos : pos + ln]
            if len(nal) != ln or not nal:
                raise ValueError("AVC NAL overruns its sample")
            pos += ln
            t = nal[0] & 0x1F
            if t == 5:  # IDR slice — the I_PCM decode path
                y, cb, cr = decode_ipcm_idr(nal, cfg)
                ycc = np.empty((*y.shape, 3), dtype=np.float64)
                ycc[..., 0] = y
                # 4:2:0 → nearest-neighbor upsample
                ycc[..., 1] = np.repeat(np.repeat(cb, 2, 0), 2, 1)
                ycc[..., 2] = np.repeat(np.repeat(cr, 2, 0), 2, 1)
                rgb = (_ycbcr_to_rgb(ycc) + 0.5).astype(np.uint8)
                out.append(rgb[y0 : y0 + h, x0 : x0 + w])
            elif t in (1,):  # non-IDR slice: inter prediction
                raise ValueError(
                    "inter-coded AVC slice: decode needs ffmpeg"
                )
            # SPS/PPS/SEI/AUD ride along in-sample for some muxers —
            # parameter sets already came from avcC; skip them.
            elif t not in (6, 7, 8, 9):
                raise ValueError(
                    f"AVC NAL type {t} is outside the I_PCM subset"
                )
        return out

    return decode


def _parse_stsz(payload: bytes, stbl) -> list[int]:
    stsz = _find(payload, *stbl, b"stsz")
    if stsz is None:
        raise ValueError("stbl missing stsz")
    b = stsz[0]
    fixed, count = struct.unpack_from(">II", payload, b + 4)
    if fixed:
        return [fixed] * count
    return list(struct.unpack_from(f">{count}I", payload, b + 12))


def _parse_chunk_offsets(payload: bytes, stbl) -> list[int]:
    stco = _find(payload, *stbl, b"stco")
    if stco is not None:
        b = stco[0]
        count = struct.unpack_from(">I", payload, b + 4)[0]
        return list(struct.unpack_from(f">{count}I", payload, b + 8))
    co64 = _find(payload, *stbl, b"co64")
    if co64 is None:
        raise ValueError("stbl missing stco/co64")
    b = co64[0]
    count = struct.unpack_from(">I", payload, b + 4)[0]
    return list(struct.unpack_from(f">{count}Q", payload, b + 8))


def _parse_stsc(payload: bytes, stbl) -> list[tuple[int, int]]:
    stsc = _find(payload, *stbl, b"stsc")
    if stsc is None:
        raise ValueError("stbl missing stsc")
    b = stsc[0]
    count = struct.unpack_from(">I", payload, b + 4)[0]
    runs = []
    for i in range(count):
        first, spc, _desc = struct.unpack_from(">III", payload, b + 8 + 12 * i)
        runs.append((first, spc))
    if not runs or runs[0][0] != 1:
        raise ValueError("stsc must start at chunk 1")
    return runs


def _samples_in_chunk(runs: list[tuple[int, int]], chunk_no: int) -> int:
    spc = runs[0][1]
    for first, n in runs:
        if first <= chunk_no:
            spc = n
        else:
            break
    return spc


# ---------------------------------------------------------------------------
# Stream METADATA (no pixel decode): the routing/cataloging pass a
# 100-TB video corpus runs on every payload before deciding which
# decode pool (if any) can play it. MJPEG reports its own sample
# table; avc1 parses the avcC record's SPS for exact coded+cropped
# dimensions (operators/avc.py); hvc1/hev1 report the hvcC record's
# profile/tier/level plus the sample-entry dimensions (an HEVC SPS
# parse is out of scope, honestly — the entry dims are the container's
# own declaration, which real muxers fill).
# ---------------------------------------------------------------------------


def mp4_video_metadata(payload: bytes) -> dict:
    """Container + codec metadata of the FIRST video track:
    ``{container, codec, width, height, n_samples, profile_idc,
    level_idc}`` (profile/level None for MJPEG). Raises ValueError on
    non-MP4 / torn payloads — the fall-to-stub contract."""
    moov = _find(payload, 0, len(payload), b"moov")
    if moov is None:
        raise ValueError("MP4 missing moov box")
    for fc, tb, te in _iter_boxes(payload, *moov):
        if fc != b"trak":
            continue
        mdia = _find(payload, tb, te, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(payload, *mdia, b"hdlr")
        if hdlr is None or payload[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        minf = _find(payload, *mdia, b"minf")
        stbl = minf and _find(payload, *minf, b"stbl")
        if not stbl:
            raise ValueError("video trak missing stbl")
        stsd = _find(payload, *stbl, b"stsd")
        if stsd is None:
            raise ValueError("stbl missing stsd")
        entry_start = stsd[0] + 8  # past version/flags + entry_count
        codec = payload[entry_start + 4 : entry_start + 8]
        # VisualSampleEntry: 8-byte box header, 6 reserved + 2 dref,
        # 16 pre_defined/reserved, then 16-bit width/height
        w, h = struct.unpack_from(">HH", payload, entry_start + 32)
        n_samples = len(_parse_stsz(payload, stbl))
        out = {
            "container": "mp4",
            "codec": codec.decode("latin-1").strip(),
            "width": int(w),
            "height": int(h),
            "n_samples": n_samples,
            "profile_idc": None,
            "level_idc": None,
        }
        entry_len = struct.unpack_from(">I", payload, entry_start)[0]
        children = (entry_start + 8 + 78, entry_start + entry_len)
        if codec in (b"avc1", b"avc3"):
            from .avc import parse_avcc

            avcc = _find(payload, *children, b"avcC")
            if avcc is None:
                raise ValueError("avc1 entry missing avcC record")
            sps = parse_avcc(payload[avcc[0] : avcc[1]])
            out.update(
                codec="avc",
                width=sps["width"],
                height=sps["height"],
                profile_idc=sps["profile_idc"],
                level_idc=sps["level_idc"],
            )
        elif codec in (b"hvc1", b"hev1"):
            from .avc import parse_hvcc

            hvcc = _find(payload, *children, b"hvcC")
            if hvcc is None:
                raise ValueError("hvc1 entry missing hvcC record")
            rec = parse_hvcc(payload[hvcc[0] : hvcc[1]])
            out.update(
                codec="hevc",
                profile_idc=rec["profile_idc"],
                level_idc=rec["level_idc"],
                # exact SPS dims when the record ships its SPS array
                # (real muxers do); otherwise keep the entry's own
                # declared dimensions
                width=rec.get("width", out["width"]),
                height=rec.get("height", out["height"]),
            )
        elif codec in (b"jpeg", b"mjpa", b"MJPG"):
            out["codec"] = "mjpeg"
        return out
    raise ValueError("MP4 has no video track")


def mp4_avc_fixture(
    width: int,
    height: int,
    *,
    n_samples: int = 2,
    profile_idc: int = 66,
    level_idc: int = 30,
    seed: int = 0,
    codec: str = "avc",
) -> bytes:
    """A structurally REAL avc1 (or, ``codec="hevc"``, hvc1) MP4 —
    full moov + sample tables + an avcC/hvcC record embedding a
    conformant SPS from operators/avc.py — whose mdat carries opaque
    seeded bytes instead of coded slices: the fixture for the metadata
    pass, which never opens mdat. Pixel decode of this file raises,
    exactly like any other entropy-coded AVC/HEVC payload (the bytes
    are not valid length-prefixed NALs)."""
    samples = [
        bytes(((seed + 17 * k + j) * 131) % 256 for j in range(64))
        for k in range(n_samples)
    ]
    return _avc_container(
        samples, width, height,
        profile_idc=profile_idc, level_idc=level_idc, codec=codec,
    )


def mp4_from_frames_avc(frames: "object", *, fps: int = 10) -> bytes:
    """Serialize an (n, h, w, 3) uint8 BGR array as an avc1 MP4 whose
    samples are REAL spec-conformant H.264: one IDR slice of I_PCM
    macroblocks per frame (14496-10 §7.3.5 — raw byte-aligned 4:2:0
    samples, bit-exact by construction, playable by any conformant
    decoder). The lossless write-side twin of :func:`mp4_from_frames`'s
    lossy MJPEG: the pair gives the near-dup family a real AVC corpus
    leg without a media library. Even display dims required (4:2:0);
    the coded grid pads to 16 by edge replication and the SPS
    conformance window crops it back."""
    import numpy as np

    from .avc import encode_ipcm_idr, parse_sps, synthesize_sps
    from .jpeg import _rgb_to_ycbcr

    n, h, w = frames.shape[:3]
    sps = parse_sps(synthesize_sps(w, h))
    ch, cw = sps["coded_height"], sps["coded_width"]
    samples = []
    for k in range(n):
        rgb = frames[k][..., ::-1].astype(np.float64)  # BGR contract
        pad = np.pad(
            rgb, ((0, ch - h), (0, cw - w), (0, 0)), mode="edge"
        )
        ycc = np.clip(_rgb_to_ycbcr(pad) + 0.5, 0, 255).astype(np.uint8)
        y = ycc[..., 0]
        # 4:2:0 chroma: mean of each 2x2 block, rounded half-up
        cbcr = ycc[..., 1:].astype(np.float64)
        sub = (
            cbcr.reshape(ch // 2, 2, cw // 2, 2, 2).mean(axis=(1, 3))
            + 0.5
        ).astype(np.uint8)
        nal = encode_ipcm_idr(
            y, sub[..., 0], sub[..., 1], idr_pic_id=k % 2, sps=sps
        )
        samples.append(struct.pack(">I", len(nal)) + nal)
    return _avc_container(samples, w, h, fps=fps)


def _avc_container(
    samples: list[bytes],
    width: int,
    height: int,
    *,
    profile_idc: int = 66,
    level_idc: int = 30,
    codec: str = "avc",
    fps: int = 10,
) -> bytes:
    """One-video-track avc1/hvc1 MP4 around the given mdat samples
    (length-prefixed NALs for real streams; opaque bytes for the
    metadata fixtures)."""
    from .avc import synthesize_avcc, synthesize_hvcc

    n_samples = len(samples)
    sizes = [len(s) for s in samples]
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2avc1")
    mdat = _box(b"mdat", b"".join(samples))
    chunk_off = len(ftyp) + 8
    n = n_samples
    timescale = 1000
    duration = n * timescale // fps
    mvhd = _full_box(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">iHH", 0x00010000, 0x0100, 0)
        + b"\x00" * 8
        + struct.pack(
            ">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
        )
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    tkhd = _full_box(
        b"tkhd", 0, 3,
        struct.pack(">IIIII", 0, 0, 1, 0, duration)
        + b"\x00" * 8
        + struct.pack(">hhhH", 0, 0, 0, 0)
        + struct.pack(
            ">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
        )
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _full_box(
        b"mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, fps, n) + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = _full_box(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"VideoHandler\x00",
    )
    vmhd = _full_box(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dinf = _box(
        b"dinf",
        _full_box(
            b"dref", 0, 0,
            struct.pack(">I", 1) + _full_box(b"url ", 0, 1, b""),
        ),
    )
    if codec == "hevc":
        avcc = _box(
            b"hvcC",
            synthesize_hvcc(
                width, height,
                profile_idc=profile_idc, level_idc=level_idc,
            ),
        )
    else:
        avcc = _box(
            b"avcC",
            synthesize_avcc(
                width, height,
                profile_idc=profile_idc, level_idc=level_idc,
            ),
        )
    entry = _box(
        b"hvc1" if codec == "hevc" else b"avc1",
        b"\x00" * 6
        + struct.pack(">H", 1)
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)
        + b"\x00" * 32
        + struct.pack(">Hh", 24, -1)
        + avcc,
    )
    stsd = _full_box(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stts = _full_box(b"stts", 0, 0, struct.pack(">III", 1, n, 1))
    stsc = _full_box(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full_box(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n) + struct.pack(f">{n}I", *sizes),
    )
    stco = _full_box(b"stco", 0, 0, struct.pack(">II", 1, chunk_off))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
