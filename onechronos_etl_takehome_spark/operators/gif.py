"""GIF codec (87a/89a) in pure stdlib + numpy — animated-GIF ingest
for the video near-dup family.

Animated GIFs are a real slice of any web-scraped video corpus (memes,
screen captures, preview loops), and unlike AVC they are FULLY
decodable without a media library: the pixel layer is LZW over palette
indices — an algorithm, not a table transcription, so there is nothing
to mis-copy from a spec appendix. Implemented both ways:

- **Decoder** (``gif_frames``): header + logical screen descriptor,
  global/local color tables, graphic control extensions (delay,
  transparency index, disposal), IMAGE data via a spec-exact LZW
  decoder (LSB-first code packing, clear/end codes, the GIF
  late-change code-width rule, 12-bit cap with deferred clear),
  4-pass INTERLACE de-weaving, and frame COMPOSITION over the logical
  screen (disposal 0/1 leave, 2 restore background, 3 restore
  previous; transparent pixels leave the canvas untouched). Returns
  (n, H, W, 3) uint8 BGR — the same contract as ``video.avi_frames``
  / ``mp4.mp4_frames``, so GIFs ride the existing fingerprint stage.
- **Encoder** (``gif_from_frames``): GIF89a with a global color
  table built from the frames' actual colors (raises when > 256 —
  palettization is the caller's contract, as real encoders quantize
  first), per-frame graphic control + image descriptor, and a real
  LZW compressor that stays bit-compatible with the decoder's width
  rule and emits a clear code when the dictionary fills.

Corrupt/truncated payloads raise ValueError — the fall-to-stub
contract. ``tests/test_round14c_ops.py`` additionally decodes a
hand-assembled minimal GIF written byte-by-byte from the published
spec (bytes this encoder never produced).
"""

from __future__ import annotations

import struct


# ---------------------------------------------------------------------------
# LZW (GIF variant: LSB-first packing, late code-width change, 12-bit
# cap with deferred clear).
# ---------------------------------------------------------------------------


def lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """LZW-decompress one image's concatenated sub-block bytes into
    palette indices."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    while True:
        while nbits < code_size:
            if pos >= len(data):
                raise ValueError("LZW stream ended without end code")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = table[: clear + 2]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            return bytes(out)
        if code < len(table):
            entry = table[code]
            if not entry and code >= clear:
                raise ValueError("LZW reference to reserved code")
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("LZW reference past the code table")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            # late change: the width grows when the NEXT code to
            # assign would not fit (and never past 12 bits)
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry


def lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """LZW-compress palette indices (the inverse of
    :func:`lzw_decode`, same width convention)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    code_size = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    emit(clear, code_size)
    w = b""
    for b in indices:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w], code_size)
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        else:
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w], code_size)
    emit(end, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# Container.
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def gif_from_frames(
    frames: "object", *, delay_cs: int = 10, loop: bool = True
) -> bytes:
    """Serialize an (n, h, w, 3) uint8 BGR array as an animated
    GIF89a. All frames share one global color table built from the
    actual colors; > 256 distinct colors raise ValueError (quantize
    first — the palettization contract of the format)."""
    import numpy as np

    px = np.asarray(frames, dtype=np.uint8)
    if px.ndim != 4 or px.shape[-1] != 3:
        raise ValueError("expected (n, h, w, 3) BGR frames")
    n, h, w, _ = px.shape
    rgb = px[..., ::-1]  # GIF palettes are RGB
    packed = (
        rgb[..., 0].astype(np.uint32) << 16
    ) | (rgb[..., 1].astype(np.uint32) << 8) | rgb[..., 2]
    colors = np.unique(packed)
    if len(colors) > 256:
        raise ValueError(
            f"{len(colors)} distinct colors; GIF needs a <=256 palette"
        )
    depth = max(1, int(len(colors) - 1).bit_length())
    table_size = 1 << depth
    gct = np.zeros((table_size, 3), dtype=np.uint8)
    gct[: len(colors), 0] = (colors >> 16) & 0xFF
    gct[: len(colors), 1] = (colors >> 8) & 0xFF
    gct[: len(colors), 2] = colors & 0xFF
    out = bytearray(b"GIF89a")
    out += struct.pack(
        "<HHBBB", w, h, 0x80 | ((depth - 1) << 4) | (depth - 1), 0, 0
    )
    out += gct.tobytes()
    if loop and n > 1:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    min_code = max(2, depth)
    for k in range(n):
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        idx = np.searchsorted(colors, packed[k].ravel()).astype(np.uint8)
        out.append(min_code)
        lzw = lzw_encode(idx.tobytes(), min_code)
        for off in range(0, len(lzw), 255):
            chunk = lzw[off : off + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)


def _sub_blocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    chunks = bytearray()
    while True:
        if pos >= len(payload):
            raise ValueError("GIF sub-blocks truncated")
        ln = payload[pos]
        pos += 1
        if ln == 0:
            return bytes(chunks), pos
        chunk = payload[pos : pos + ln]
        if len(chunk) != ln:
            raise ValueError("GIF sub-block overruns payload")
        chunks += chunk
        pos += ln


def gif_frames(payload: bytes) -> "object":
    """Decode an animated (or still) GIF → (n, H, W, 3) uint8 BGR
    frames composited on the logical screen."""
    import numpy as np

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("GIF header truncated")
    w, h, packed, bg, _ = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        size = 2 << (packed & 0x07)
        gct = np.frombuffer(
            payload[pos : pos + size * 3], dtype=np.uint8
        )
        if len(gct) != size * 3:
            raise ValueError("GIF global color table truncated")
        gct = gct.reshape(size, 3)
        pos += size * 3
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None and bg < len(gct):
        canvas[:] = gct[bg]
    background = canvas.copy()
    frames = []
    transparent: int | None = None
    disposal = 0
    while True:
        if pos >= len(payload):
            raise ValueError("GIF ended without trailer")
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(payload):
                raise ValueError("GIF extension truncated")
            label = payload[pos]
            pos += 1
            body, pos = _sub_blocks(payload, pos)
            if label == 0xF9 and len(body) >= 4:
                disposal = (body[0] >> 2) & 0x07
                transparent = body[3] if body[0] & 1 else None
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        if pos + 9 > len(payload):
            raise ValueError("GIF image descriptor truncated")
        left, top, fw, fh, fpacked = struct.unpack_from(
            "<HHHHB", payload, pos
        )
        pos += 9
        if left + fw > w or top + fh > h:
            raise ValueError("GIF frame exceeds the logical screen")
        palette = gct
        if fpacked & 0x80:
            size = 2 << (fpacked & 0x07)
            palette = np.frombuffer(
                payload[pos : pos + size * 3], dtype=np.uint8
            )
            if len(palette) != size * 3:
                raise ValueError("GIF local color table truncated")
            palette = palette.reshape(size, 3)
            pos += size * 3
        if palette is None:
            raise ValueError("GIF frame has no color table")
        if pos >= len(payload):
            raise ValueError("GIF image data truncated")
        min_code = payload[pos]
        pos += 1
        if not 2 <= min_code <= 8:
            raise ValueError(f"bad LZW minimum code size {min_code}")
        data, pos = _sub_blocks(payload, pos)
        idx = np.frombuffer(lzw_decode(data, min_code), dtype=np.uint8)
        if len(idx) < fw * fh:
            raise ValueError("GIF frame pixel data short")
        idx = idx[: fw * fh].reshape(fh, fw)
        if fpacked & 0x40:  # interlaced: de-weave the 4 passes
            de = np.empty_like(idx)
            src = 0
            for start, step in _INTERLACE_PASSES:
                rows = range(start, fh, step)
                for r in rows:
                    de[r] = idx[src]
                    src += 1
            idx = de
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("GIF pixel index outside the color table")
        saved = canvas.copy() if disposal == 3 else None
        region = canvas[top : top + fh, left : left + fw]
        rgb = palette[idx]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        frames.append(canvas[..., ::-1].copy())  # RGB → BGR
        if disposal == 2:
            canvas[top : top + fh, left : left + fw] = background[
                top : top + fh, left : left + fw
            ]
        elif disposal == 3 and saved is not None:
            canvas = saved
        disposal = 0
        transparent = None
    if not frames:
        raise ValueError("GIF carries no image")
    return np.stack(frames)
