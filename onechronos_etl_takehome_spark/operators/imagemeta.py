"""Image STREAM METADATA — the image leg of the routing/cataloging
trilogy (video: m14 ``video_stream_metadata``; audio: m17
``audio_stream_metadata``; images: this module, m21).

Before a 100-TB image corpus decodes a single pixel, the pipeline
must know per payload: what container, what coding mode (a
progressive JPEG needs a different decode budget than baseline),
what dimensions (resize/thumbnail routing, aspect filtering), what
depth, how many frames (a 200-frame GIF is video-shaped work). All
of that is header arithmetic:

- **BMP**: BITMAPINFOHEADER fields (width, |height|, bpp).
- **PNG**: the IHDR chunk (big-endian dims, bit depth, color type).
- **JPEG**: the marker walk to SOF0/SOF2 — baseline vs progressive
  is a one-byte distinction that changes decode cost by ~3×;
  segment lengths are walked exactly, entropy data never touched.
- **GIF**: logical screen descriptor + a block walk that COUNTS
  image descriptors by skipping sub-blocks arithmetically — frame
  count without running LZW.

Malformed payloads raise ValueError (fall-to-stub contract). The
m21 catalog row is hash-matched: the fixture zoo rotates all five
coding modes with id-derived parameters and the DuckDB oracle
recomputes exactly what each parser must extract.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .multimodal import sniff_modality


def bmp_info(payload: bytes) -> dict:
    if payload[:2] != b"BM" or len(payload) < 30:
        raise ValueError("not a BMP payload")
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    if width <= 0 or height == 0 or bpp == 0:
        raise ValueError("malformed BMP header")
    return {
        "container": "bmp", "codec": "bmp",
        "width": width, "height": abs(height),
        "bit_depth": bpp, "n_frames": 1,
    }


def png_info(payload: bytes) -> dict:
    if payload[:8] != b"\x89PNG\r\n\x1a\n" or len(payload) < 29:
        raise ValueError("not a PNG payload")
    if payload[12:16] != b"IHDR":
        raise ValueError("PNG missing leading IHDR")
    w, h = struct.unpack_from(">II", payload, 16)
    depth, color_type = payload[24], payload[25]
    if w == 0 or h == 0:
        raise ValueError("malformed IHDR dimensions")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"reserved PNG color type {color_type}")
    return {
        "container": "png", "codec": "png",
        "width": int(w), "height": int(h),
        "bit_depth": depth * channels, "n_frames": 1,
    }


def jpeg_info(payload: bytes) -> dict:
    """Marker walk to the first SOF segment — baseline (SOF0/SOF1)
    vs progressive (SOF2) distinguished; entropy data never read."""
    if payload[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG payload")
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        if pos + 2 > len(payload):
            raise ValueError("JPEG segment length truncated")
        seg_len = struct.unpack_from(">H", payload, pos)[0]
        if seg_len < 2 or pos + seg_len > len(payload):
            raise ValueError("JPEG segment overruns payload")
        if marker in (0xC0, 0xC1, 0xC2):
            if seg_len < 8:
                raise ValueError("JPEG SOF segment short")
            precision = payload[pos + 2]
            h, w = struct.unpack_from(">HH", payload, pos + 3)
            if w == 0 or h == 0:
                raise ValueError("malformed SOF dimensions")
            return {
                "container": "jpeg",
                "codec": (
                    "jpeg-progressive" if marker == 0xC2 else "jpeg-baseline"
                ),
                "width": int(w), "height": int(h),
                "bit_depth": precision, "n_frames": 1,
            }
        if marker == 0xDA:
            break  # scan data before any SOF: malformed
        pos += seg_len
    raise ValueError("JPEG has no SOF before scan data")


def gif_info(payload: bytes) -> dict:
    """Screen descriptor + frame COUNT via the block walk — sub-block
    lengths are skipped arithmetically, LZW never runs."""
    if payload[:6] not in (b"GIF87a", b"GIF89a") or len(payload) < 13:
        raise ValueError("not a GIF payload")
    w, h, packed, _, _ = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    if packed & 0x80:
        pos += (2 << (packed & 0x07)) * 3
    depth = (packed & 0x07) + 1

    def skip_sub_blocks(p: int) -> int:
        while True:
            if p >= len(payload):
                raise ValueError("GIF sub-blocks truncated")
            ln = payload[p]
            p += 1
            if ln == 0:
                return p
            p += ln

    n_frames = 0
    while True:
        if pos >= len(payload):
            raise ValueError("GIF ended without trailer")
        block = payload[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:
            pos = skip_sub_blocks(pos + 1)
        elif block == 0x2C:
            if pos + 9 > len(payload):
                raise ValueError("GIF image descriptor truncated")
            fpacked = payload[pos + 8]
            pos += 9
            if fpacked & 0x80:
                pos += (2 << (fpacked & 0x07)) * 3
            pos += 1  # LZW minimum code size
            pos = skip_sub_blocks(pos)
            n_frames += 1
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    if n_frames == 0:
        raise ValueError("GIF carries no image")
    return {
        "container": "gif", "codec": "gif",
        "width": w, "height": h,
        "bit_depth": depth, "n_frames": n_frames,
    }


def image_stream_metadata(payloads: DataFrame) -> DataFrame:
    """(id, container, codec, width, height, bit_depth, n_frames)
    per payload, header-only — undecodable payloads dropped."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parsers = {
            "bmp": bmp_info, "png": png_info,
            "jpeg": jpeg_info, "gif": gif_info,
        }
        for pdf in batches:
            rows = []
            for i, b in zip(pdf["id"], pdf["content"]):
                data = bytes(b)
                parser = parsers.get(sniff_modality(data))
                if parser is None:
                    continue
                try:
                    si = parser(data)
                except (ValueError, struct.error):
                    continue
                rows.append(
                    (
                        int(i), si["container"], si["codec"], si["width"],
                        si["height"], si["bit_depth"], si["n_frames"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "container", "codec", "width", "height",
                    "bit_depth", "n_frames",
                ],
            )

    return payloads.mapInPandas(
        compute,
        schema=(
            "id long, container string, codec string, width long, "
            "height long, bit_depth long, n_frames long"
        ),
    )


def demo_image_zoo_payloads(
    df: DataFrame, id_col: str, *, modulus: int = 10
) -> DataFrame:
    """The m21 fixture stream, id-derived via independent mixed-radix
    digits (``j = id // modulus``): coding mode ``j % 5`` → BMP /
    PNG / baseline JPEG / progressive JPEG / 4-color GIF; width
    ``20 + ((j // 5) % 5) * 12``; height ``16 + ((j // 25) % 4) *
    10``; GIF frame count ``2 + (j // 5) % 3``."""
    import numpy as np

    from .util import spread

    base = spread(
        df.select(F.col(id_col).cast("long").alias("id")).where(
            F.col(id_col) % modulus == 0
        )
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .gif import gif_from_frames
        from .jpeg import synthesize_jpeg
        from .multimodal import synthesize_bmp, synthesize_png

        palette = np.array(
            [[0, 0, 0], [255, 64, 0], [0, 255, 128], [64, 0, 255]],
            dtype=np.uint8,
        )
        for pdf in batches:
            content = []
            for i in pdf["id"]:
                j = int(i) // modulus
                kind = j % 5
                w = 20 + ((j // 5) % 5) * 12
                h = 16 + ((j // 25) % 4) * 10
                if kind == 0:
                    content.append(synthesize_bmp(w, h, j))
                elif kind == 1:
                    content.append(synthesize_png(w, h, j))
                elif kind in (2, 3):
                    content.append(
                        synthesize_jpeg(w, h, j, progressive=(kind == 3))
                    )
                else:
                    n = 2 + (j // 5) % 3
                    yy, xx = np.mgrid[0:h, 0:w]
                    frames = np.stack(
                        [palette[(xx + yy + j + k) % 4] for k in range(n)]
                    )
                    content.append(gif_from_frames(frames))
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "content": content,
                    "modality": ["image"] * len(content),
                }
            )

    return base.mapInPandas(
        gen, schema="id long, content binary, modality string"
    )
