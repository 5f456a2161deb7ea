"""Round-14 third-wave pins: the GIF codec (operators/gif.py) and
the m20 GIF-ingest near-dup leg.

Anchors beyond the codec's own round-trip: a MINIMAL GIF assembled
byte-by-byte from the published spec layout (bytes the encoder never
produced), and decode-side features the encoder never writes
(interlace, local color tables, disposal modes, transparency) driven
by hand-assembled containers built on the module's raw LZW encoder
only.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from onechronos_etl_takehome_spark.operators.gif import (
    gif_frames,
    gif_from_frames,
    lzw_decode,
    lzw_encode,
)
from onechronos_etl_takehome_spark.operators.multimodal import sniff_modality

SF = "/root/testdata/sf0.001"


def test_lzw_roundtrips_growth_and_reset():
    rng = np.random.RandomState(0)
    for m in (2, 3, 8):
        for n in (1, 7, 4096, 30000):  # 30k forces a dictionary reset
            data = rng.randint(0, 1 << m, n).astype(np.uint8).tobytes()
            assert lzw_decode(lzw_encode(data, m), m) == data
    # adversarial: long runs (the classic K w K w K pattern exercises
    # the code==next_code "not yet in table" branch)
    runs = bytes([1, 1, 1, 1, 1, 2, 2, 2, 2, 1, 1, 1] * 500)
    assert lzw_decode(lzw_encode(runs, 2), 2) == runs
    with pytest.raises(ValueError):
        lzw_decode(b"", 2)  # no end code


def test_gif_roundtrip_exact_and_palette_guard():
    frames = np.zeros((4, 24, 32, 3), np.uint8)
    for k in range(4):
        frames[k, :, : 8 * (k + 1)] = [40 * k, 255 - 50 * k, 30]
        frames[k, 5:10, 5:10] = [200, 10, 10 * k]
    enc = gif_from_frames(frames)
    assert sniff_modality(enc) == "gif"
    assert np.array_equal(gif_frames(enc), frames)
    # exactly 256 colors fits; 257+ must refuse
    g = np.zeros((1, 16, 16, 3), np.uint8)
    g[0, ..., 0] = np.arange(256).reshape(16, 16)
    assert np.array_equal(gif_frames(gif_from_frames(g)), g)
    rng = np.random.RandomState(1)
    with pytest.raises(ValueError, match="palette"):
        gif_from_frames(
            rng.randint(0, 256, (1, 32, 32, 3)).astype(np.uint8)
        )


def test_decodes_hand_assembled_minimal_gif():
    # the canonical 1x1 white GIF89a, written from the spec layout:
    # header, 2-color GCT, GCE, image descriptor, LZW min code 2,
    # data block 0x44 0x01 (clear, index 0, end), trailer
    tiny = bytes.fromhex(
        "474946383961"          # GIF89a
        "01000100" "800000"     # 1x1 screen, GCT flag, depth 1
        "ffffff" "000000"       # palette: white, black
        "21f9040100000000"      # graphic control extension
        "2c000000000100010000"  # image descriptor 1x1, no LCT
        "02" "02" "4401" "00"   # LZW min 2; block [0x44 0x01]; end
        "3b"                    # trailer
    )
    out = gif_frames(tiny)
    assert out.shape == (1, 1, 1, 3)
    assert out[0, 0, 0].tolist() == [255, 255, 255]


def _raw_image_block(idx: np.ndarray, *, interlace=False, lct=None,
                     left=0, top=0, transparent=None, disposal=0):
    """Hand-build GCE + image descriptor + LZW data (decoder-side
    features the encoder never emits)."""
    h, w = idx.shape
    out = bytearray()
    packed = (disposal << 2) | (1 if transparent is not None else 0)
    out += bytes([0x21, 0xF9, 4, packed, 0, 0, transparent or 0, 0])
    flags = (0x40 if interlace else 0)
    if lct is not None:
        depth = (len(lct) - 1).bit_length()
        flags |= 0x80 | (depth - 1)
    out += b"\x2c" + struct.pack("<HHHH", left, top, w, h) + bytes([flags])
    if lct is not None:
        out += np.asarray(lct, np.uint8).tobytes()
    if interlace:  # store rows in 4-pass order
        order = []
        for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
            order += list(range(start, h, step))
        idx = idx[order]
    out.append(2)
    data = lzw_encode(idx.astype(np.uint8).tobytes(), 2)
    for off in range(0, len(data), 255):
        chunk = data[off : off + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _container(w, h, gct, *blocks):
    depth = (len(gct) - 1).bit_length()
    head = b"GIF89a" + struct.pack(
        "<HHBBB", w, h, 0x80 | (depth - 1), 0, 0
    ) + np.asarray(gct, np.uint8).tobytes()
    return head + b"".join(blocks) + b"\x3b"


def test_interlace_transparency_and_disposal():
    gct = [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]]
    rng = np.random.RandomState(2)
    idx = rng.randint(0, 4, (16, 8)).astype(np.uint8)
    # interlaced encoding must decode identically to sequential
    plain = gif_frames(_container(8, 16, gct, _raw_image_block(idx)))
    woven = gif_frames(
        _container(8, 16, gct, _raw_image_block(idx, interlace=True))
    )
    assert np.array_equal(plain, woven)
    # frame 2 paints a patch with a LOCAL palette + transparency:
    # transparent pixels must leave frame 1's canvas visible
    patch = np.array([[1, 0], [0, 1]], np.uint8)  # 0 = transparent
    lct = [[0, 0, 0], [255, 255, 0]]
    two = gif_frames(
        _container(
            8, 16, gct,
            _raw_image_block(idx),
            _raw_image_block(patch, lct=lct, left=3, top=5, transparent=0),
        )
    )
    assert two.shape[0] == 2
    rgb1 = two[0]
    rgb2 = two[1]
    assert rgb2[5, 3].tolist() == [0, 255, 255]  # BGR of yellow
    assert np.array_equal(rgb2[5, 4], rgb1[5, 4])  # transparent hole
    assert np.array_equal(rgb2[6, 3], rgb1[6, 3])
    # disposal 2 restores the background between frames
    bg_then_full = gif_frames(
        _container(
            8, 16, gct,
            _raw_image_block(patch, lct=lct, left=0, top=0, disposal=2),
            _raw_image_block(idx),
        )
    )
    assert np.array_equal(bg_then_full[1], plain[0])


def test_corruption_raises():
    frames = np.zeros((2, 8, 8, 3), np.uint8)
    frames[1, 2:5] = 77
    enc = bytearray(gif_from_frames(frames))
    with pytest.raises(ValueError):
        gif_frames(bytes(enc[: len(enc) // 2]))
    with pytest.raises(ValueError):
        gif_frames(b"GIF89a" + bytes(5))
    bad = bytearray(enc)
    bad[-10] = 0xEE  # corrupt inside the last LZW block
    with pytest.raises(ValueError):
        gif_frames(bytes(bad[:-1]))  # and drop the trailer


def test_image_metadata_parsers_and_zoo(spark):
    from onechronos_etl_takehome_spark.operators import imagemeta as im
    from onechronos_etl_takehome_spark.sources.tables import load_table

    # header-only proof: a GIF with CORRUPT pixel data but intact
    # structure still catalogs (LZW never runs), and frame count
    # comes from the block walk
    frames = np.zeros((3, 8, 8, 3), np.uint8)
    frames[1, 2:5] = 77
    enc = bytearray(gif_from_frames(frames))
    enc[-6] ^= 0xFF  # corrupt LZW bytes of the last frame
    si = im.gif_info(bytes(enc))
    assert (si["n_frames"], si["width"], si["height"]) == (3, 8, 8)
    with pytest.raises(ValueError):
        gif_frames(bytes(enc))  # the full decode DOES notice
    # the zoo has no dead legs: all five coding modes × widths live
    docs = load_table(spark, SF, "documents")
    md = im.image_stream_metadata(
        im.demo_image_zoo_payloads(docs, "doc_id")
    ).collect()
    assert len(md) == docs.where(F.col("doc_id") % 10 == 0).count()
    assert {r["codec"] for r in md} == {
        "bmp", "png", "jpeg-baseline", "jpeg-progressive", "gif",
    }
    combos = {(r["codec"], r["width"]) for r in md}
    assert len(combos) == 25, sorted(combos)
    assert {r["n_frames"] for r in md if r["codec"] == "gif"} == {2, 3, 4}


def test_m20_recovers_planted_gif_twins(spark):
    from onechronos_etl_takehome_spark.operators import video as vid
    from onechronos_etl_takehome_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    n = docs.where(F.col("doc_id") % 10 == 0).count()
    payloads = vid.demo_gif_twin_payloads(docs, "doc_id")
    kinds = {
        int(r["id"]): sniff_modality(bytes(r["content"]))
        for r in payloads.collect()
    }
    assert {kinds[i] for i in kinds if (i // 10) % 2 == 1} == {"gif"}
    assert {kinds[i] for i in kinds if (i // 10) % 2 == 0} == {"mp4"}
    # exact containment finds nothing (JPEG drift); tolerant finds all
    exact = vid.video_match_pairs(payloads, min_containment=0.6).collect()
    assert exact == []
    tol = vid.video_match_pairs_tolerant(
        payloads, min_containment=0.6, n_videos=n
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in tol}
    assert got == {(g * 20, g * 20 + 10) for g in range(n // 2)}
