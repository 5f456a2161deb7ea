"""Ogg container STREAM METADATA (Opus + Vorbis) in pure stdlib —
the streaming-audio legs of the m17 cataloging pass.

Opus-in-Ogg is THE format speech/voice corpora arrive in (podcasts,
voice chat, TTS training sets), Vorbis its predecessor; a 100-TB
audio routing pass must catalog both even though sample decode of
the codecs honestly needs a media library (the same split
``operators/mpeg_audio.py`` makes for MP3/AAC and ``avc.py`` for
HEVC). What IS implemented, fully:

- **Page transport** (RFC 3533): the 27-byte page header walk —
  capture pattern, version, header-type flags, granule position,
  serial, page sequence, lacing-value segment table — with the page
  CRC-32 (poly 0x04C11DB7, init 0, unreflected, over the page with
  the CRC field zeroed) VERIFIED on every page, sequence-gap and
  multi-bitstream detection, and packet reassembly across lacing
  boundaries.
- **Codec identification headers**: OpusHead (RFC 7845 §5.1 —
  version, channel count, pre-skip, input sample rate, mapping
  family) and the Vorbis identification header (Vorbis I §4.2.2 —
  channels, rate, blocksizes, framing bit).
- **Duration from granules**: the last page's granule position gives
  the PCM length (Opus: 48 kHz units minus pre-skip; Vorbis: rate
  units) — structure, not guesswork.

Synthesis emits structurally REAL Ogg: conformant BOS/comment/EOS
pages with correct CRCs and lacing, real identification headers, and
opaque audio packets — the ``mp4_avc_fixture`` shape. Corrupt pages
raise ValueError (the fall-to-stub contract).
"""

from __future__ import annotations

import struct


def _crc32_table() -> list[int]:
    table = []
    for byte in range(256):
        crc = byte << 24
        for _ in range(8):
            crc = ((crc << 1) ^ 0x04C11DB7) if crc & 0x80000000 else crc << 1
            crc &= 0xFFFFFFFF
        table.append(crc)
    return table


_CRC32_TABLE = _crc32_table()


def ogg_crc(data: bytes) -> int:
    """The Ogg page CRC-32: poly 0x04C11DB7, init 0, no reflection,
    no final xor (RFC 3533 §6 — NOT the zlib crc32)."""
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC32_TABLE[(crc >> 24) ^ b]
    return crc


def _page(
    serial: int,
    seq: int,
    granule: int,
    packets: list[bytes],
    *,
    bos: bool = False,
    eos: bool = False,
) -> bytes:
    """One Ogg page carrying whole packets (each < 255*255 bytes
    here, so lacing never spans pages)."""
    lacing = bytearray()
    body = bytearray()
    for p in packets:
        q, r = divmod(len(p), 255)
        lacing += b"\xff" * q + bytes([r])
        body += p
    header = struct.pack(
        "<4sBBqIIIB",
        b"OggS",
        0,
        (0x02 if bos else 0) | (0x04 if eos else 0),
        granule,
        serial,
        seq,
        0,  # CRC placeholder
        len(lacing),
    ) + bytes(lacing)
    page = bytearray(header + body)
    crc = ogg_crc(bytes(page))
    page[22:26] = struct.pack("<I", crc)
    return bytes(page)


def synthesize_ogg_opus(
    n_frames: int,
    input_sample_rate: int,
    *,
    channels: int = 1,
    pre_skip: int = 312,
    serial: int = 0x1234,
) -> bytes:
    """Structurally real Ogg-Opus: BOS page with a conformant
    OpusHead, an OpusTags comment page, opaque 20 ms audio packets,
    and an EOS granule covering ``n_frames`` frames (960 48-kHz
    samples each) plus the pre-skip."""
    head = (
        b"OpusHead"
        + bytes([1, channels])
        + struct.pack("<H", pre_skip)
        + struct.pack("<I", input_sample_rate)
        + struct.pack("<h", 0)  # output gain
        + bytes([0])  # mapping family 0
    )
    tags = b"OpusTags" + struct.pack("<I", 4) + b"etl0" + struct.pack("<I", 0)
    audio = [
        bytes((13 * (i + k)) & 0xFF for k in range(60))
        for i in range(n_frames)
    ]
    granule = pre_skip + 960 * n_frames
    return (
        _page(serial, 0, 0, [head], bos=True)
        + _page(serial, 1, 0, [tags])
        + _page(serial, 2, granule, audio, eos=True)
    )


def synthesize_ogg_vorbis(
    n_samples: int,
    sample_rate: int,
    *,
    channels: int = 1,
    serial: int = 0x5678,
) -> bytes:
    """Structurally real Ogg-Vorbis: BOS page with a conformant
    identification header, a comment page, opaque audio packets, and
    an EOS granule of ``n_samples`` PCM samples."""
    ident = (
        bytes([1])
        + b"vorbis"
        + struct.pack("<I", 0)  # vorbis_version
        + bytes([channels])
        + struct.pack("<I", sample_rate)
        + struct.pack("<iii", 0, 112000, 0)  # bitrates
        + bytes([(11 << 4) | 8])  # blocksizes 2^8 / 2^11
        + bytes([1])  # framing flag
    )
    comment = (
        bytes([3]) + b"vorbis"
        + struct.pack("<I", 4) + b"etl0"
        + struct.pack("<I", 0) + bytes([1])
    )
    audio = [
        bytes((17 * (i + k)) & 0xFF for k in range(48)) for i in range(3)
    ]
    return (
        _page(serial, 0, 0, [ident], bos=True)
        + _page(serial, 1, 0, [comment])
        + _page(serial, 2, n_samples, audio, eos=True)
    )


def _walk_pages(payload: bytes):
    """Yield (header_type, granule, serial, seq, packets_completed,
    carry) per page, CRC-verified; raises ValueError on corruption."""
    pos = 0
    expected_seq: int | None = None
    serial0: int | None = None
    carry = b""
    while pos < len(payload):
        if payload[pos : pos + 4] != b"OggS":
            raise ValueError("Ogg capture pattern lost")
        if pos + 27 > len(payload):
            raise ValueError("Ogg page header truncated")
        (
            _, version, htype, granule, serial, seq, crc, nsegs
        ) = struct.unpack_from("<4sBBqIIIB", payload, pos)
        if version != 0:
            raise ValueError(f"Ogg stream structure version {version}")
        seg_end = pos + 27 + nsegs
        if seg_end > len(payload):
            raise ValueError("Ogg segment table truncated")
        lacing = payload[pos + 27 : seg_end]
        body_len = sum(lacing)
        page_end = seg_end + body_len
        if page_end > len(payload):
            raise ValueError("Ogg page body truncated")
        zeroed = bytearray(payload[pos:page_end])
        zeroed[22:26] = b"\x00\x00\x00\x00"
        if ogg_crc(bytes(zeroed)) != crc:
            raise ValueError("Ogg page CRC mismatch")
        if serial0 is None:
            serial0 = serial
        elif serial != serial0:
            raise ValueError("multiplexed Ogg bitstreams unsupported")
        if expected_seq is not None and seq != expected_seq:
            raise ValueError("Ogg page sequence gap")
        expected_seq = seq + 1
        # packet reassembly: lacing < 255 terminates a packet
        packets = []
        body_pos = seg_end
        if not (htype & 0x01):
            carry = b""
        cur = bytearray(carry)
        for lace in lacing:
            cur += payload[body_pos : body_pos + lace]
            body_pos += lace
            if lace < 255:
                packets.append(bytes(cur))
                cur = bytearray()
        carry = bytes(cur)
        yield htype, granule, packets
        pos = page_end
    if carry:
        raise ValueError("Ogg packet spans past the final page")


def parse_ogg_stream(payload: bytes) -> dict:
    """Walk an Ogg stream → metadata dict (container/codec/rate/
    channels/sample length) with every page CRC enforced."""
    first_packet: bytes | None = None
    last_granule = 0
    saw_eos = False
    n_pages = 0
    for htype, granule, packets in _walk_pages(payload):
        n_pages += 1
        if n_pages == 1:
            if not (htype & 0x02):
                raise ValueError("first Ogg page is not BOS")
            if not packets:
                raise ValueError("Ogg BOS page carries no packet")
            first_packet = packets[0]
        if granule not in (0, -1):
            last_granule = granule
        if htype & 0x04:
            saw_eos = True
    if first_packet is None:
        raise ValueError("empty Ogg stream")
    if not saw_eos:
        raise ValueError("Ogg stream missing EOS page")
    if first_packet[:8] == b"OpusHead":
        if len(first_packet) < 19 or first_packet[8] not in (1,):
            raise ValueError("malformed OpusHead")
        channels = first_packet[9]
        pre_skip = struct.unpack_from("<H", first_packet, 10)[0]
        rate = struct.unpack_from("<I", first_packet, 12)[0]
        return {
            "container": "ogg",
            "codec": "opus",
            "sample_rate": rate,  # informational input rate (RFC 7845)
            "channels": channels,
            "n_samples": max(0, last_granule - pre_skip),  # 48 kHz units
        }
    if first_packet[:7] == b"\x01vorbis":
        if len(first_packet) < 30:
            raise ValueError("malformed Vorbis identification header")
        if struct.unpack_from("<I", first_packet, 7)[0] != 0:
            raise ValueError("unknown Vorbis version")
        channels = first_packet[11]
        rate = struct.unpack_from("<I", first_packet, 12)[0]
        if channels < 1 or rate < 1 or not first_packet[29] & 1:
            raise ValueError("malformed Vorbis identification header")
        return {
            "container": "ogg",
            "codec": "vorbis",
            "sample_rate": rate,
            "channels": channels,
            "n_samples": last_granule,
        }
    raise ValueError("unrecognized Ogg codec identification header")
