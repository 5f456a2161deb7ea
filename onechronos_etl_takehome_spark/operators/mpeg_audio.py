"""MPEG audio STREAM METADATA (MP3 + ADTS AAC) in pure stdlib — the
lossy-audio legs of the m17 cataloging pass.

Design mirrors the video side exactly (``operators/avc.py`` /
``video.video_stream_metadata``): for codecs whose SAMPLE decode
honestly needs a media library (MDCT + huffman + psychoacoustics),
the layer a 100-TB corpus job still needs on every payload is the
header walk — what codec, what sample rate, how many channels, how
long — so payloads can be routed, cataloged, and deduped at the
container level before any decode pool is chosen. That layer is
fully specified public bit layout:

- **MPEG-1/2 audio frames** (``parse_mp3_stream``): the 32-bit frame
  header (ISO/IEC 11172-3 §2.4.1.3 / 13818-3) — sync, version, layer,
  bitrate index, sampling index, padding, channel mode — walked frame
  by frame using the layer's exact frame-length formula, so the frame
  count (and thus duration) comes from structure, not guesswork. An
  ID3v2 prefix is skipped by its syncsafe size.
- **ADTS AAC frames** (``parse_adts_stream``): the 7/9-byte ADTS
  header (ISO/IEC 14496-3 §1.A.2.2) — profile, sampling frequency
  index, channel configuration, the 13-bit frame length walked to
  count frames, raw-block count per frame included.

Sample decode of these codecs raises ValueError (the honest-stub
contract); synthesis emits structurally REAL headers with opaque
payload bytes sized by the header's own length formula — the same
shape as ``mp4.mp4_avc_fixture``'s opaque mdat.
"""

from __future__ import annotations

# bitrate (kbps) tables, ISO/IEC 11172-3 Table B.2 and 13818-3:
# [version][layer] → 14 entries for indices 1..14 (0 = free, 15 = bad)
_BITRATES_V1 = {
    1: [32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    2: [32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    3: [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
}
_BITRATES_V2 = {
    1: [32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    2: [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    3: [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
# sample rates by version: index 0..2 (3 = reserved)
_RATES = {
    "1": [44100, 48000, 32000],
    "2": [22050, 24000, 16000],
    "2.5": [11025, 12000, 8000],
}
_ADTS_RATES = [
    96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
    16000, 12000, 11025, 8000,
]


def _samples_per_frame(version: str, layer: int) -> int:
    if layer == 1:
        return 384
    if layer == 2:
        return 1152
    return 1152 if version == "1" else 576  # layer 3


def _frame_bytes(
    version: str, layer: int, bitrate_kbps: int, rate: int, padding: int
) -> int:
    if layer == 1:
        return (12000 * bitrate_kbps // rate + padding) * 4
    coef = 144000 if (layer == 2 or version == "1") else 72000
    return coef * bitrate_kbps // rate + padding


def _id3v2_size(payload: bytes) -> int:
    """Bytes to skip for an ID3v2 prefix (syncsafe 28-bit size)."""
    if payload[:3] != b"ID3" or len(payload) < 10:
        return 0
    size = 0
    for b in payload[6:10]:
        if b & 0x80:
            return 0  # not syncsafe → not a valid ID3v2 header
        size = (size << 7) | b
    return 10 + size


def parse_mp3_stream(payload: bytes) -> dict:
    """Walk every MPEG audio frame header → stream metadata dict.
    Raises ValueError on anything that is not a consistent MPEG
    elementary stream (sync loss mid-stream, reserved fields,
    truncated final frame)."""
    pos = _id3v2_size(payload)
    first = None
    n_frames = 0
    while pos + 4 <= len(payload):
        b0, b1, b2, b3 = payload[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            raise ValueError("MPEG frame sync lost")
        version_bits = (b1 >> 3) & 0x03
        version = {0: "2.5", 2: "2", 3: "1"}.get(version_bits)
        if version is None:
            raise ValueError("reserved MPEG version")
        layer = {1: 3, 2: 2, 3: 1}.get((b1 >> 1) & 0x03)
        if layer is None:
            raise ValueError("reserved MPEG layer")
        br_idx = (b2 >> 4) & 0x0F
        if br_idx in (0, 15):
            raise ValueError("free-format/invalid bitrate index")
        table = _BITRATES_V1 if version == "1" else _BITRATES_V2
        bitrate = table[layer][br_idx - 1]
        rate_idx = (b2 >> 2) & 0x03
        if rate_idx == 3:
            raise ValueError("reserved sampling rate index")
        rate = _RATES[version][rate_idx]
        padding = (b2 >> 1) & 1
        mode = (b3 >> 6) & 0x03
        channels = 1 if mode == 3 else 2
        meta = (version, layer, rate, channels)
        if first is None:
            first = meta
        elif meta != first:
            raise ValueError("MPEG stream parameters change mid-stream")
        size = _frame_bytes(version, layer, bitrate, rate, padding)
        if size < 4 or pos + size > len(payload):
            raise ValueError("MPEG frame overruns payload")
        pos += size
        n_frames += 1
    if first is None or pos != len(payload):
        raise ValueError("no complete MPEG audio frame")
    version, layer, rate, channels = first
    return {
        "container": "mp3",
        "codec": f"mpeg{version}-layer{layer}",
        "sample_rate": rate,
        "channels": channels,
        "n_frames": n_frames,
        "n_samples": n_frames * _samples_per_frame(version, layer),
    }


def synthesize_mp3(
    n_frames: int,
    sample_rate: int,
    *,
    channels: int = 2,
    bitrate_kbps: int = 128,
    layer: int = 3,
) -> bytes:
    """Structurally real MPEG audio stream: valid frame headers, the
    layer's exact frame-length arithmetic, opaque (deterministic)
    payload bytes — the metadata layer is real, sample decode is not
    claimed."""
    version = {
        44100: "1", 48000: "1", 32000: "1",
        22050: "2", 24000: "2", 16000: "2",
        11025: "2.5", 12000: "2.5", 8000: "2.5",
    }.get(sample_rate)
    if version is None:
        raise ValueError(f"no MPEG version carries {sample_rate} Hz")
    table = _BITRATES_V1 if version == "1" else _BITRATES_V2
    if bitrate_kbps not in table[layer]:
        raise ValueError(f"bitrate {bitrate_kbps} invalid for the layer")
    br_idx = table[layer].index(bitrate_kbps) + 1
    version_bits = {"1": 3, "2": 2, "2.5": 0}[version]
    layer_bits = {3: 1, 2: 2, 1: 3}[layer]
    rate_idx = _RATES[version].index(sample_rate)
    mode = 3 if channels == 1 else 0
    out = bytearray()
    for i in range(n_frames):
        size = _frame_bytes(version, layer, bitrate_kbps, sample_rate, 0)
        hdr = bytes(
            [
                0xFF,
                0xE0 | (version_bits << 3) | (layer_bits << 1) | 1,
                (br_idx << 4) | (rate_idx << 2) | (0 << 1),
                (mode << 6),
            ]
        )
        body = bytes((7 * (i + k)) & 0xFF for k in range(size - 4))
        out += hdr + body
    return bytes(out)


def parse_adts_stream(payload: bytes) -> dict:
    """Walk every ADTS frame header → stream metadata dict. Raises
    ValueError on sync loss, reserved indices, or truncation."""
    pos = 0
    first = None
    n_frames = 0
    n_blocks = 0
    while pos + 7 <= len(payload):
        b = payload[pos : pos + 9]
        if b[0] != 0xFF or (b[1] & 0xF6) != 0xF0:
            raise ValueError("ADTS frame sync lost")
        protection_absent = b[1] & 1
        profile = (b[2] >> 6) & 0x03
        rate_idx = (b[2] >> 2) & 0x0F
        if rate_idx >= len(_ADTS_RATES):
            raise ValueError("reserved ADTS sampling index")
        channels = ((b[2] & 1) << 2) | ((b[3] >> 6) & 0x03)
        if channels == 0:
            raise ValueError("PCE-signalled channel config unsupported")
        length = ((b[3] & 0x03) << 11) | (b[4] << 3) | ((b[5] >> 5) & 0x07)
        header_len = 7 if protection_absent else 9
        if length < header_len or pos + length > len(payload):
            raise ValueError("ADTS frame overruns payload")
        blocks = (b[6] & 0x03) + 1
        meta = (profile, _ADTS_RATES[rate_idx], channels)
        if first is None:
            first = meta
        elif meta != first:
            raise ValueError("ADTS stream parameters change mid-stream")
        pos += length
        n_frames += 1
        n_blocks += blocks
    if first is None or pos != len(payload):
        raise ValueError("no complete ADTS frame")
    profile, rate, channels = first
    return {
        "container": "adts",
        "codec": ("aac-main", "aac-lc", "aac-ssr", "aac-ltp")[profile],
        "sample_rate": rate,
        "channels": channels,
        "n_frames": n_frames,
        "n_samples": n_blocks * 1024,
    }


def synthesize_adts(
    n_frames: int,
    sample_rate: int,
    *,
    channels: int = 2,
    profile: int = 1,
    payload_bytes: int = 200,
) -> bytes:
    """Structurally real ADTS stream: valid 7-byte headers whose
    13-bit length fields walk exactly, opaque raw-data blocks."""
    if sample_rate not in _ADTS_RATES:
        raise ValueError(f"{sample_rate} Hz has no ADTS sampling index")
    rate_idx = _ADTS_RATES.index(sample_rate)
    out = bytearray()
    for i in range(n_frames):
        length = 7 + payload_bytes
        hdr = bytearray(7)
        hdr[0] = 0xFF
        hdr[1] = 0xF1  # MPEG-4, layer 00, no CRC
        hdr[2] = (profile << 6) | (rate_idx << 2) | ((channels >> 2) & 1)
        hdr[3] = ((channels & 0x03) << 6) | ((length >> 11) & 0x03)
        hdr[4] = (length >> 3) & 0xFF
        hdr[5] = ((length & 0x07) << 5) | 0x1F  # buffer fullness hi
        hdr[6] = 0xFC  # buffer fullness lo + 1 raw block
        body = bytes((11 * (i + k)) & 0xFF for k in range(payload_bytes))
        out += bytes(hdr) + body
    return bytes(out)


def sniff_mpeg_audio(payload: bytes) -> str | None:
    """'mp3' / 'adts' when the payload leads with a coherent MPEG
    audio / ADTS sync (ID3v2 prefixes honored), else None. ADTS is
    the layer-00 case of the same sync word, so it is checked first."""
    pos = _id3v2_size(payload)
    head = payload[pos : pos + 2]
    if len(head) < 2 or head[0] != 0xFF:
        return None
    if (head[1] & 0xF6) == 0xF0:
        return "adts"
    if (head[1] & 0xE0) == 0xE0 and (head[1] >> 1) & 0x03 != 0:
        return "mp3"
    return None
