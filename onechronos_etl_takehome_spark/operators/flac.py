"""FLAC codec in pure stdlib + numpy — real COMPRESSED audio ingest.

The audio member of the "real codec" matrix (image: baseline +
progressive JPEG / PNG / BMP in ``operators/jpeg.py`` +
``multimodal.py``; video: MJPEG AVI/MP4 + AVC I_PCM in
``operators/mp4.py`` / ``avc.py``). Until this module, the audio leg
ingested only uncompressed RIFF/WAVE — but a real 100-TB audio corpus
is overwhelmingly COMPRESSED uploads, and FLAC is the lossless format
training pipelines archive in. Because FLAC is lossless, a decoded
FLAC clip fingerprints IDENTICALLY to its WAV original, so the
spectral-landmark family (``operators/audio.py``) gains compressed
ingest with zero tolerance machinery.

Format per the public FLAC specification (RFC 9639 / the original
flac.sourceforge format document). What is implemented, honestly:

- **Decoder** (``flac_samples`` / ``flac_decode``): the full subset
  real encoders emit for 4-32 bit PCM up to 2 channels independent +
  the three stereo decorrelation modes (left/side, right/side,
  mid/side), all subframe types (CONSTANT, VERBATIM, FIXED orders
  0-4, LPC orders 1-32), wasted bits, both residual coding methods
  (4-bit and 5-bit Rice parameters) including escaped raw partitions,
  uncommon block-size/sample-rate headers, and UTF-8-style coded
  frame/sample numbers. Integrity is enforced, not assumed: frame
  header CRC-8 (poly 0x07), whole-frame CRC-16 (poly 0x8005), and the
  STREAMINFO MD5 of the decoded PCM must all verify — a corrupt
  payload raises ValueError (the fall-to-stub contract every decoder
  in this package honors). >2-channel streams raise (the corpus legs
  here are mono/stereo; the syntax layer is channel-count-generic but
  untested beyond 2, so it refuses rather than guesses).
- **Encoder** (``flac_from_samples`` / ``flac_encode``): a real
  subset encoder — per-block stereo-mode decision (independent vs
  L/S vs R/S vs M/S by estimated bits), per-channel subframe search
  over CONSTANT / FIXED 0-4 / LPC (windowed autocorrelation +
  Levinson-Durbin, quantized-coefficient integer prediction) /
  VERBATIM, Rice parameter + partition-order search, and wasted-bits
  extraction. Output is a spec-conformant stream any FLAC decoder
  plays.

Self-reference honesty (the m14 lesson): a codec validated only by
its own round-trip can hide a mirrored bug. Three anchors break the
loop here: (1) CRC-8/CRC-16/MD5 are INDEPENDENT public algorithms —
the decoder recomputes them over its own parse, so a layout bug
desynchronizes the checksums rather than round-tripping; (2)
``tests/test_flac.py`` decodes an INDEPENDENTLY hand-assembled
stream written bit-by-bit from the published spec tables, bytes this
encoder never produced; (3) losslessness is pinned end-to-end
against the WAV path: decode(flac(x)) must equal decode(wav(x))
EXACTLY, not approximately.

Scale posture: codec work rides the same Arrow-batched
``mapInPandas`` decode stage as every other media family
(``audio.audio_fingerprints``) — per-payload numpy, no per-sample
Python in the Spark plan, malformed payloads skipped not fatal.
"""

from __future__ import annotations

import hashlib
import struct

# ---------------------------------------------------------------------------
# CRCs (public polynomials per the FLAC spec): CRC-8 poly 0x07 over
# the frame header, CRC-16 poly 0x8005 over the whole frame. Both
# MSB-first, init 0, no reflection, no final xor.
# ---------------------------------------------------------------------------


def _crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = []
    for byte in range(256):
        crc = byte << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) if crc & top else (crc << 1)
        table.append(crc & mask)
    return table


_CRC8_TABLE = _crc_table(0x07, 8)
_CRC16_TABLE = _crc_table(0x8005, 16)


def crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC8_TABLE[crc ^ b]
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ _CRC16_TABLE[(crc >> 8) ^ b]
    return crc


# ---------------------------------------------------------------------------
# Bit I/O (MSB-first, as all FLAC fields are).
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def u(self, val: int, bits: int) -> None:
        if bits == 0:
            return
        self.acc = (self.acc << bits) | (val & ((1 << bits) - 1))
        self.n += bits
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def s(self, val: int, bits: int) -> None:
        self.u(val & ((1 << bits) - 1), bits)

    def unary(self, q: int) -> None:
        """FLAC unary: q zero bits then a terminating one bit."""
        while q >= 32:
            self.u(0, 32)
            q -= 32
        self.u(1, q + 1)

    def align(self) -> None:
        if self.n:
            self.u(0, 8 - self.n)

    def bytes(self) -> bytes:
        assert self.n == 0, "unaligned frame"
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos  # bit position

    def u(self, bits: int) -> int:
        end = self.pos + bits
        if end > len(self.data) * 8:
            raise ValueError("FLAC stream truncated mid-field")
        out = 0
        pos = self.pos
        # byte-at-a-time gather (fields are <= 64 bits)
        while bits > 0:
            byte = self.data[pos >> 3]
            avail = 8 - (pos & 7)
            take = avail if avail < bits else bits
            shift = avail - take
            out = (out << take) | ((byte >> shift) & ((1 << take) - 1))
            pos += take
            bits -= take
        self.pos = pos
        return out

    def s(self, bits: int) -> int:
        v = self.u(bits)
        return v - (1 << bits) if v & (1 << (bits - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.u(1) == 0:
            q += 1
            if q > 1 << 20:
                raise ValueError("runaway unary code")
        return q

    def align(self) -> None:
        if self.pos & 7:
            if self.u(8 - (self.pos & 7)) != 0:
                raise ValueError("nonzero frame padding bits")


def _utf8_number(r: _BitReader, max_bytes: int = 7) -> int:
    """Decode the UTF-8-style coded frame/sample number."""
    first = r.u(8)
    if first < 0x80:
        return first
    n = 0
    probe = first
    while probe & 0x40:
        n += 1
        probe <<= 1
    if n < 1 or n > max_bytes - 1:
        raise ValueError("malformed coded number")
    val = first & (0x3F >> n) if n < 6 else 0
    for _ in range(n):
        cont = r.u(8)
        if cont & 0xC0 != 0x80:
            raise ValueError("malformed coded-number continuation")
        val = (val << 6) | (cont & 0x3F)
    return val


def _write_utf8_number(w: _BitWriter, val: int) -> None:
    if val < 0x80:
        w.u(val, 8)
        return
    for n in range(1, 7):
        if val < (1 << (6 - n + 6 * n)) or n == 6:
            break
    # n continuation bytes; lead byte carries (6 - n) payload bits
    # (n == 6 → 0xFE lead with no payload bits, the 36-bit form)
    lead_payload = 6 - n if n < 6 else 0
    lead_mark = (0xFF << (lead_payload + 1)) & 0xFF
    w.u(lead_mark | (val >> (6 * n)) if lead_payload else 0xFE, 8)
    for k in range(n - 1, -1, -1):
        w.u(0x80 | ((val >> (6 * k)) & 0x3F), 8)


# ---------------------------------------------------------------------------
# Frame-header code tables (spec section 9.1).
# ---------------------------------------------------------------------------

_BLOCKSIZE_CODES = {
    192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5,
    256: 8, 512: 9, 1024: 10, 2048: 11, 4096: 12,
    8192: 13, 16384: 14, 32768: 15,
}
_SAMPLE_RATE_CODES = {
    88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5, 22050: 6,
    24000: 7, 32000: 8, 44100: 9, 48000: 10, 96000: 11,
}
_SAMPLE_RATE_BY_CODE = {v: k for k, v in _SAMPLE_RATE_CODES.items()}
_BITS_CODES = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}
_BITS_BY_CODE = {v: k for k, v in _BITS_CODES.items()}

# ---------------------------------------------------------------------------
# Rice residual coding.
# ---------------------------------------------------------------------------


def _zigzag(res):
    import numpy as np

    r = res.astype(np.int64)
    return np.where(r >= 0, r << 1, (-r << 1) - 1)


def _best_rice_param(u) -> tuple[int, int]:
    """(param, exact bit cost) minimizing unary+remainder bits for
    one partition of zigzag values."""
    import numpy as np

    n = len(u)
    best_k, best_bits = 0, int(u.sum()) + n
    for k in range(1, 31):
        bits = int((u >> k).sum()) + n * (k + 1)
        if bits < best_bits:
            best_k, best_bits = k, bits
        elif bits > best_bits + 8 * n:
            break  # cost is convex in k past the optimum
    return best_k, best_bits


def _plan_residual(res, order: int, block_size: int):
    """Choose (method, partition_order, params, bit cost) for one
    subframe's residual. Partition 0 holds (block//2^po - order)
    samples, the rest block//2^po each — the spec's layout."""
    u = _zigzag(res)
    best = None
    for po in range(0, 5):
        parts = 1 << po
        if block_size % parts or (block_size >> po) <= order:
            break
        plen = block_size >> po
        bounds = [0] + [plen * (i + 1) - order for i in range(parts)]
        params, total = [], 0
        for i in range(parts):
            seg = u[bounds[i]: bounds[i + 1]]
            k, bits = _best_rice_param(seg)
            params.append(k)
            total += bits
        method = 0 if max(params) <= 14 else 1
        pbits = 4 if method == 0 else 5
        cost = 2 + 4 + parts * pbits + total
        if best is None or cost < best[3]:
            best = (method, po, params, cost)
    assert best is not None, "no legal rice partition order"
    return best


def _write_residual(w: _BitWriter, res, plan, order: int, block: int) -> None:
    method, po, params, _ = plan
    w.u(method, 2)
    w.u(po, 4)
    u = _zigzag(res)
    parts = 1 << po
    plen = block >> po
    bounds = [0] + [plen * (i + 1) - order for i in range(parts)]
    pbits = 4 if method == 0 else 5
    for i in range(parts):
        k = params[i]
        w.u(k, pbits)
        seg = u[bounds[i]: bounds[i + 1]]
        for v in seg.tolist():
            w.unary(v >> k)
            w.u(v & ((1 << k) - 1), k)


def _read_residual(r: _BitReader, n: int, order: int, block: int):
    import numpy as np

    method = r.u(2)
    if method > 1:
        raise ValueError(f"reserved residual coding method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = r.u(4)
    parts = 1 << po
    if block % parts or (block >> po) <= order:
        raise ValueError("invalid rice partition order")
    out = np.empty(n, dtype=np.int64)
    pos = 0
    for i in range(parts):
        plen = (block >> po) - (order if i == 0 else 0)
        k = r.u(pbits)
        if k == escape:
            raw = r.u(5)
            for j in range(plen):
                out[pos + j] = r.s(raw) if raw else 0
        else:
            for j in range(plen):
                q = r.unary()
                v = (q << k) | r.u(k)
                out[pos + j] = (v >> 1) ^ -(v & 1)
        pos += plen
    return out


# ---------------------------------------------------------------------------
# Subframe planning (encoder side).
# ---------------------------------------------------------------------------


def _quantize_lpc(coefs, precision: int = 12):
    """Float LPC coefficients → (int coefs, shift) with the standard
    max-coefficient-driven shift; None when unrepresentable."""
    import numpy as np

    cmax = float(np.max(np.abs(coefs)))
    if not np.isfinite(cmax) or cmax <= 0:
        return None
    import math

    log2cmax = math.frexp(cmax)[1]  # ceil(log2(cmax)) + (0 or 1)
    shift = precision - 1 - log2cmax
    if shift > 15:
        shift = 15
    if shift < 0:
        return None
    lim = 1 << (precision - 1)
    err = 0.0
    q = []
    for c in coefs:
        v = c * (1 << shift) + err
        qi = int(round(v))
        qi = max(-lim, min(lim - 1, qi))
        err = v - qi
        q.append(qi)
    return q, shift


def _lpc_analyze(s, max_order: int):
    """Windowed autocorrelation + Levinson-Durbin → float coefficient
    lists for orders 1..max_order (list index o-1). Coefficient a[j]
    multiplies s[i-1-j] in the predictor."""
    import numpy as np

    x = s.astype(np.float64) * np.hanning(len(s))
    autoc = [
        float(np.dot(x[: len(x) - lag], x[lag:]))
        for lag in range(max_order + 1)
    ]
    if autoc[0] <= 0:
        return []
    err = autoc[0]
    a: list[float] = []
    out = []
    for m in range(max_order):
        acc = autoc[m + 1] - sum(a[j] * autoc[m - j] for j in range(m))
        k = acc / err
        a = [a[j] - k * a[m - 1 - j] for j in range(m)] + [k]
        err *= 1 - k * k
        out.append(list(a))
        if err <= 0:
            break
    return out


def _lpc_residual(s, q, shift: int):
    import numpy as np

    order = len(q)
    n = len(s)
    acc = np.zeros(n - order, dtype=np.int64)
    for j, c in enumerate(q):
        acc += c * s[order - 1 - j: n - 1 - j]
    return s[order:] - (acc >> shift)


def _plan_subframe(s, bps: int, *, use_lpc: bool = True, max_lpc_order: int = 8):
    """Search CONSTANT / FIXED / LPC / VERBATIM for one channel's
    block → (bit cost, plan dict). ``s`` is int64."""
    import numpy as np

    n = len(s)
    if n and bool((s == s[0]).all()):
        return 2 + 6 + bps, {"type": "constant", "value": int(s[0]), "bps": bps}
    # wasted bits: trailing zero bits shared by every sample
    wasted = 0
    orv = int(np.bitwise_or.reduce(s)) if n else 0
    if orv:
        wasted = (orv & -orv).bit_length() - 1
    head = 2 + 6  # subframe header incl. wasted flag
    head += wasted + 1 if wasted else 0
    eff = bps - wasted
    se = s >> wasted
    best_bits = head + n * eff
    best = {"type": "verbatim", "samples": se, "bps": bps, "wasted": wasted}
    # fixed orders: successive differences
    res = se.copy()
    for order in range(0, 5):
        if order > 0:
            if n <= order:
                break
            res = np.diff(res)
        plan_r = _plan_residual(res, order, n)
        bits = head + order * eff + plan_r[3]
        if bits < best_bits:
            best_bits = bits
            best = {
                "type": "fixed", "order": order,
                "warmup": se[:order], "res": res.copy(),
                "rice": plan_r, "bps": bps, "wasted": wasted,
            }
    if use_lpc and n > 2 * max_lpc_order + 1:
        # probe an order LADDER, not every order: Levinson yields all
        # orders in one pass, but each candidate costs a quantize +
        # integer-residual + rice-partition search; {2,4,8} captures
        # nearly all of the compression at a third of the planning cost
        ladder = _lpc_analyze(se, max_lpc_order)
        for coefs in (
            ladder[o - 1] for o in (2, 4, 8) if o <= len(ladder)
        ):
            qz = _quantize_lpc(coefs)
            if qz is None:
                continue
            q, shift = qz
            order = len(q)
            lres = _lpc_residual(se, q, shift)
            plan_r = _plan_residual(lres, order, n)
            bits = head + order * eff + 4 + 5 + order * 12 + plan_r[3]
            if bits < best_bits:
                best_bits = bits
                best = {
                    "type": "lpc", "order": order, "coefs": q,
                    "shift": shift, "warmup": se[:order], "res": lres,
                    "rice": plan_r, "bps": bps, "wasted": wasted,
                }
    return best_bits, best


def _write_subframe(w: _BitWriter, plan: dict, block: int) -> None:
    t = plan["type"]
    wasted = plan.get("wasted", 0)
    bps = plan["bps"]
    eff = bps - wasted
    w.u(0, 1)  # zero padding bit
    if t == "constant":
        w.u(0, 6)
        w.u(0, 1)
        w.s(plan["value"], bps)
        return
    if t == "verbatim":
        type_code = 1
    elif t == "fixed":
        type_code = 8 + plan["order"]
    else:
        type_code = 32 + plan["order"] - 1
    w.u(type_code, 6)
    if wasted:
        w.u(1, 1)
        w.unary(wasted - 1)
    else:
        w.u(0, 1)
    if t == "verbatim":
        for v in plan["samples"].tolist():
            w.s(v, eff)
        return
    for v in plan["warmup"].tolist():
        w.s(v, eff)
    if t == "lpc":
        w.u(12 - 1, 4)  # coefficient precision - 1
        w.s(plan["shift"], 5)
        for c in plan["coefs"]:
            w.s(c, 12)
    _write_residual(w, plan["res"], plan["rice"], plan["order"], block)


# ---------------------------------------------------------------------------
# Encoder.
# ---------------------------------------------------------------------------


def _pcm_md5(samples, bits: int) -> str:
    """STREAMINFO MD5: interleaved samples, little-endian signed,
    bits/8 bytes each (byte-aligned depths only)."""
    import numpy as np

    md5 = hashlib.md5()
    width = bits // 8
    if width == 1:
        md5.update(samples.astype("<i1").tobytes())
    elif width == 2:
        md5.update(samples.astype("<i2").tobytes())
    else:  # 24-bit: 3 little-endian bytes per sample
        b4 = samples.astype("<i4").tobytes()
        arr = np.frombuffer(b4, dtype=np.uint8).reshape(-1, 4)
        md5.update(arr[:, :3].tobytes())
    return md5.hexdigest()


def flac_encode(
    samples,
    sample_rate: int,
    *,
    channels: int = 1,
    bits: int = 16,
    block_size: int = 4096,
    use_lpc: bool = True,
) -> bytes:
    """Encode channel-interleaved INT samples (numpy int array,
    values in [-2^(bits-1), 2^(bits-1)-1]) as a complete FLAC stream
    (fLaC magic + STREAMINFO + frames, fixed blocking strategy)."""
    import numpy as np

    if channels < 1 or channels > 2:
        raise ValueError("flac_encode supports mono/stereo")
    if bits not in (8, 16, 24):
        raise ValueError(f"unsupported bits-per-sample {bits}")
    if block_size < 16 or block_size > 32768:
        raise ValueError("block size out of the spec's 16..32768 range")
    s = np.asarray(samples, dtype=np.int64)
    if len(s) == 0 or len(s) % channels:
        raise ValueError("need a nonempty interleaved sample array")
    lim = 1 << (bits - 1)
    if int(s.max()) >= lim or int(s.min()) < -lim:
        raise ValueError(f"samples exceed the {bits}-bit range")
    n_frames_total = len(s) // channels
    chans = [s[c::channels] for c in range(channels)]

    frames = bytearray()
    n_blocks = -(-n_frames_total // block_size)
    min_fr, max_fr = None, 0
    for bi in range(n_blocks):
        lo = bi * block_size
        hi = min(lo + block_size, n_frames_total)
        block = [c[lo:hi] for c in chans]
        fb = _encode_frame(block, bi, sample_rate, bits, use_lpc=use_lpc)
        frames += fb
        min_fr = len(fb) if min_fr is None else min(min_fr, len(fb))
        max_fr = max(max_fr, len(fb))

    info = _BitWriter()
    info.u(block_size, 16)  # fixed blocking strategy: min == max
    info.u(block_size, 16)
    info.u(min_fr or 0, 24)
    info.u(max_fr, 24)
    info.u(sample_rate, 20)
    info.u(channels - 1, 3)
    info.u(bits - 1, 5)
    info.u(n_frames_total, 36)
    streaminfo = info.bytes() + bytes.fromhex(_pcm_md5(s, bits))
    header = b"fLaC" + bytes([0x80]) + struct.pack(">I", 34)[1:] + streaminfo
    return header + bytes(frames)


def _encode_frame(
    block, frame_no: int, sample_rate: int, bits: int, *, use_lpc: bool
) -> bytes:
    import numpy as np

    n = len(block[0])
    channels = len(block)
    # stereo decorrelation decision by planned bits
    if channels == 2:
        left, right = block
        side = left - right
        mid = (left + right) >> 1
        pl = _plan_subframe(left, bits, use_lpc=use_lpc)
        pr = _plan_subframe(right, bits, use_lpc=use_lpc)
        ps = _plan_subframe(side, bits + 1, use_lpc=use_lpc)
        pm = _plan_subframe(mid, bits, use_lpc=use_lpc)
        options = [
            (pl[0] + pr[0], 1, [pl[1], pr[1]]),       # independent
            (pl[0] + ps[0], 8, [pl[1], ps[1]]),       # left/side
            (ps[0] + pr[0], 9, [ps[1], pr[1]]),       # right/side
            (pm[0] + ps[0], 10, [pm[1], ps[1]]),      # mid/side
        ]
        _, chan_code, plans = min(options, key=lambda o: o[0])
    else:
        chan_code = 0
        plans = [_plan_subframe(block[0], bits, use_lpc=use_lpc)[1]]

    w = _BitWriter()
    w.u(0b11111111111110, 14)  # sync
    w.u(0, 1)  # reserved
    w.u(0, 1)  # blocking strategy: fixed
    bs_code = _BLOCKSIZE_CODES.get(n)
    if bs_code is None:
        bs_code = 6 if n <= 256 else 7
    w.u(bs_code, 4)
    sr_code = _SAMPLE_RATE_CODES.get(sample_rate)
    if sr_code is None:
        sr_code = 0  # take it from STREAMINFO
    w.u(sr_code, 4)
    w.u(chan_code, 4)
    w.u(_BITS_CODES[bits], 3)
    w.u(0, 1)  # reserved
    _write_utf8_number(w, frame_no)
    if bs_code == 6:
        w.u(n - 1, 8)
    elif bs_code == 7:
        w.u(n - 1, 16)
    w.align()
    head = w.bytes()
    w.u(crc8(head), 8)
    for plan in plans:
        _write_subframe(w, plan, n)
    w.align()
    body = w.bytes()
    return body + struct.pack(">H", crc16(body))


def flac_from_samples(wave, sample_rate: int, *, channels: int = 1) -> bytes:
    """Serialize float samples in [-1, 1] (channel-interleaved when
    stereo) as a 16-bit FLAC stream — the drop-in compressed twin of
    ``multimodal.wav_from_samples``: the SAME quantizer, so
    decode(flac(x)) == decode(wav(x)) exactly."""
    import numpy as np

    pcm = np.clip(
        np.asarray(wave, dtype=np.float64) * 32767.0, -32768, 32767
    ).astype(np.int64)
    return flac_encode(pcm, sample_rate, channels=channels, bits=16)


# ---------------------------------------------------------------------------
# Decoder.
# ---------------------------------------------------------------------------


def flac_stream_info(payload: bytes) -> dict:
    """Parse the fLaC magic + STREAMINFO block only → stream metadata
    (the routing/cataloging fields, no sample decode)."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("FLAC metadata truncated")
        last = payload[pos] >> 7
        btype = payload[pos] & 0x7F
        ln = int.from_bytes(payload[pos + 1: pos + 4], "big")
        body = payload[pos + 4: pos + 4 + ln]
        if len(body) != ln:
            raise ValueError("FLAC metadata block overruns payload")
        if btype == 0:
            if ln != 34:
                raise ValueError(f"STREAMINFO must be 34 bytes, got {ln}")
            info = body
        elif btype == 127:
            raise ValueError("invalid metadata block type 127")
        pos += 4 + ln
        if last:
            break
    if info is None:
        raise ValueError("FLAC stream missing STREAMINFO")
    r = _BitReader(info)
    out = {
        "container": "flac",
        "min_block_size": r.u(16),
        "max_block_size": r.u(16),
        "min_frame_size": r.u(24),
        "max_frame_size": r.u(24),
        "sample_rate": r.u(20),
        "channels": r.u(3) + 1,
        "bits": r.u(5) + 1,
        "n_samples": r.u(36),
        "md5": info[18:34].hex(),
        "first_frame": pos,
    }
    if out["sample_rate"] == 0:
        raise ValueError("STREAMINFO sample rate 0")
    return out


def _decode_subframe(r: _BitReader, n: int, bps: int):
    import numpy as np

    if r.u(1) != 0:
        raise ValueError("subframe padding bit set")
    t = r.u(6)
    wasted = 0
    if r.u(1):
        wasted = r.unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise ValueError("wasted bits exceed sample size")
    if t == 0:  # CONSTANT
        out = np.full(n, r.s(eff), dtype=np.int64)
    elif t == 1:  # VERBATIM
        out = np.fromiter(
            (r.s(eff) for _ in range(n)), dtype=np.int64, count=n
        )
    elif 8 <= t <= 12:  # FIXED
        order = t - 8
        if order > n:
            raise ValueError("fixed order exceeds block size")
        warm = np.asarray(
            [r.s(eff) for _ in range(order)], dtype=np.int64
        )
        res = _read_residual(r, n - order, order, n)
        if order == 0:
            out = res
        else:
            # residual = order-th difference. Reconstruct by repeated
            # prefix-sum, seeding each integration level with the
            # warmups' difference-triangle diagonal: seeds[j] = Δ^j
            # warm evaluated at its first index.
            seeds = []
            cur = warm
            for _ in range(order):
                seeds.append(cur[:1])
                cur = np.diff(cur)
            out = res
            for j in range(order - 1, -1, -1):
                out = np.cumsum(np.concatenate([seeds[j], out]))
    elif 32 <= t <= 63:  # LPC
        order = t - 32 + 1
        if order > n:
            raise ValueError("LPC order exceeds block size")
        warm = [r.s(eff) for _ in range(order)]
        precision = r.u(4) + 1
        if precision == 16:
            raise ValueError("invalid LPC coefficient precision")
        shift = r.s(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coefs = [r.s(precision) for _ in range(order)]
        res = _read_residual(r, n - order, order, n)
        out = np.concatenate([np.asarray(warm, dtype=np.int64), res])
        o = out.tolist()  # plain-int loop: the only sequential part
        for i in range(order, n):
            acc = 0
            for j in range(order):
                acc += coefs[j] * o[i - 1 - j]
            o[i] += acc >> shift
        out = np.asarray(o, dtype=np.int64)
    else:
        raise ValueError(f"reserved subframe type {t}")
    return out << wasted


def flac_decode(payload: bytes):
    """Full decode → (n_channels, sample_rate, bits, int64 interleaved
    samples). Verifies every frame CRC-8/CRC-16 and the STREAMINFO
    MD5; raises ValueError on any mismatch or malformed field."""
    import numpy as np

    si = flac_stream_info(payload)
    pos = si["first_frame"]
    channels = si["channels"]
    if channels > 2:
        raise ValueError("FLAC decode supports mono/stereo payloads")
    blocks = []
    total = 0
    want = si["n_samples"]  # 0 means unknown
    while pos < len(payload) and (want == 0 or total < want):
        r = _BitReader(payload, pos * 8)
        if r.u(14) != 0b11111111111110:
            raise ValueError("lost frame sync")
        if r.u(1) != 0:
            raise ValueError("frame reserved bit set")
        r.u(1)  # blocking strategy (coded number read covers both)
        bs_code = r.u(4)
        sr_code = r.u(4)
        chan_code = r.u(4)
        bits_code = r.u(3)
        if r.u(1) != 0:
            raise ValueError("frame header reserved bit set")
        if sr_code == 15:
            raise ValueError("invalid sample rate code 15")
        _utf8_number(r)
        # uncommon block size, then uncommon sample rate — the spec's
        # field order after the coded frame/sample number
        if bs_code == 0:
            raise ValueError("reserved block size code 0")
        elif bs_code == 1:
            n = 192
        elif bs_code <= 5:
            n = 576 << (bs_code - 2)
        elif bs_code == 6:
            n = r.u(8) + 1
        elif bs_code == 7:
            n = r.u(16) + 1
        else:
            n = 256 << (bs_code - 8)
        if sr_code in _SAMPLE_RATE_BY_CODE:
            if _SAMPLE_RATE_BY_CODE[sr_code] != si["sample_rate"]:
                raise ValueError("frame sample rate contradicts STREAMINFO")
        elif sr_code == 12:
            r.u(8)
        elif sr_code in (13, 14):
            r.u(16)
        bits = si["bits"] if bits_code == 0 else _BITS_BY_CODE.get(bits_code)
        if bits is None:
            raise ValueError(f"reserved sample size code {bits_code}")
        if bits != si["bits"]:
            raise ValueError("frame sample size contradicts STREAMINFO")
        r.align()
        head_end = r.pos >> 3
        if crc8(payload[pos:head_end]) != r.u(8):
            raise ValueError("frame header CRC-8 mismatch")
        if chan_code < 8:
            n_ch = chan_code + 1
            if n_ch != channels:
                raise ValueError("frame channel count contradicts STREAMINFO")
            chans = [
                _decode_subframe(r, n, bits) for _ in range(n_ch)
            ]
        elif chan_code in (8, 9, 10):
            if channels != 2:
                raise ValueError("stereo decorrelation in non-stereo stream")
            bps0 = bits + (1 if chan_code == 9 else 0)
            bps1 = bits + (1 if chan_code in (8, 10) else 0)
            c0 = _decode_subframe(r, n, bps0)
            c1 = _decode_subframe(r, n, bps1)
            if chan_code == 8:  # left/side
                chans = [c0, c0 - c1]
            elif chan_code == 9:  # side/right
                chans = [c1 + c0, c1]
            else:  # mid/side
                mid2 = (c0 << 1) | (c1 & 1)
                chans = [(mid2 + c1) >> 1, (mid2 - c1) >> 1]
        else:
            raise ValueError(f"reserved channel assignment {chan_code}")
        r.align()
        body_end = r.pos >> 3
        if body_end + 2 > len(payload):
            raise ValueError("frame footer truncated")
        if crc16(payload[pos:body_end]) != struct.unpack_from(
            ">H", payload, body_end
        )[0]:
            raise ValueError("frame CRC-16 mismatch")
        pos = body_end + 2
        inter = np.empty(n * channels, dtype=np.int64)
        for c in range(channels):
            inter[c::channels] = chans[c]
        blocks.append(inter)
        total += n
    if want and total != want:
        raise ValueError("decoded sample count contradicts STREAMINFO")
    samples = (
        np.concatenate(blocks) if blocks else np.empty(0, dtype=np.int64)
    )
    if si["md5"] != "0" * 32 and si["bits"] % 8 == 0:
        if _pcm_md5(samples, si["bits"]) != si["md5"]:
            raise ValueError("decoded PCM contradicts the STREAMINFO MD5")
    return channels, si["sample_rate"], si["bits"], samples


def flac_samples(payload: bytes):
    """(n_channels, sample_rate, float64 interleaved in [-1, 1)) —
    the same contract as ``multimodal.wav_samples``, so the
    spectral-landmark pipeline is codec-transparent."""
    channels, rate, bits, samples = flac_decode(payload)
    return channels, rate, samples.astype("float64") / float(1 << (bits - 1))


def synthesize_flac(
    n_frames: int, sample_rate: int, freq_hz: float, seed: int
) -> bytes:
    """Deterministic valid 16-bit mono FLAC (sine + seeded noise) —
    the compressed twin of ``multimodal.synthesize_wav`` (same wave,
    same quantizer)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    t = np.arange(n_frames, dtype=np.float64) / sample_rate
    wave = 0.6 * np.sin(
        2 * np.pi * freq_hz * t
    ) + 0.05 * rng.standard_normal(n_frames)
    return flac_from_samples(wave, sample_rate)
