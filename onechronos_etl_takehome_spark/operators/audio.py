"""Audio fingerprinting: spectral-peak landmark constellation.

The audio member of the multimodal near-dup family (image → m08 dHash,
binary → m04/m06 chunk maps): the Shazam-style scheme — STFT, a few
dominant spectral peaks per frame, landmark hashes from (anchor-freq,
target-freq, frame-delta) pairs — gives fingerprints that survive
amplitude scaling, additive noise, and (hop-aligned) time shifts,
because every landmark is a RELATIVE fact about two nearby peaks.

Pipeline shape on Spark: decode + FFT + peak-pick runs in Arrow-batched
``mapInPandas`` (numpy rfft over a strided frame matrix — vectorized
per payload, no Python-per-sample work), emitting (id, lhash) rows;
matching is the same inverted-index + containment join every other
chunk-map operator uses (``multimodal.chunk_pair_join``), so the
100-TB posture notes (posting-cap lever for ubiquitous hashes, no
all-pairs scan) carry over unchanged.

Rows-only at the catalog (m09): SQL has no FFT. Pinned instead by
invariance properties (scale/noise/shift) and a brute-force match
check in tests/test_round5_ops.py.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

from .multimodal import chunk_pair_join, sniff_modality, wav_samples


def audio_samples(data: bytes) -> tuple[int, int, "object"]:
    """Codec-transparent decode → (n_channels, sample_rate, float64
    interleaved samples in [-1, 1)): RIFF/WAVE via ``wav_samples``,
    FLAC via the real ``operators/flac.py`` decoder (lossless, so a
    FLAC upload fingerprints identically to its WAV original).
    Anything else raises ValueError — the callers' skip contract."""
    kind = sniff_modality(data)
    if kind == "wav":
        return wav_samples(data)
    if kind == "flac":
        from .flac import flac_samples

        return flac_samples(data)
    raise ValueError(f"not a decodable audio payload ({kind})")


def spectral_landmarks(
    data: bytes,
    *,
    frame: int = 256,
    hop: int = 128,
    peaks_per_frame: int = 3,
    fanout: int = 3,
) -> list[int]:
    """Landmark hash list for one PCM payload.

    Frames the mono signal (hann window, ``hop`` stride), takes the
    ``peaks_per_frame`` strongest rfft bins per frame, then hashes
    every (anchor, target) peak pair within ``fanout`` following
    frames as ``f1 << 20 | f2 << 8 | dt`` — frequencies are bin
    indices (< 2^12 for frame ≤ 8192), dt < 2^8. Set semantics
    (sorted unique) so repeated motifs don't inflate containment.
    """
    import numpy as np

    n_channels, _, samples = audio_samples(data)
    n_frames_total = len(samples) // max(n_channels, 1)
    mono = (
        samples[: n_frames_total * n_channels]
        .reshape(n_frames_total, n_channels)
        .mean(axis=1)
    )
    if len(mono) < frame:
        return []
    n_frames = 1 + (len(mono) - frame) // hop
    idx = np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None]
    windowed = mono[idx] * np.hanning(frame)[None, :]
    mags = np.abs(np.fft.rfft(windowed, axis=1))
    mags[:, 0] = 0.0  # DC carries no melody
    # top-k bins per frame, descending magnitude
    k = min(peaks_per_frame, mags.shape[1])
    peak_bins = np.argsort(-mags, axis=1)[:, :k]
    hashes: set[int] = set()
    for t1 in range(n_frames):
        for f1 in peak_bins[t1]:
            for dt in range(1, fanout + 1):
                t2 = t1 + dt
                if t2 >= n_frames:
                    break
                for f2 in peak_bins[t2]:
                    hashes.add((int(f1) << 20) | (int(f2) << 8) | dt)
    return sorted(hashes)


def _tone_clip(seed: int, *, n: int = 8192, sr: int = 8000) -> "object":
    """Seeded 3-chirp melody clip. Chirps (linear frequency sweeps),
    not steady tones: a constant tone collapses to a handful of
    repeated landmarks under set semantics (two songs sharing one
    similar tone then overlap heavily — measured cross-song
    containment up to 0.68), while sweeps move the peak bin every few
    frames, giving each song a large distinctive constellation."""
    import numpy as np

    rng = np.random.RandomState(seed)
    t = np.arange(n, dtype=np.float64) / sr
    dur = n / sr
    wave = np.zeros(n, dtype=np.float64)
    for _ in range(3):
        f0, f1 = rng.uniform(200, 3200, 2)
        amp = rng.uniform(0.2, 0.5)
        # linear chirp f0 → f1 across the clip
        phase = 2 * np.pi * (f0 * t + (f1 - f0) / (2 * dur) * t * t)
        wave += amp * np.sin(phase + rng.uniform(0, 6.28))
    return wave


def _demo_audio_payloads(
    df: DataFrame, id_col: str, modulus: int, hop: int, mixed_codec: bool
) -> DataFrame:
    import numpy as np

    from pyspark.sql import functions as F

    from .multimodal import wav_from_samples

    from .util import spread

    # payload synthesis + downstream decode are pure-CPU per-id work:
    # spread the (scan-shaped) id frame so they use every core
    base = spread(
        df.select(F.col(id_col).cast("long").alias("id")).where(
            F.col(id_col) % modulus == 0
        )
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .flac import flac_from_samples

        for pdf in batches:
            content = []
            for i in pdf["id"]:
                i = int(i)
                grp = i // (2 * modulus)
                # seed = grp directly — a modulus would wrap bench's
                # 10× id-offset copies onto the same songs (cross-copy
                # twins that distort the scale probe); grp fits uint32
                wave = _tone_clip(grp)
                recapture = (i // modulus) % 2 == 1
                if recapture:
                    nrng = np.random.RandomState(20_000 + grp)
                    wave = 0.7 * wave + 0.01 * nrng.standard_normal(len(wave))
                    wave = np.concatenate([np.zeros(2 * hop), wave])
                if mixed_codec and recapture:
                    content.append(flac_from_samples(wave, 8000))
                else:
                    content.append(wav_from_samples(wave, 8000))
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "content": content,
                    "modality": ["audio"] * len(content),
                }
            )

    return base.mapInPandas(gen, schema="id long, content binary, modality string")


def demo_noisy_audio_payloads(
    df: DataFrame, id_col: str, *, modulus: int = 10, hop: int = 128
) -> DataFrame:
    """Near-dup audio fixture stream (the audio twin of
    ``multimodal.demo_noisy_image_payloads``): ``id % modulus == 0``
    rows each get a WAV; paired ids share a 'song', and the odd member
    is the same recording re-captured — attenuated 0.7×, additive
    noise, and a 2-hop silence lead-in (hop-aligned shift, which the
    frame-relative landmarks survive)."""
    return _demo_audio_payloads(df, id_col, modulus, hop, mixed_codec=False)


def demo_mixed_audio_payloads(
    df: DataFrame, id_col: str, *, modulus: int = 10, hop: int = 128
) -> DataFrame:
    """The m16 fixture stream: same paired-song scheme as
    ``demo_noisy_audio_payloads``, but every re-captured twin arrives
    as a FLAC upload (``operators/flac.py`` — the re-capture encoded
    losslessly, as a real corpus's archival uploads are) while the
    original stays WAV. A WAV-only ingest scores zero pairs on this
    corpus; matching the twins requires actually decoding FLAC."""
    return _demo_audio_payloads(df, id_col, modulus, hop, mixed_codec=True)


def audio_fingerprints(
    payloads: DataFrame,
    *,
    frame: int = 256,
    hop: int = 128,
    peaks_per_frame: int = 3,
    fanout: int = 3,
) -> DataFrame:
    """(id, chash) landmark rows per decodable WAV payload (non-audio
    payloads are dropped). Column is named ``chash`` so the frame
    plugs straight into ``multimodal.chunk_pair_join``."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for i, b in zip(pdf["id"], pdf["content"]):
                data = bytes(b)
                if sniff_modality(data) not in ("wav", "flac"):
                    continue
                try:
                    lms = spectral_landmarks(
                        data,
                        frame=frame,
                        hop=hop,
                        peaks_per_frame=peaks_per_frame,
                        fanout=fanout,
                    )
                except (ValueError, struct.error):
                    # same malformed-payload skip contract as video.py:
                    # one corrupt WAV is dropped, never a job crash
                    continue
                ids.extend([int(i)] * len(lms))
                hashes.extend(lms)
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="int64"),
                    "chash": pd.Series(hashes, dtype="int64"),
                }
            )

    return payloads.mapInPandas(compute, schema="id long, chash long")


def demo_audio_zoo_payloads(
    df: DataFrame, id_col: str, *, modulus: int = 10
) -> DataFrame:
    """The m17 metadata fixture stream: ``id % modulus == 0`` rows
    rotate four audio containers with id-derived parameters, so a
    relational oracle can recompute what the parser must extract
    (parse ∘ synthesize == id — the m14 witness shape). With
    ``j = id // modulus``:

    - codec leg: ``j % 6`` → 16-bit PCM WAV / FLAC / MP3 (MPEG
      layer-3 frames, version implied by the rate) / ADTS AAC-LC /
      Ogg-Opus / Ogg-Vorbis;
    - sample rate: 8000/16000/22050/44100 by ``(j // 6) % 4`` — a
      DISTINCT mixed-radix digit of j, so every codec × rate combo is
      live (the round-13 advice lesson: adjacent-bit selectors left
      m14's avc1/hvc1 legs unreachable);
    - channels: stereo when ``(id // 40) % 2 == 1`` except WAV (the
      WAV writer is mono);
    - length: with ``L = (j // 24) % 8`` — WAV/FLAC carry
      ``1024 + L * 128`` frames; MP3/ADTS/Opus carry ``2 + L`` coded
      frames (samples = frames × the codec's frame size; Opus frames
      are 960 48-kHz samples); Vorbis granules ``512 * (2 + L)``.
      The ladder has 8 steps; corpus size determines how many are
      exercised."""
    import numpy as np

    from pyspark.sql import functions as F

    from .util import spread

    base = spread(
        df.select(F.col(id_col).cast("long").alias("id")).where(
            F.col(id_col) % modulus == 0
        )
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .flac import flac_from_samples
        from .mpeg_audio import synthesize_adts, synthesize_mp3
        from .multimodal import wav_from_samples
        from .ogg import synthesize_ogg_opus, synthesize_ogg_vorbis

        rates = [8000, 16000, 22050, 44100]
        for pdf in batches:
            content = []
            for i in pdf["id"]:
                i = int(i)
                j = i // modulus
                kind = j % 6
                rate = rates[(j // 6) % 4]
                length = (j // 24) % 8
                stereo = (i // 40) % 2 == 1
                ch = 2 if stereo else 1
                if kind in (0, 1):
                    n = 1024 + length * 128
                    t = np.arange(n, dtype=np.float64) / rate
                    wave = 0.5 * np.sin(
                        2 * np.pi * (200.0 + 50.0 * (j % 16)) * t
                    )
                    if kind == 0:
                        content.append(wav_from_samples(wave, rate))
                    elif stereo:
                        inter = np.empty(2 * n, dtype=np.float64)
                        inter[0::2] = wave
                        inter[1::2] = 0.8 * wave
                        content.append(
                            flac_from_samples(inter, rate, channels=2)
                        )
                    else:
                        content.append(flac_from_samples(wave, rate))
                elif kind == 2:
                    content.append(
                        synthesize_mp3(
                            2 + length,
                            rate,
                            channels=ch,
                            bitrate_kbps=128 if rate == 44100 else 64,
                        )
                    )
                elif kind == 3:
                    content.append(
                        synthesize_adts(2 + length, rate, channels=ch)
                    )
                elif kind == 4:
                    content.append(
                        synthesize_ogg_opus(2 + length, rate, channels=ch)
                    )
                else:
                    content.append(
                        synthesize_ogg_vorbis(
                            512 * (2 + length), rate, channels=ch
                        )
                    )
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "content": content,
                    "modality": ["audio"] * len(content),
                }
            )

    return base.mapInPandas(gen, schema="id long, content binary, modality string")


def audio_stream_metadata(payloads: DataFrame) -> DataFrame:
    """(id, container, codec, sample_rate, channels, bits, n_samples)
    per payload WITHOUT sample decode — the audio leg of the
    m14-style cataloging/routing pass a 100-TB corpus runs before any
    decode pool is chosen. WAV walks the RIFF chunk list (fmt + data
    sizes only); FLAC parses the fLaC magic + STREAMINFO block
    (``operators/flac.py:flac_stream_info``) and never touches a
    frame; MP3 and ADTS AAC walk their frame headers by the length
    arithmetic of the specs (``operators/mpeg_audio.py``); Ogg walks
    CRC-verified pages to the OpusHead / Vorbis identification
    header and the EOS granule (``operators/ogg.py``). Sample decode
    of the lossy codecs is not claimed, exactly as m14 routes HEVC
    it cannot decode; ``bits`` is 0 for them (bit depth is not a
    stream property there). Undecodable payloads are dropped, not
    fatal."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .flac import flac_stream_info
        from .mpeg_audio import (
            parse_adts_stream,
            parse_mp3_stream,
            sniff_mpeg_audio,
        )

        for pdf in batches:
            rows = []
            for i, b in zip(pdf["id"], pdf["content"]):
                data = bytes(b)
                try:
                    kind = sniff_modality(data)
                    if kind == "flac":
                        si = flac_stream_info(data)
                        rows.append(
                            (
                                int(i), "flac", "flac", si["sample_rate"],
                                si["channels"], si["bits"], si["n_samples"],
                            )
                        )
                    elif kind == "wav":
                        rows.append((int(i), *_wav_header_info(data)))
                    elif kind == "ogg":
                        from .ogg import parse_ogg_stream

                        si = parse_ogg_stream(data)
                        rows.append(
                            (
                                int(i), si["container"], si["codec"],
                                si["sample_rate"], si["channels"], 0,
                                si["n_samples"],
                            )
                        )
                    elif kind == "opaque":
                        mpeg = sniff_mpeg_audio(data)
                        if mpeg is None:
                            continue
                        si = (
                            parse_mp3_stream(data)
                            if mpeg == "mp3"
                            else parse_adts_stream(data)
                        )
                        rows.append(
                            (
                                int(i), si["container"], si["codec"],
                                si["sample_rate"], si["channels"], 0,
                                si["n_samples"],
                            )
                        )
                except (ValueError, struct.error):
                    continue
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "container", "codec", "sample_rate",
                    "channels", "bits", "n_samples",
                ],
            )

    return payloads.mapInPandas(
        compute,
        schema=(
            "id long, container string, codec string, sample_rate long, "
            "channels long, bits long, n_samples long"
        ),
    )


def _wav_header_info(payload: bytes):
    """RIFF/WAVE header walk → ('wav', 'pcm', sample_rate, channels,
    bits, n_frames) from the fmt chunk + data chunk SIZE (no sample
    decode)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, fmt, data_size = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("truncated WAV fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", payload, pos + 8)
        elif cid == b"data":
            data_size = size
        pos += 8 + size + (size & 1)
    if fmt is None or data_size is None:
        raise ValueError("WAV missing fmt/data chunk")
    _, channels, rate, _, _, bits = fmt
    if channels < 1 or bits % 8:
        raise ValueError("malformed WAV fmt fields")
    return (
        "wav", "pcm", rate, channels, bits,
        data_size // (bits // 8) // channels,
    )


def demo_burst_audio_payloads(
    df: DataFrame, id_col: str, *, modulus: int = 10, frame: int = 256
) -> DataFrame:
    """The m18 fixture stream: each ``id % modulus == 0`` row is a
    clip of silence-separated tone BURSTS whose layout is id-derived
    and frame-aligned, so a relational oracle can recompute the exact
    voice-activity segments (the parse ∘ synthesize == id witness
    shape, applied to DSP). With ``j = id // modulus`` the clip is::

        gap(2+j%3) burst(2+j%4) gap(1+j%2) burst(3+(j//3)%3)
        gap(2) burst(2+(j//2)%2) gap(1)

    in units of one analysis frame (``frame`` samples); bursts are
    0.45-amplitude sine, gaps digital silence (exact zeros — both
    codecs preserve them bit-exactly). Odd j arrives FLAC-compressed,
    even j WAV, so segmentation is pinned codec-transparent."""
    import numpy as np

    from pyspark.sql import functions as F

    from .util import spread

    base = spread(
        df.select(F.col(id_col).cast("long").alias("id")).where(
            F.col(id_col) % modulus == 0
        )
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .flac import flac_from_samples
        from .multimodal import wav_from_samples

        for pdf in batches:
            content = []
            for i in pdf["id"]:
                i = int(i)
                j = i // modulus
                spans = burst_layout(j)
                pieces = []
                for is_burst, n_frames in spans:
                    n = n_frames * frame
                    if is_burst:
                        t = np.arange(n, dtype=np.float64)
                        pieces.append(
                            0.45 * np.sin(
                                2 * np.pi * (0.03 + 0.002 * (j % 7)) * t
                            )
                        )
                    else:
                        pieces.append(np.zeros(n))
                wave = np.concatenate(pieces)
                if j % 2 == 1:
                    content.append(flac_from_samples(wave, 8000))
                else:
                    content.append(wav_from_samples(wave, 8000))
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "content": content,
                    "modality": ["audio"] * len(content),
                }
            )

    return base.mapInPandas(gen, schema="id long, content binary, modality string")


def burst_layout(j: int) -> list[tuple[bool, int]]:
    """(is_burst, n_frames) spans of the m18 fixture clip for index
    j — shared by the generator and the tests; the SQL oracle
    mirrors this arithmetic."""
    return [
        (False, 2 + j % 3),
        (True, 2 + j % 4),
        (False, 1 + j % 2),
        (True, 3 + (j // 3) % 3),
        (False, 2),
        (True, 2 + (j // 2) % 2),
        (False, 1),
    ]


def voice_activity_segments(
    payloads: DataFrame, *, frame: int = 256, threshold: float = 0.01
) -> DataFrame:
    """(id, seg, start_frame, n_frames) voice-activity segments per
    decodable audio payload — the segmentation pass a speech corpus
    runs before transcription/alignment: frame the mono signal into
    non-overlapping ``frame``-sample windows, mark a window active
    when its RMS exceeds ``threshold``, and emit each maximal run of
    active windows. Pure numpy per payload (decode → reshape → RMS →
    run-length over the boolean mask), Arrow-batched; undecodable
    payloads are dropped, not fatal.

    Non-overlapping windows make the boundaries EXACT for
    frame-aligned content, which is what lets the m18 oracle
    recompute segments relationally — a property test, not a vibe."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for i, b in zip(pdf["id"], pdf["content"]):
                data = bytes(b)
                try:
                    n_ch, _, samples = audio_samples(data)
                except (ValueError, struct.error):
                    continue
                n_fr = len(samples) // max(n_ch, 1)
                mono = (
                    samples[: n_fr * n_ch].reshape(n_fr, n_ch).mean(axis=1)
                )
                n_win = len(mono) // frame
                if n_win == 0:
                    continue
                rms = np.sqrt(
                    (mono[: n_win * frame].reshape(n_win, frame) ** 2).mean(
                        axis=1
                    )
                )
                active = rms > threshold
                # run-length extraction over the boolean mask
                edges = np.flatnonzero(np.diff(active.astype(np.int8)))
                starts = [0] if active[0] else []
                starts += [int(e) + 1 for e in edges if not active[e]]
                ends = [int(e) + 1 for e in edges if active[e]]
                if active[-1]:
                    ends.append(n_win)
                for k, (s, e) in enumerate(zip(starts, ends), start=1):
                    rows.append((int(i), k, s, e - s))
            yield pd.DataFrame(
                rows, columns=["id", "seg", "start_frame", "n_frames"]
            )

    return payloads.mapInPandas(
        compute,
        schema="id long, seg long, start_frame long, n_frames long",
    )


def audio_match_pairs(
    payloads: DataFrame,
    *,
    min_containment: float = 0.3,
    max_hash_df: int | None = None,
    **fp_kwargs,
) -> DataFrame:
    """(id_a < id_b, shared_chunks, containment) pairs of audio
    payloads sharing landmark fingerprints — same join/posture as the
    binary chunk maps; ``max_hash_df`` is the posting cap for
    ubiquitous landmarks (steady hums, silence)."""
    fp = audio_fingerprints(payloads, **fp_kwargs)
    return chunk_pair_join(
        fp, min_containment=min_containment, max_block_df=max_hash_df
    )
