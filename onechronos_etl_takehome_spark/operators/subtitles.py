"""SubRip (SRT) transcript parsing + transcript↔speech alignment.

The pairing pass of ASR/TTS corpus preparation: uploads arrive as
(audio, transcript) pairs, and before a single sample is transcribed
or trained on, the pipeline must know WHICH transcript cue covers
WHICH detected-speech span — misaligned pairs are the classic source
of silent label noise in speech corpora. This module supplies both
halves:

- :func:`parse_srt` — a strict SubRip parser (cue index line,
  ``HH:MM:SS,mmm --> HH:MM:SS,mmm`` time line, text lines until the
  blank separator). Malformed cues raise ValueError — the same
  fall-to-stub contract every decoder in this package honors.
- :func:`align_transcript_segments` — the Spark op: voice-activity
  segments (``audio.voice_activity_segments`` — real RMS DSP over
  WAV/FLAC bytes) interval-joined with parsed cue spans per payload
  id, emitting one row per overlapping (cue, segment) pair with the
  overlap length. The join is an equi-join on the payload id plus a
  span-overlap filter — never a cartesian stage.

Units: cue times are milliseconds (SRT's native resolution);
segments are 256-sample frames at 8 kHz = exactly 32 ms each, so
frame↔ms conversion is integer-exact and the m19 catalog row can be
hash-matched against a pure-SQL recomputation of both span families
and their intersection.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TIME_RE = re.compile(
    r"^(\d{2}):(\d{2}):(\d{2}),(\d{3}) --> "
    r"(\d{2}):(\d{2}):(\d{2}),(\d{3})\s*$"
)


def _ms(h: str, m: str, s: str, ms: str) -> int:
    return ((int(h) * 60 + int(m)) * 60 + int(s)) * 1000 + int(ms)


def parse_srt(text: str) -> list[tuple[int, int, int, str]]:
    """Parse one SubRip document → [(cue_index, start_ms, end_ms,
    text)]. Strict: indices must be positive integers, the arrow time
    line must match SRT's fixed format, end must follow start, and
    every cue needs at least one text line."""
    cues: list[tuple[int, int, int, str]] = []
    blocks = re.split(r"\n\s*\n", text.strip("﻿\n "))
    for block in blocks:
        lines = [ln.rstrip("\r") for ln in block.split("\n") if ln.strip()]
        if not lines:
            continue
        if len(lines) < 3:
            raise ValueError("SRT cue needs index, times, and text")
        if not lines[0].strip().isdigit():
            raise ValueError(f"bad SRT cue index line: {lines[0]!r}")
        idx = int(lines[0])
        m = _TIME_RE.match(lines[1].strip())
        if m is None:
            raise ValueError(f"bad SRT time line: {lines[1]!r}")
        start = _ms(*m.groups()[:4])
        end = _ms(*m.groups()[4:])
        if end <= start:
            raise ValueError("SRT cue ends before it starts")
        cues.append((idx, start, end, "\n".join(lines[2:])))
    if not cues:
        raise ValueError("no SRT cues")
    return cues


def synthesize_srt(cues: list[tuple[int, int, str]]) -> str:
    """[(start_ms, end_ms, text)] → a SubRip document (1-based cue
    indices, the exact format :func:`parse_srt` reads)."""

    def stamp(ms: int) -> str:
        s, milli = divmod(ms, 1000)
        m, sec = divmod(s, 60)
        h, minute = divmod(m, 60)
        return f"{h:02d}:{minute:02d}:{sec:02d},{milli:03d}"

    out = []
    for k, (start, end, text) in enumerate(cues, start=1):
        out.append(f"{k}\n{stamp(start)} --> {stamp(end)}\n{text}\n")
    return "\n".join(out)


def demo_srt_payloads(
    df: DataFrame, id_col: str, *, modulus: int = 10, frame_ms: int = 32
) -> DataFrame:
    """The m19 transcript stream paired with
    ``audio.demo_burst_audio_payloads``: per ``id % modulus == 0``
    row, two cues whose spans are id-derived IN FRAME UNITS (×32 ms),
    deliberately NOT equal to the burst layout — alignment must be
    computed, not assumed. With ``j = id // modulus``: cue 1 covers
    frames [1, 4 + j % 4), cue 2 covers frames
    [6 + j % 3, 10 + j % 3 + (j // 2) % 4)."""

    from .util import spread

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            docs = []
            for i in pdf["id"]:
                j = int(i) // modulus
                c1 = (1 * frame_ms, (4 + j % 4) * frame_ms, f"cue one {j}")
                lo = 6 + j % 3
                c2 = (
                    lo * frame_ms,
                    (lo + 4 + (j // 2) % 4) * frame_ms,
                    f"cue two {j}",
                )
                docs.append(synthesize_srt([c1, c2]))
            yield pd.DataFrame({"id": pdf["id"], "srt": docs})

    # spread: synthesis + the downstream parse are pure-CPU per-id
    # work; a single-file scan would serialize them onto one core
    base = spread(
        df.select(F.col(id_col).cast("long").alias("id")).where(
            F.col(id_col) % modulus == 0
        )
    )
    return base.mapInPandas(gen, schema="id long, srt string")


def srt_cue_spans(
    transcripts: DataFrame, *, frame_ms: int = 32
) -> DataFrame:
    """(id, cue, cue_start_frame, cue_end_frame) per parsed cue —
    SRT milliseconds floored onto the analysis frame grid.
    Unparseable documents are dropped, not fatal."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, doc in zip(pdf["id"], pdf["srt"]):
                try:
                    cues = parse_srt(str(doc))
                except ValueError:
                    continue
                for idx, start, end, _ in cues:
                    rows.append(
                        (
                            int(i),
                            idx,
                            start // frame_ms,
                            -(-end // frame_ms),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["id", "cue", "cue_start_frame", "cue_end_frame"],
            )

    return transcripts.mapInPandas(
        compute,
        schema=(
            "id long, cue long, cue_start_frame long, cue_end_frame long"
        ),
    )


def align_transcript_segments(
    audio_payloads: DataFrame,
    transcripts: DataFrame,
    *,
    frame: int = 256,
    frame_ms: int = 32,
) -> DataFrame:
    """One row per (cue, voice-activity segment) pair that overlaps
    in time: (id, cue, seg, overlap_frames). Segments come from the
    real DSP pass (``audio.voice_activity_segments``); cues from
    :func:`parse_srt`. The join is an equi-join on the payload id —
    cue and segment counts per id are tiny, so the overlap filter
    runs on a join output linear in the corpus, never a cartesian."""
    from .audio import voice_activity_segments

    segs = voice_activity_segments(audio_payloads, frame=frame)
    cues = srt_cue_spans(transcripts, frame_ms=frame_ms)
    seg_end = F.col("start_frame") + F.col("n_frames")
    overlap = F.least(seg_end, F.col("cue_end_frame")) - F.greatest(
        F.col("start_frame"), F.col("cue_start_frame")
    )
    return (
        segs.join(cues, "id")
        .where(
            (F.col("cue_start_frame") < seg_end)
            & (F.col("start_frame") < F.col("cue_end_frame"))
        )
        .select(
            "id",
            "cue",
            "seg",
            overlap.cast("long").alias("overlap_frames"),
        )
    )
