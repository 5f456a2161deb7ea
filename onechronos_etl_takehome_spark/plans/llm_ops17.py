"""Round-14 operator batch (second wave): real COMPRESSED audio.

- **FLAC audio near-dup** (m16): ``operators/flac.py`` — a real FLAC
  codec in pure numpy/stdlib (encoder: stereo-decorrelation + LPC /
  fixed subframes + Rice partitions; decoder: the full mono/stereo
  subset with CRC-8/CRC-16/MD5 enforcement), so the spectral-landmark
  family (m09) gains compressed ingest: the re-captured twin of each
  song arrives as a FLAC upload and is still matched to its WAV
  original.
- **Audio stream metadata** (m17): the audio leg of the m14-style
  cataloging pass — container/rate/channels/bits/length per payload
  WITHOUT sample decode (RIFF chunk walk; fLaC STREAMINFO parse),
  hash-matched against a relational recomputation of the fixture's
  id-derived parameters (parse ∘ synthesize == id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import pin_semantics
from ..sources.tables import load_table
from .catalog import register


@register("m16_flac_audio_neardup")  # FLAC frame decode → rows-only
def m16_flac_audio_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAC-INGEST audio near-dup: the m09 paired-song corpus, except
    every re-captured twin (attenuated, noisy, hop-shifted) arrives
    FLAC-compressed (``operators/flac.py`` — spec-conformant streams
    with LPC/fixed subframes, Rice-coded residuals, and CRC-8/CRC-16/
    MD5 integrity, which the decoder ENFORCES rather than assumes).
    FLAC is lossless, so the compressed twin fingerprints exactly as
    its PCM would — the landmark containment join recovers every
    WAV↔FLAC pair, while a WAV-only ingest scores zero pairs here.
    Rows-only BY DESIGN: SQL has no FFT and cannot parse FLAC frames;
    pinned by tests/test_flac.py (round-trips at three bit depths,
    published CRC catalogue check values, an independently
    hand-assembled stream the encoder never wrote, WAV-parity
    exactness) and the planted-pair recovery in
    tests/test_round14b_ops.py.

    Scale: same Arrow-batched decode stage and inverted-index
    containment join as m09 — the posting cap is the lever for
    ubiquitous landmarks; no all-pairs stage anywhere."""
    from ..operators import audio as au

    pin_semantics(spark)
    docs = load_table(spark, sf_dir, "documents")
    payloads = au.demo_mixed_audio_payloads(docs, "doc_id")
    return au.audio_match_pairs(payloads, min_containment=0.6)


# parse ∘ synthesize == id over the four-container audio zoo — the
# same witness shape as m14 (the parse is the hard direction; the
# oracle recomputes what the deterministic fixture embedded).
_M17_ORACLE = """
    WITH ids AS (
      SELECT CAST(doc_id AS BIGINT) AS id
      FROM documents WHERE doc_id % 10 = 0),
    p AS (
      SELECT id,
             (id // 10) % 4 AS kind,
             CASE ((id // 10) // 4) % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                  WHEN 2 THEN 22050 ELSE 44100 END AS rate,
             ((id // 10) // 16) % 8 AS len_step,
             CASE WHEN (id // 40) % 2 = 1 THEN 1 ELSE 0 END AS stereo
      FROM ids)
    SELECT id,
           CASE kind WHEN 0 THEN 'wav' WHEN 1 THEN 'flac'
                WHEN 2 THEN 'mp3' ELSE 'adts' END AS container,
           CASE kind WHEN 0 THEN 'pcm' WHEN 1 THEN 'flac'
                WHEN 3 THEN 'aac-lc'
                ELSE CASE rate WHEN 44100 THEN 'mpeg1-layer3'
                     WHEN 8000 THEN 'mpeg2.5-layer3'
                     ELSE 'mpeg2-layer3' END END AS codec,
           CAST(rate AS BIGINT) AS sample_rate,
           CAST(CASE WHEN kind != 0 AND stereo = 1
                THEN 2 ELSE 1 END AS BIGINT) AS channels,
           CAST(CASE WHEN kind <= 1 THEN 16 ELSE 0 END AS BIGINT) AS bits,
           CAST(CASE WHEN kind <= 1 THEN 1024 + len_step * 128
                WHEN kind = 2 THEN (2 + len_step) *
                     (CASE WHEN rate = 44100 THEN 1152 ELSE 576 END)
                ELSE (2 + len_step) * 1024 END AS BIGINT) AS n_samples
    FROM p
"""


@register("m17_audio_stream_metadata", oracle=_M17_ORACLE)
def m17_audio_stream_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUDIO STREAM METADATA (``operators/audio.py:
    audio_stream_metadata``): the routing/cataloging pass a 100-TB
    audio corpus runs BEFORE any decode — container, codec, sample
    rate, channel count, bit depth, and sample length, extracted
    WITHOUT touching sample data. WAV: RIFF chunk walk over fmt +
    data sizes; FLAC: fLaC magic + the 34-byte STREAMINFO block
    (``operators/flac.py:flac_stream_info`` — frames never opened);
    MP3 / ADTS AAC: frame-header walks by the specs' exact length
    arithmetic (``operators/mpeg_audio.py`` — versions, layers,
    bitrate/rate indices; sample decode of the lossy codecs is not
    claimed, exactly as m14 routes HEVC it cannot decode). The
    fixture rotates all four containers, four sample rates, mono and
    stereo, and eight lengths, all id-derived, so the oracle
    recomputes relationally exactly what the parser must extract —
    parse ∘ synthesize == id, per payload, hash-matched. The
    self-reference loophole (parser and synthesizer sharing a bug) is
    narrowed by tests/test_flac.py: published CRC catalogue check
    values and an independently hand-assembled stream decoded
    correctly.

    Scale: pure metadata cost — bytes read per payload are the RIFF
    chunk headers / one 42-byte FLAC prefix / 4-to-9-byte frame
    headers; embarrassingly parallel in the same Arrow-batched stage
    every media op uses."""
    from ..operators import audio as au

    pin_semantics(spark)
    docs = load_table(spark, sf_dir, "documents")
    payloads = au.demo_audio_zoo_payloads(docs, "doc_id")
    return au.audio_stream_metadata(payloads).select(
        "id", "container", "codec", "sample_rate",
        "channels", "bits", "n_samples",
    )
