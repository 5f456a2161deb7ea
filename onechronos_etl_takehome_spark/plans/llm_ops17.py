"""Round-14 operator batch (second wave): real COMPRESSED audio +
the training loop's epoch axis.

- **Epoch reshuffle** (t29): ``operators/shards.py:
  read_training_shards_epoch`` — a fresh deterministic training
  order per epoch from the SAME shard layout, zero bytes rewritten;
  per-shard checksums of two epoch replays hash-matched in one row.
- **Voice-activity segmentation** (m18): real sample-level DSP
  (decode → framed RMS → threshold → run-length), hash-matched
  because the fixture's bursts are frame-aligned — the oracle
  recomputes exact segments from id arithmetic.
- **Transcript alignment** (m19): strict SRT parse + interval join
  of cue spans to m18's detected-speech spans
  (``operators/subtitles.py``) — a two-modality composition whose
  entire output the oracle recomputes and intersects in SQL.
- **HTML main-content extraction** (t31): the web-corpus
  boilerplate cut (``operators/webtext.py`` — stdlib-parser block
  walk, link-density gate), output strings hash-matched exactly.
- **GIF video ingest** (m20): a full GIF codec
  (``operators/gif.py`` — LZW both ways, interlace, disposal,
  transparency) plugged into the mixed-container video near-dup
  stage; planted MP4↔GIF twins recovered by the tolerant join.
- **Image stream metadata** (m21): the image leg of the routing
  trilogy (``operators/imagemeta.py``) — header-only container /
  coding-mode / dimensions / depth / frame-count parses, oracled
  over a five-mode zoo.

- **FLAC audio near-dup** (m16): ``operators/flac.py`` — a real FLAC
  codec in pure numpy/stdlib (encoder: stereo-decorrelation + LPC /
  fixed subframes + Rice partitions; decoder: the full mono/stereo
  subset with CRC-8/CRC-16/MD5 enforcement), so the spectral-landmark
  family (m09) gains compressed ingest: the re-captured twin of each
  song arrives as a FLAC upload and is still matched to its WAV
  original.
- **Audio stream metadata** (m17): the audio leg of the m14-style
  cataloging pass — container/codec/rate/channels/bits/length per
  payload WITHOUT sample decode (RIFF chunk walk; fLaC STREAMINFO
  parse; MP3/ADTS frame-header arithmetic,
  ``operators/mpeg_audio.py``), hash-matched against a relational
  recomputation of the fixture's id-derived parameters
  (parse ∘ synthesize == id).
"""

from __future__ import annotations

import uuid

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


_T29_SEED = 13
_T29_SHARDS = 8

# Two epoch replays of ONE layout, recomputed relationally: shard
# membership comes from the layout key (seed 13), each epoch's order
# from md5('e{epoch}:'||id) — the same cross-engine 60-bit family.
_T29_ORACLE = f"""
    WITH k AS (
      SELECT CAST(doc_id AS BIGINT) AS doc_id,
             ('0x' || substr(
                md5('{_T29_SEED}:' || CAST(doc_id AS VARCHAR)), 1, 15
             ))::BIGINT % {_T29_SHARDS} AS shard
      FROM documents),
    e AS (
      SELECT doc_id, shard, epoch,
             ROW_NUMBER() OVER (
               PARTITION BY shard, epoch
               ORDER BY ('0x' || substr(
                 md5('e' || epoch || ':' || CAST(doc_id AS VARCHAR)), 1, 15
               ))::BIGINT, doc_id
             ) AS pos
      FROM k CROSS JOIN (SELECT 1 AS epoch UNION ALL SELECT 2)),
    c AS (
      SELECT shard, epoch,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(pos * (doc_id % 1000003)) AS BIGINT) AS ck
      FROM e GROUP BY shard, epoch)
    SELECT CAST(a.shard AS BIGINT) AS shard,
           a.n_docs,
           a.ck AS order_checksum_e1,
           b.ck AS order_checksum_e2
    FROM c a JOIN c b ON a.shard = b.shard
    WHERE a.epoch = 1 AND b.epoch = 2
"""


@register("t29_epoch_reshuffle", oracle=_T29_ORACLE)
def t29_epoch_reshuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EPOCH RESHUFFLE (``operators/shards.py:
    read_training_shards_epoch``): a multi-epoch training run wants a
    DIFFERENT pseudo-random visit order every epoch, but rewriting or
    re-shuffling a 100-TB layout per epoch is corpus-sized I/O for a
    pure ORDER change. Shard membership is hash-stable, so epoch e
    re-sorts only WITHIN each shard by a fresh read-time key
    (md5('e{{epoch}}:'||id)) — the files on disk stay byte-identical
    across epochs (pinned in tests/test_round14b_ops.py), and each
    epoch costs exactly the replay plan: one hash exchange + N
    shard-local sorts, zero bytes written.

    The row materializes one layout, replays epochs 1 and 2, and
    hash-matches per-shard (n_docs, order checksum e1, order
    checksum e2) against a DuckDB recomputation — proving in one
    result that membership is epoch-invariant (same n_docs under the
    same shard key) while the order genuinely changes (independent
    checksums, each transposition-sensitive)."""
    import shutil
    import tempfile

    from ..operators.shards import (
        read_training_shards_epoch,
        write_training_shards,
    )

    pin_semantics(spark)
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id")
    )
    path = tempfile.mkdtemp(prefix=f"shards_t29_{uuid.uuid4().hex[:8]}_")
    shutil.rmtree(path)  # writer requires a fresh target (mode=error)
    write_training_shards(
        docs, "doc_id", path, n_shards=_T29_SHARDS, seed=_T29_SEED
    )

    def epoch_cksums(epoch: int) -> DataFrame:
        replay = read_training_shards_epoch(
            spark, path, "doc_id", epoch=epoch
        )
        return (
            replay.select(
                "_shard",
                (
                    F.col("_pos") * (F.col("doc_id") % 1_000_003)
                ).alias("_ck"),
            )
            .groupBy("_shard")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum("_ck").cast("long").alias(f"order_checksum_e{epoch}"),
            )
        )

    e1 = epoch_cksums(1)
    e2 = epoch_cksums(2).drop("n_docs")
    return (
        e1.join(e2, "_shard")
        .select(
            F.col("_shard").alias("shard"),
            "n_docs",
            "order_checksum_e1",
            "order_checksum_e2",
        )
    )


# parse ∘ synthesize == id over the five-mode image zoo — the image
# leg of the routing-pass trilogy (m14 video, m17 audio, m21 image).
_M21_ORACLE = """
    WITH ids AS (
      SELECT CAST(doc_id AS BIGINT) AS id
      FROM documents WHERE doc_id % 10 = 0),
    p AS (
      SELECT id,
             (id // 10) % 5 AS kind,
             20 + ((id // 10) // 5) % 5 * 12 AS w,
             16 + ((id // 10) // 25) % 4 * 10 AS h,
             2 + ((id // 10) // 5) % 3 AS gframes
      FROM ids)
    SELECT id,
           CASE kind WHEN 0 THEN 'bmp' WHEN 1 THEN 'png'
                WHEN 4 THEN 'gif' ELSE 'jpeg' END AS container,
           CASE kind WHEN 0 THEN 'bmp' WHEN 1 THEN 'png'
                WHEN 2 THEN 'jpeg-baseline' WHEN 3 THEN 'jpeg-progressive'
                ELSE 'gif' END AS codec,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(CASE WHEN kind <= 1 THEN 24 WHEN kind = 4 THEN 2
                ELSE 8 END AS BIGINT) AS bit_depth,
           CAST(CASE WHEN kind = 4 THEN gframes ELSE 1 END AS BIGINT)
             AS n_frames
    FROM p
"""


@register("m21_image_stream_metadata", oracle=_M21_ORACLE)
def m21_image_stream_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IMAGE STREAM METADATA (``operators/imagemeta.py``): the image
    leg of the routing/cataloging trilogy (m14 video, m17 audio) —
    container, coding mode, dimensions, depth, and frame count per
    payload WITHOUT decoding a pixel. BMP and PNG are fixed-offset
    header reads; JPEG walks marker segments to SOF, distinguishing
    baseline from progressive (a one-byte difference worth ~3× in
    decode budget — exactly what a routing pass exists to know); GIF
    walks blocks and COUNTS frames by skipping sub-block lengths
    arithmetically, LZW never running (a 200-frame GIF is
    video-shaped work and must route accordingly). The fixture
    rotates all five coding modes with id-derived dimensions and
    frame counts via independent mixed-radix digits (no
    correlated-selector dead legs), and the oracle recomputes every
    field — parse ∘ synthesize == id, hash-matched.

    Scale: bytes touched per payload are a few dozen header bytes;
    same Arrow-batched stage as every media op."""
    from ..operators import imagemeta as im

    pin_semantics(spark)
    docs = load_table(spark, sf_dir, "documents")
    payloads = im.demo_image_zoo_payloads(docs, "doc_id")
    return im.image_stream_metadata(payloads)


@register("m20_gif_video_neardup")  # LZW frame decode → rows-only
def m20_gif_video_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GIF-INGEST video near-dup: each planted twin pairs a lossy
    Motion-JPEG MP4 with the SAME footage (lead frame trimmed)
    re-published as an animated GIF — decoded for real by the
    pure-python LZW + composition pipeline in ``operators/gif.py``
    (the web-corpus case: a clip and its meme-GIF re-encode). The
    GIF side is pixel-exact (<=64-color content; LZW is lossless)
    while JPEG quantization drifts the MP4 side's hashes, so the
    exact containment join finds zero pairs and only the tolerant
    banded-Hamming join (m12's machinery) recovers the twins — the
    m15 contrast on the format every meme re-encode uses. Rows-only
    BY DESIGN: SQL cannot
    run LZW; pinned by tests/test_round14c_ops.py (LZW round-trips
    incl. dictionary reset, interlace de-weave, disposal/transparency
    composition, a hand-assembled spec-bytes GIF the encoder never
    wrote, palette-overflow refusal, planted-pair recovery).

    Scale: GIFs ride the SAME Arrow-batched sniff-and-decode stage
    as AVI/MP4 (one binary scan, one fingerprint pass for a mixed
    corpus) and the same pigeonhole blocking as m12."""
    from ..operators import video as vid

    pin_semantics(spark)
    docs = load_table(spark, sf_dir, "documents")
    n_videos = docs.filter(F.col("doc_id") % 10 == 0).count()
    payloads = vid.demo_gif_twin_payloads(docs, "doc_id")
    return vid.video_match_pairs_tolerant(
        payloads, min_containment=0.6, n_videos=n_videos
    )


# The extractor's exact output rebuilt relationally: title, the
# newline-joined id-derived paragraphs (entity &amp; decoded to &),
# and the kept/dropped block counts. chr(10) is the newline.
_T31_ORACLE = """
    WITH ids AS (
      SELECT CAST(doc_id AS BIGINT) AS id
      FROM documents WHERE doc_id % 5 = 0),
    p AS (
      SELECT id, id // 5 AS j, (id // 5) % 3 AS extra FROM ids),
    parts AS (
      SELECT id, j, extra,
             'para ' || j || ' 0 alpha & beta' AS p0,
             'para ' || j || ' 1 alpha & beta' AS p1,
             'para ' || j || ' 2 alpha & beta' AS p2,
             'para ' || j || ' 3 alpha & beta' AS p3
      FROM p)
    SELECT id,
           'Doc ' || j AS title,
           CASE extra
             WHEN 0 THEN p0 || chr(10) || p1
             WHEN 1 THEN p0 || chr(10) || p1 || chr(10) || p2
             ELSE p0 || chr(10) || p1 || chr(10) || p2 || chr(10) || p3
           END AS main_text,
           CAST(2 + extra AS BIGINT) AS n_kept,
           CAST(3 AS BIGINT) AS n_dropped
    FROM parts
"""


@register("t31_html_main_text", oracle=_T31_ORACLE)
def t31_html_main_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML MAIN-CONTENT EXTRACTION (``operators/webtext.py``) — the
    first operator every web-scale pretraining corpus runs
    (CCNet/RefinedWeb/FineWeb-style boilerplate removal). A real
    event-driven HTML walk on the stdlib parser: script/style
    subtrees skipped, entities decoded, comments dropped, text
    segmented into blocks at block-element boundaries, and each
    block classified by MEASURED link density (chars inside <a> ÷
    block chars) — menus, promo rails, and footers are mostly links
    and die; content paragraphs have near-zero density and survive.
    The fixture pages embed id-derived paragraphs (with an entity to
    prove decoding) among realistic chrome, and the oracle rebuilds
    the exact title + newline-joined main_text + block counts
    relationally — extraction hash-matched string-for-string.

    Scale: one Arrow-batched pure-CPU pass per page, no state across
    documents; output text is the corpus after a ~70% chrome cut."""
    from ..operators import webtext as wt

    pin_semantics(spark)
    docs = load_table(spark, sf_dir, "documents")
    pages = wt.demo_web_pages(docs, "doc_id")
    return wt.html_main_text(pages)


# Cue spans (the SRT fixture's arithmetic) interval-joined with the
# m18 segment spans (the burst fixture's arithmetic) — the whole
# alignment recomputed in SQL, overlap lengths included.
_M19_ORACLE = """
    WITH ids AS (
      SELECT CAST(doc_id AS BIGINT) AS id
      FROM documents WHERE doc_id % 10 = 0),
    p AS (
      SELECT id,
             2 + (id // 10) % 3 AS g0,
             2 + (id // 10) % 4 AS b1,
             1 + (id // 10) % 2 AS g1,
             3 + ((id // 10) // 3) % 3 AS b2,
             2 AS g2,
             2 + ((id // 10) // 2) % 2 AS b3
      FROM ids),
    segs AS (
      SELECT id, 1 AS seg, g0 AS ss, g0 + b1 AS se FROM p
      UNION ALL
      SELECT id, 2, g0 + b1 + g1, g0 + b1 + g1 + b2 FROM p
      UNION ALL
      SELECT id, 3, g0 + b1 + g1 + b2 + g2,
             g0 + b1 + g1 + b2 + g2 + b3 FROM p),
    cues AS (
      SELECT id, 1 AS cue, 1 AS cs, 4 + (id // 10) % 4 AS ce FROM ids
      UNION ALL
      SELECT id, 2, 6 + (id // 10) % 3,
             6 + (id // 10) % 3 + 4 + ((id // 10) // 2) % 4 FROM ids)
    SELECT s.id, CAST(c.cue AS BIGINT) AS cue,
           CAST(s.seg AS BIGINT) AS seg,
           CAST(LEAST(s.se, c.ce) - GREATEST(s.ss, c.cs) AS BIGINT)
             AS overlap_frames
    FROM segs s JOIN cues c ON s.id = c.id
    WHERE c.cs < s.se AND s.ss < c.ce
"""


@register("m19_transcript_alignment", oracle=_M19_ORACLE)
def m19_transcript_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRANSCRIPT↔SPEECH ALIGNMENT (``operators/subtitles.py``): the
    pairing pass of ASR/TTS corpus prep — which SubRip cue covers
    which detected-speech span, per (audio, transcript) upload pair.
    Both sides are REAL: the audio side runs the m18 DSP
    (WAV/FLAC decode → framed RMS → run-length segments) and the
    transcript side a strict SRT parse (cue indices, the
    ``HH:MM:SS,mmm --> HH:MM:SS,mmm`` grammar, ms precision); the
    interval join is an id equi-join plus a span-overlap filter —
    never a cartesian stage. Hash-matched end to end: 256-sample
    frames at 8 kHz are exactly 32 ms, so cue ms ↔ frame conversion
    is integer-exact and the oracle recomputes BOTH span families
    from id arithmetic and intersects them in SQL — the strongest
    witness shape available for a two-modality composition.

    Scale: segments and cues are ~0.1% of payload bytes; the join
    shuffles only those reduced frames, hash-partitioned on id."""
    from ..operators import audio as au
    from ..operators import subtitles as st

    pin_semantics(spark)
    docs = load_table(spark, sf_dir, "documents")
    audio = au.demo_burst_audio_payloads(docs, "doc_id")
    srt = st.demo_srt_payloads(docs, "doc_id")
    return st.align_transcript_segments(audio, srt)


# Voice-activity segments recomputed relationally from the fixture's
# id-derived frame-aligned burst layout (audio.burst_layout): with
# j = id // 10, gaps g0..g2 and bursts b1..b3 in frame units, the
# three segments are (g0, b1), (g0+b1+g1, b2), (g0+b1+g1+b2+g2, b3).
_M18_ORACLE = """
    WITH ids AS (
      SELECT CAST(doc_id AS BIGINT) AS id
      FROM documents WHERE doc_id % 10 = 0),
    p AS (
      SELECT id,
             2 + (id // 10) % 3 AS g0,
             2 + (id // 10) % 4 AS b1,
             1 + (id // 10) % 2 AS g1,
             3 + ((id // 10) // 3) % 3 AS b2,
             2 AS g2,
             2 + ((id // 10) // 2) % 2 AS b3
      FROM ids)
    SELECT id, CAST(1 AS BIGINT) AS seg,
           CAST(g0 AS BIGINT) AS start_frame,
           CAST(b1 AS BIGINT) AS n_frames
    FROM p
    UNION ALL
    SELECT id, CAST(2 AS BIGINT),
           CAST(g0 + b1 + g1 AS BIGINT),
           CAST(b2 AS BIGINT)
    FROM p
    UNION ALL
    SELECT id, CAST(3 AS BIGINT),
           CAST(g0 + b1 + g1 + b2 + g2 AS BIGINT),
           CAST(b3 AS BIGINT)
    FROM p
"""


@register("m18_voice_activity_segments", oracle=_M18_ORACLE)
def m18_voice_activity_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VOICE-ACTIVITY SEGMENTATION (``operators/audio.py:
    voice_activity_segments``): the first pass of speech-corpus
    preparation — find where anyone is speaking before paying for
    transcription or alignment. REAL DSP end-to-end: decode (WAV or
    FLAC — half the fixture arrives FLAC-compressed, so the segments
    are pinned codec-transparent), frame into non-overlapping
    256-sample windows, per-window RMS, threshold, run-length extract
    the active runs. Hash-matched because the fixture's bursts are
    frame-ALIGNED and its gaps digital silence: the oracle recomputes
    every (start_frame, n_frames) from the id-derived burst layout —
    parse ∘ synthesize == id, extended from header fields to actual
    SAMPLE analysis (the spectral ops stay rows-only because SQL has
    no FFT; RMS-over-aligned-frames it CAN pin exactly).

    Scale: one Arrow-batched decode+reshape+RMS pass per payload, no
    Python per sample; output is segments, ~0.1% of input bytes."""
    from ..operators import audio as au

    pin_semantics(spark)
    docs = load_table(spark, sf_dir, "documents")
    payloads = au.demo_burst_audio_payloads(docs, "doc_id")
    return au.voice_activity_segments(payloads)


# parse ∘ synthesize == id over the four-container audio zoo — the
# same witness shape as m14 (the parse is the hard direction; the
# oracle recomputes what the deterministic fixture embedded).
_M17_ORACLE = """
    WITH ids AS (
      SELECT CAST(doc_id AS BIGINT) AS id
      FROM documents WHERE doc_id % 10 = 0),
    p AS (
      SELECT id,
             (id // 10) % 6 AS kind,
             CASE ((id // 10) // 6) % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                  WHEN 2 THEN 22050 ELSE 44100 END AS rate,
             ((id // 10) // 24) % 8 AS len_step,
             CASE WHEN (id // 40) % 2 = 1 THEN 1 ELSE 0 END AS stereo
      FROM ids)
    SELECT id,
           CASE kind WHEN 0 THEN 'wav' WHEN 1 THEN 'flac'
                WHEN 2 THEN 'mp3' WHEN 3 THEN 'adts'
                ELSE 'ogg' END AS container,
           CASE kind WHEN 0 THEN 'pcm' WHEN 1 THEN 'flac'
                WHEN 3 THEN 'aac-lc' WHEN 4 THEN 'opus'
                WHEN 5 THEN 'vorbis'
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
                WHEN kind = 3 THEN (2 + len_step) * 1024
                WHEN kind = 4 THEN (2 + len_step) * 960
                ELSE 512 * (2 + len_step) END AS BIGINT) AS n_samples
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
    bitrate/rate indices); Ogg-Opus / Ogg-Vorbis: CRC-verified page
    walks to the OpusHead / Vorbis identification header and the EOS
    granule (``operators/ogg.py`` — the speech-corpus formats).
    Sample decode of the lossy codecs is not claimed, exactly as m14
    routes HEVC it cannot decode. The fixture rotates six codec legs
    across five containers, four sample rates, mono and stereo, and
    an 8-step length ladder, all id-derived via independent
    mixed-radix digits (no correlated-selector dead legs — pinned by
    a full codec × rate cross-coverage test), so the oracle
    recomputes relationally exactly what the parser must extract —
    parse ∘ synthesize == id, per payload, hash-matched. The
    self-reference loophole (parser and synthesizer sharing a bug) is
    narrowed by tests/test_flac.py: published CRC catalogue check
    values and an independently hand-assembled stream decoded
    correctly.

    Scale: pure metadata cost — bytes read per payload are the RIFF
    chunk headers / one 42-byte FLAC prefix / 4-to-27-byte frame and
    page headers; embarrassingly parallel in the same Arrow-batched
    stage every media op uses."""
    from ..operators import audio as au

    pin_semantics(spark)
    docs = load_table(spark, sf_dir, "documents")
    payloads = au.demo_audio_zoo_payloads(docs, "doc_id")
    return au.audio_stream_metadata(payloads).select(
        "id", "container", "codec", "sample_rate",
        "channels", "bits", "n_samples",
    )
