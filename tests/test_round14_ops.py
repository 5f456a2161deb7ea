"""Round-14 fixes and operators:

- codec-zoo rotation selectors derived from the qualifying-row index
  (round-13 advice: ``id % 4`` over ``id % 10 == 0`` rows never hit
  the avc1/hvc1 legs, and the profile alternator was constant);
- ClaimTableCoordinator publishes all-or-nothing (round-13 advice:
  a bare copyfile created the published manifest name non-atomically
  and a mid-copy failure left a torn target on disk while releasing
  the claim);
- parse_hevc_sps reads the sub-layer profile/level present flags
  INTERLEAVED per sub-layer (ISO/IEC 23008-2 §7.3.3 — round-13
  advice: two separate runs mis-skip temporally scalable streams
  with >=2 sub-layers and mixed flags);
- read_training_shards: the merge-on-read consumer of
  append_training_shards — post-append replay == the manifest's
  (seed, corpus) order;
- externally-derived AVC/HEVC SPS fixtures (hand-assembled bit
  layouts, not synthesize_* output) breaking the
  parse∘synthesize==id self-reference.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from onechronos_etl_takehome_spark.sources import txlog


class TestCodecZooCoverage:
    def test_all_four_legs_and_both_profiles_reachable(self, spark):
        """ids 0..150 step 10 → qualifying index j = 0..15: kind
        j % 4 rotates all four container/codec legs and alt
        (j // 4) % 2 alternates the profile WITHIN each codec —
        the round-13 advice found kind = id % 4 stuck on {0, 2}
        (and the profile selector constant), leaving the avcC/hvcC
        parse path with zero end-to-end coverage."""
        from onechronos_etl_takehome_spark.operators import video as vid

        df = spark.range(0, 160).select(F.col("id").alias("doc_id"))
        meta = vid.video_stream_metadata(
            vid.demo_codec_zoo_payloads(df, "doc_id")
        )
        legs = {
            (r["container"], r["codec"], r["profile_idc"])
            for r in meta.collect()
        }
        assert ("mp4", "avc", 66) in legs
        assert ("mp4", "avc", 100) in legs
        assert ("mp4", "hevc", 1) in legs
        assert ("mp4", "hevc", 2) in legs
        assert ("mp4", "mjpeg", None) in legs
        assert ("avi", "mjpeg", None) in legs


class TestAtomicClaimPublish:
    def test_torn_copy_never_leaves_a_published_target(
        self, tmp_path, monkeypatch
    ):
        """A copy that dies mid-stream (partial bytes written, then
        raises) must leave NO file under the published name — readers
        list the log dir and json.load whatever they see, so a torn
        manifest is data corruption. The pre-fix code copied straight
        onto the target: the partial file stayed AND the release
        guard ('if not exists(target)') then kept the claim held,
        wedging the version."""
        import onechronos_etl_takehome_spark.sources.txlog as txmod

        c = txlog.ClaimTableCoordinator()
        tmp = str(tmp_path / "m")
        target = str(tmp_path / "00000005.json")
        with open(tmp, "w") as f:
            f.write('{"w": 1}')
        real = txmod.shutil.copyfile
        state = {"fail": True}

        def torn(src, dst):
            if state["fail"]:
                state["fail"] = False
                with open(dst, "w") as fh:
                    fh.write('{"w')  # partial bytes, then die
                raise OSError("connection reset mid-copy")
            return real(src, dst)

        monkeypatch.setattr(txmod.shutil, "copyfile", torn)
        with pytest.raises(OSError):
            c.publish(tmp, target)
        # all-or-nothing: no torn target, no staging litter
        assert not os.path.exists(target)
        assert [p for p in os.listdir(tmp_path) if ".staging" in p] == []
        # and the claim was released: the retry publishes full bytes
        c.publish(tmp, target)
        with open(target) as f:
            assert f.read() == '{"w": 1}'

    def test_success_leaves_exact_bytes_and_no_staging(self, tmp_path):
        c = txlog.ClaimTableCoordinator()
        tmp = str(tmp_path / "m")
        target = str(tmp_path / "00000009.json")
        body = '{"actions": [], "v": 9}'
        with open(tmp, "w") as f:
            f.write(body)
        c.publish(tmp, target)
        with open(target) as f:
            assert f.read() == body
        assert [p for p in os.listdir(tmp_path) if ".staging" in p] == []
        # staging names are invisible to the version lister even if
        # one were orphaned by a crash between copy and rename
        with open(
            str(tmp_path / ".00000010.json.dead.staging"), "w"
        ) as f:
            f.write("{")
        assert txlog.committed_versions(str(tmp_path)) == []


def _hevc_sps_with_sub_layers(
    width: int, height: int, flag_pairs: list[tuple[int, int]]
) -> bytes:
    """Hand-assemble an HEVC SPS whose profile_tier_level carries
    ``len(flag_pairs)`` sub-layers with the given (profile_present,
    level_present) flags — laid out INTERLEAVED per ISO/IEC 23008-2
    §7.3.3, which synthesize_hevc_sps never emits (it always writes
    sps_max_sub_layers_minus1 = 0), so the parser is exercised on a
    layout the engine's own writer cannot produce."""
    from onechronos_etl_takehome_spark.operators.avc import _BitWriter

    n = len(flag_pairs)
    w = _BitWriter()
    w.u(0, 4)  # sps_video_parameter_set_id
    w.u(n, 3)  # sps_max_sub_layers_minus1
    w.u(1, 1)  # sps_temporal_id_nesting_flag
    w.u(0, 2)  # general_profile_space
    w.u(0, 1)  # general_tier_flag
    w.u(1, 5)  # general_profile_idc = Main
    w.u(1 << 30, 32)  # compatibility flags
    w.u(0, 48)  # constraint flags
    w.u(93, 8)  # general_level_idc = 3.1
    for p, lv in flag_pairs:  # the interleaved present flags
        w.u(p, 1)
        w.u(lv, 1)
    if n > 0:  # reserved_zero_2bits only when sub-layers exist
        for _ in range(8 - n):
            w.u(0, 2)
    for p, lv in flag_pairs:  # per-sub-layer blocks, in order
        if p:
            w.u(0, 88)  # sub_layer profile block
        if lv:
            w.u(63, 8)  # sub_layer_level_idc
    w.ue(0)  # sps_seq_parameter_set_id
    w.ue(1)  # chroma_format_idc 4:2:0
    w.ue(width)
    w.ue(height)
    w.u(0, 1)  # conformance_window_flag
    w.ue(0)  # bit_depth_luma_minus8
    w.ue(0)  # bit_depth_chroma_minus8
    w.ue(4)  # log2_max_pic_order_cnt_lsb_minus4
    return bytes([33 << 1, 1]) + w.bytes()


class TestHevcSubLayerInterleave:
    @pytest.mark.parametrize(
        "pairs",
        [
            # bit stream 1,1,0,0: a two-run reader sees
            # profile=[1,1] / level=[0,0] and over-skips 80 bits
            [(1, 1), (0, 0)],
            # bit stream 0,0,1,1: a two-run reader sees
            # profile=[0,0] / level=[1,1] and under-skips 80 bits
            [(0, 0), (1, 1)],
            # three sub-layers, mixed
            [(1, 0), (0, 1), (1, 1)],
        ],
    )
    def test_mixed_flags_parse_exact_dimensions(self, pairs):
        from onechronos_etl_takehome_spark.operators import avc

        sps = _hevc_sps_with_sub_layers(640, 480, pairs)
        m = avc.parse_hevc_sps(sps)
        assert (m["width"], m["height"]) == (640, 480)
        assert (m["profile_idc"], m["level_idc"]) == (1, 93)
        assert m["chroma_format_idc"] == 1

    def test_no_sub_layers_unchanged(self):
        from onechronos_etl_takehome_spark.operators import avc

        m = avc.parse_hevc_sps(_hevc_sps_with_sub_layers(354, 288, []))
        assert (m["width"], m["height"]) == (354, 288)
