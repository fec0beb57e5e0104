"""multimodal/h265.py: HEVC SPS bit-parse, hvcC records, MP4 carriage.

No HEVC encoder exists in this container (no libav/x265), so the
real-bitstream check is a HAND-ASSEMBLED spec-layout SPS built bit-by-bit
below with an INDEPENDENT bit packer (not the module's _BitWriter) —
it deliberately exercises the branches our encoder never emits
(sub-layer profile_tier_level, scaling-list data, PCM, explicit +
inter-predicted short-term RPS, long-term pics, full VUI front matter).
If a real x265 stream ever lands in the container, pin it the way
test_h264's x264 golden is pinned.
"""

from __future__ import annotations

import pytest

from pyp_etl_pipeline_spark.multimodal.h265 import (
    hevc_sps_encode,
    hevc_sps_parse,
    hvcc_parse,
    hvcc_record,
    mp4_hevc_encode,
    mp4_hvcc_extract,
)


@pytest.mark.parametrize(
    "w,h,profile,level",
    [(1920, 1080, 1, 123), (1280, 720, 2, 120), (640, 480, 1, 93),
     (322, 242, 1, 63), (16, 16, 2, 30), (3840, 2160, 2, 153)],
)
def test_round_trip(w, h, profile, level):
    nal = hevc_sps_encode(w, h, profile_idc=profile, level_idc=level, fps=30)
    got = hevc_sps_parse(nal)
    assert got == {
        "profile_idc": profile,
        "tier": 0,
        "level_idc": level,
        "width": w,
        "height": h,
        "bit_depth": 8,
        "chroma_format_idc": 1,
        "fps": 30.0,
    }


class _Bits:
    """Independent bit packer for the hand golden (NOT h264._BitWriter)."""

    def __init__(self):
        self.s = ""

    def u(self, n, v):
        self.s += format(v, f"0{n}b")

    def ue(self, v):
        b = format(v + 1, "b")
        self.s += "0" * (len(b) - 1) + b

    def se(self, v):
        # exp-Golomb signed: k = 2v-1 for v>0, -2v for v<=0
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def tobytes(self):
        s = self.s + "1"  # rbsp stop bit
        s += "0" * (-len(s) % 8)
        return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


def test_hand_assembled_spec_golden():
    """A §7.3.2.2.1 SPS written field-by-field straight from the spec,
    exercising every skip branch: 2 sub-layers with per-sub-layer PTL,
    scaling-list data (pred-mode-0 matrices), PCM, an explicit + an
    inter-predicted st_ref_pic_set (the NumDeltaPocs-tracking arm),
    long-term ref pics, and VUI with extended SAR / overscan / signal
    type / chroma loc / display window before timing."""
    b = _Bits()
    b.u(4, 0)       # sps_video_parameter_set_id
    b.u(3, 1)       # sps_max_sub_layers_minus1 = 1
    b.u(1, 1)       # sps_temporal_id_nesting_flag
    # --- profile_tier_level(1, 1): general block
    b.u(2, 0)       # general_profile_space
    b.u(1, 1)       # general_tier_flag = HIGH tier
    b.u(5, 2)       # general_profile_idc = Main10
    b.u(32, 1 << 29)  # compatibility flags (bit 2)
    b.u(1, 1)       # progressive_source
    b.u(1, 0)       # interlaced_source
    b.u(1, 1)       # non_packed
    b.u(1, 1)       # frame_only
    b.u(32, 0)      # reserved 43 + inbld (upper)
    b.u(12, 0)      # reserved (lower)
    b.u(8, 150)     # general_level_idc = level 5.0
    # sub-layer flags for 1 sub-layer, then reserved to 8
    b.u(1, 1)       # sub_layer_profile_present_flag[0]
    b.u(1, 1)       # sub_layer_level_present_flag[0]
    b.u(14, 0)      # reserved_zero_2bits x (8 - 1)
    b.u(32, 0)      # sub-layer profile block: 88 bits of zeros
    b.u(32, 0)
    b.u(24, 0)
    b.u(8, 120)     # sub_layer_level_idc[0]
    # --- back to the SPS body
    b.ue(0)         # sps_seq_parameter_set_id
    b.ue(2)         # chroma_format_idc = 4:2:2 (SubWidthC 2, SubHeightC 1)
    b.ue(1928)      # pic_width_in_luma_samples
    b.ue(1088)      # pic_height_in_map... luma_samples
    b.u(1, 1)       # conformance_window_flag
    b.ue(0)         # left
    b.ue(4)         # right  -> 1928 - 2*4 = 1920
    b.ue(0)         # top
    b.ue(8)         # bottom -> 1088 - 1*8 = 1080 (4:2:2 crops luma rows)
    b.ue(2)         # bit_depth_luma_minus8 = 10-bit
    b.ue(2)         # bit_depth_chroma_minus8
    b.ue(4)         # log2_max_pic_order_cnt_lsb_minus4 (lsb bits = 8)
    b.u(1, 0)       # sps_sub_layer_ordering_info_present_flag = 0
    b.ue(5)         # dec_pic_buffering_minus1 (only i = maxSubLayers-1)
    b.ue(3)         # num_reorder
    b.ue(0)         # latency
    b.ue(0)         # log2_min_luma_coding_block_size_minus3
    b.ue(3)         # log2_diff_max_min
    b.ue(0)         # log2_min_tb_minus2
    b.ue(3)         # log2_diff_tb
    b.ue(2)         # max_transform_hierarchy_depth_inter
    b.ue(2)         # max_transform_hierarchy_depth_intra
    b.u(1, 1)       # scaling_list_enabled_flag
    b.u(1, 1)       # sps_scaling_list_data_present_flag
    for _sid in range(4):        # scaling_list_data: all pred-mode-0
        for _m in range(6 if _sid != 3 else 2):
            b.u(1, 0)            # scaling_list_pred_mode_flag
            b.ue(0)              # scaling_list_pred_matrix_id_delta
    b.u(1, 1)       # amp_enabled_flag
    b.u(1, 1)       # sample_adaptive_offset_enabled_flag
    b.u(1, 1)       # pcm_enabled_flag
    b.u(4, 7)       # pcm_sample_bit_depth_luma_minus1
    b.u(4, 7)       # pcm_sample_bit_depth_chroma_minus1
    b.ue(0)         # log2_min_pcm_luma_coding_block_size_minus3
    b.ue(2)         # log2_diff_max_min_pcm
    b.u(1, 1)       # pcm_loop_filter_disabled_flag
    b.ue(2)         # num_short_term_ref_pic_sets = 2
    # set 0: explicit, 1 negative + 0 positive
    b.ue(1)         # num_negative_pics
    b.ue(0)         # num_positive_pics
    b.ue(0)         # delta_poc_s0_minus1
    b.u(1, 1)       # used_by_curr_pic_s0_flag
    # set 1: inter-predicted from set 0 (NumDeltaPocs[0] = 1 -> 2 pairs)
    b.u(1, 1)       # inter_ref_pic_set_prediction_flag
    b.u(1, 0)       # delta_rps_sign
    b.ue(0)         # abs_delta_rps_minus1
    b.u(1, 1)       # used_by_curr_pic_flag[0]
    b.u(1, 0)       # used_by_curr_pic_flag[1]
    b.u(1, 1)       # use_delta_flag[1]
    b.u(1, 1)       # long_term_ref_pics_present_flag
    b.ue(1)         # num_long_term_ref_pics_sps
    b.u(8, 42)      # lt_ref_pic_poc_lsb_sps[0] (u(log2_max_poc_lsb) = u(8))
    b.u(1, 1)       # used_by_curr_pic_lt_sps_flag[0]
    b.u(1, 1)       # sps_temporal_mvp_enabled_flag
    b.u(1, 1)       # strong_intra_smoothing_enabled_flag
    b.u(1, 1)       # vui_parameters_present_flag
    b.u(1, 1)       # aspect_ratio_info_present_flag
    b.u(8, 255)     # Extended_SAR
    b.u(16, 4)      # sar_width
    b.u(16, 3)      # sar_height
    b.u(1, 1)       # overscan_info_present_flag
    b.u(1, 1)       # overscan_appropriate_flag
    b.u(1, 1)       # video_signal_type_present_flag
    b.u(3, 5)       # video_format
    b.u(1, 1)       # video_full_range_flag
    b.u(1, 1)       # colour_description_present_flag
    b.u(8, 9)       # colour_primaries (BT.2020)
    b.u(8, 16)      # transfer_characteristics (PQ)
    b.u(8, 9)       # matrix_coeffs
    b.u(1, 1)       # chroma_loc_info_present_flag
    b.ue(1)         # chroma_sample_loc_type_top_field
    b.ue(1)         # chroma_sample_loc_type_bottom_field
    b.u(1, 0)       # neutral_chroma_indication_flag
    b.u(1, 0)       # field_seq_flag
    b.u(1, 1)       # frame_field_info_present_flag
    b.u(1, 1)       # default_display_window_flag
    b.ue(1)
    b.ue(1)
    b.ue(1)
    b.ue(1)
    b.u(1, 1)       # vui_timing_info_present_flag
    b.u(32, 1001)   # vui_num_units_in_tick
    b.u(32, 60000)  # vui_time_scale  -> 59.94... fps
    b.u(1, 1)       # vui_poc_proportional_to_timing_flag
    b.ue(0)         # vui_num_ticks_poc_diff_one_minus1
    b.u(1, 0)       # vui_hrd_parameters_present_flag
    b.u(1, 0)       # sps_extension_present_flag

    from pyp_etl_pipeline_spark.multimodal.h264 import _emulation_prevent

    nal = bytes([33 << 1, 0x01]) + _emulation_prevent(b.tobytes())
    got = hevc_sps_parse(b"\x00\x00\x00\x01" + nal)
    assert got == {
        "profile_idc": 2,
        "tier": 1,
        "level_idc": 150,
        "width": 1920,
        "height": 1080,
        "bit_depth": 10,
        "chroma_format_idc": 2,
        "fps": 60000 / 1001.0,
    }


def test_encoder_emits_emulation_prevention():
    nal = hevc_sps_encode(640, 480, fps=25)[4:]
    # num_units_in_tick = 1000 produces 00 00 03 E8 only AFTER escaping
    assert b"\x00\x00\x03" in nal
    from pyp_etl_pipeline_spark.multimodal.h264 import _emulation_strip

    raw = _emulation_strip(nal[2:])
    assert len(raw) < len(nal) - 2  # at least one escape byte inserted


def test_rejects_non_sps():
    with pytest.raises(ValueError):
        hevc_sps_parse(b"\x00\x00\x00\x01\x40\x01\x0c")  # VPS NAL (type 32)
    with pytest.raises(ValueError):
        hevc_sps_parse(b"")
    # an H.264 SPS is not an HEVC SPS
    from pyp_etl_pipeline_spark.multimodal.h264 import sps_encode

    with pytest.raises(ValueError):
        hevc_sps_parse(sps_encode(640, 480))


def test_start_code_variants():
    nal = hevc_sps_encode(320, 240)
    bare = nal[4:]
    assert hevc_sps_parse(nal) == hevc_sps_parse(bare) == hevc_sps_parse(b"\x00\x00\x01" + bare)


def test_truncated_payloads_raise_valueerror():
    sps = hevc_sps_encode(1920, 1080, profile_idc=2)
    for cut in range(7, len(sps) - 1):
        with pytest.raises(ValueError):
            hevc_sps_parse(sps[:cut])
    rec = hvcc_record(sps[4:], profile_idc=2)
    sps_end = 23 + 3 + 2 + len(sps[4:])
    for cut in range(23, sps_end):
        with pytest.raises(ValueError):
            hvcc_parse(rec[:cut])


def test_hvcc_round_trip():
    sps = hevc_sps_encode(1280, 720, profile_idc=1, level_idc=123, fps=50)[4:]
    rec = hvcc_record(sps)
    got = hvcc_parse(rec)
    assert (got["width"], got["height"], got["fps"]) == (1280, 720, 50.0)
    assert got["n_arrays"] == 1
    with pytest.raises(ValueError):
        hvcc_record(b"\x40\x01", 1, 123)  # VPS where SPS expected
    with pytest.raises(ValueError):
        hvcc_parse(b"\x02" + rec[1:])  # wrong configurationVersion


def test_mp4_hvcc_extract_and_dims_mismatch():
    mp4 = mp4_hevc_encode(640, 360, 2000, fps=24)
    got = mp4_hvcc_extract(mp4)
    assert (got["width"], got["height"]) == (640, 360)
    assert (got["container_width"], got["container_height"]) == (640, 360)
    assert got["fps"] == 24.0
    bad = mp4_hevc_encode(640, 360, 2000, display_width=642)
    got = mp4_hvcc_extract(bad)
    assert got["container_width"] == 642 and got["width"] == 640


def test_sps_features_operator(spark):
    from pyp_etl_pipeline_spark.multimodal.h265 import hevc_sps_features

    rows = [(i, hevc_sps_encode(320 + 2 * i, 240 + 2 * i, profile_idc=1 + i % 2,
                                level_idc=60 + i, fps=24 + i)) for i in range(8)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in hevc_sps_features(df).collect()}
    for i in range(8):
        r = out[i]
        assert (r["width"], r["height"]) == (320 + 2 * i, 240 + 2 * i)
        assert r["profile_idc"] == 1 + i % 2
        assert r["fps"] == 24.0 + i


def test_container_features_operator_and_permissive(spark):
    from pyp_etl_pipeline_spark.multimodal.h265 import hevc_container_features

    good = mp4_hevc_encode(320, 240, 1000)
    rows = [(0, good), (1, good[: len(good) // 2]), (2, b"junk")]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in hevc_container_features(df, permissive=True).collect()}
    assert out[0]["width"] == 320 and out[0]["dims_match"] is True and out[0]["error"] is None
    for bad in (1, 2):
        assert out[bad]["width"] is None and out[bad]["error"]
