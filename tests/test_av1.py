"""multimodal/av1.py: OBU framing, sequence-header parse, av1C, MP4.

No AV1 encoder exists in this container (no libaom/SVT-AV1), so the
real-bitstream check is a HAND-ASSEMBLED spec-layout sequence header
built bit-by-bit with an independent packer — exercising the
multi-operating-point table, decoder-model block, screen-content
branches, and the reduced-still-picture layout our encoder never emits.
If a real libaom stream ever lands here, pin it like test_h264's x264
golden.
"""

from __future__ import annotations

import pytest

from pyp_etl_pipeline_spark.multimodal.av1 import (
    _leb128_decode,
    _leb128_encode,
    av1_sequence_header_encode,
    av1_sequence_header_parse,
    av1c_parse,
    av1c_record,
    mp4_av1_encode,
    mp4_av1c_extract,
)


def test_leb128_round_trip():
    for v in (0, 1, 127, 128, 300, 16383, 16384, 2**31, 2**56 - 1):
        enc = _leb128_encode(v)
        got, pos = _leb128_decode(enc, 0)
        assert (got, pos) == (v, len(enc))
    with pytest.raises(ValueError):
        _leb128_decode(b"\x80\x80", 0)  # truncated continuation


@pytest.mark.parametrize(
    "w,h,profile,level,tier,fps,hbd",
    [(1920, 1080, 0, 8, 1, 30, False), (1280, 720, 1, 5, 0, 60, False),
     (640, 360, 2, 12, 0, 24, True), (3840, 2160, 0, 16, 1, 50, False),
     (17, 23, 0, 0, 0, 25, False)],
)
def test_round_trip(w, h, profile, level, tier, fps, hbd):
    tu = av1_sequence_header_encode(w, h, profile, level, tier, fps=fps, high_bitdepth=hbd)
    got = av1_sequence_header_parse(tu)
    assert (got["width"], got["height"]) == (w, h)
    assert got["seq_profile"] == profile
    assert got["seq_level_idx"] == level
    assert got["seq_tier"] == (tier if level > 7 else 0)
    assert got["fps"] == float(fps)
    assert got["bit_depth"] == (10 if hbd else 8)
    # profile -> subsampling contract (0: 4:2:0, 1: 4:4:4, 2@10bit: 4:2:2)
    expect_sub = {0: (1, 1), 1: (0, 0), 2: (1, 0)}[profile]
    assert (got["chroma_sub_x"], got["chroma_sub_y"]) == expect_sub


class _Bits:
    """Independent bit packer (NOT the module's _BitWriter)."""

    def __init__(self):
        self.s = ""

    def u(self, n, v):
        self.s += format(v, f"0{n}b")

    def uvlc(self, v):
        b = format(v + 1, "b")
        self.s += "0" * (len(b) - 1) + b

    def tobytes(self):
        s = self.s + "1"
        s += "0" * (-len(s) % 8)
        return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


def _obu(payload: bytes, obu_type: int = 1) -> bytes:
    return bytes([(obu_type << 3) | 0b010]) + _leb128_encode(len(payload)) + payload


def test_hand_assembled_spec_golden():
    """A §5.5 sequence header written field-by-field from the spec:
    THREE operating points (12-bit idc, per-op level/tier), a decoder
    model with per-op operating parameters, initial display delay,
    frame-id numbers, explicit screen-content + integer-mv signalling,
    BT.2020/PQ colour description, and a 2-OBU temporal unit where a
    metadata OBU precedes the sequence header (the walk must skip it)."""
    b = _Bits()
    b.u(3, 0)        # seq_profile = 0
    b.u(1, 0)        # still_picture
    b.u(1, 0)        # reduced_still_picture_header
    b.u(1, 1)        # timing_info_present_flag
    b.u(32, 1001)    # num_units_in_display_tick
    b.u(32, 30000)   # time_scale
    b.u(1, 1)        # equal_picture_interval
    b.uvlc(0)        # num_ticks_per_picture_minus_1
    b.u(1, 1)        # decoder_model_info_present_flag
    b.u(5, 15)       # buffer_delay_length_minus_1 -> 16-bit delays
    b.u(32, 48000)   # num_units_in_decoding_tick
    b.u(5, 9)        # buffer_removal_time_length_minus_1
    b.u(5, 9)        # frame_presentation_time_length_minus_1
    b.u(1, 1)        # initial_display_delay_present_flag
    b.u(5, 2)        # operating_points_cnt_minus_1 = 2 -> 3 ops
    # op 0: level 9 (>7 so tier coded), decoder model + display delay
    b.u(12, 0)
    b.u(5, 9)
    b.u(1, 1)        # seq_tier[0] = 1
    b.u(1, 1)        # decoder_model_present_for_this_op
    b.u(16, 1234)    # decoder_buffer_delay
    b.u(16, 5678)    # encoder_buffer_delay
    b.u(1, 0)        # low_delay_mode_flag
    b.u(1, 1)        # initial_display_delay_present_for_this_op
    b.u(4, 3)        # initial_display_delay_minus_1
    # op 1: level 4 (<=7 so NO tier bit), no model, no delay
    b.u(12, 0x5A)
    b.u(5, 4)
    b.u(1, 0)        # decoder_model_present_for_this_op
    b.u(1, 0)        # initial_display_delay_present_for_this_op
    # op 2: level 11, tier 0, model present
    b.u(12, 0xFFF)
    b.u(5, 11)
    b.u(1, 0)        # seq_tier[2]
    b.u(1, 1)        # decoder_model_present_for_this_op
    b.u(16, 1)
    b.u(16, 2)
    b.u(1, 1)
    b.u(1, 0)        # initial_display_delay_present_for_this_op
    b.u(4, 11)       # frame_width_bits_minus_1 -> 12 bits
    b.u(4, 10)       # frame_height_bits_minus_1 -> 11 bits
    b.u(12, 1919)    # max_frame_width_minus_1  -> 1920
    b.u(11, 1079)    # max_frame_height_minus_1 -> 1080
    b.u(1, 1)        # frame_id_numbers_present_flag
    b.u(4, 5)        # delta_frame_id_length_minus_2
    b.u(3, 6)        # additional_frame_id_length_minus_1
    b.u(1, 0)        # use_128x128_superblock
    b.u(1, 1)        # enable_filter_intra
    b.u(1, 1)        # enable_intra_edge_filter
    b.u(1, 1)        # enable_interintra_compound
    b.u(1, 1)        # enable_masked_compound
    b.u(1, 1)        # enable_warped_motion
    b.u(1, 1)        # enable_dual_filter
    b.u(1, 1)        # enable_order_hint
    b.u(1, 1)        # enable_jnt_comp
    b.u(1, 1)        # enable_ref_frame_mvs
    b.u(1, 0)        # seq_choose_screen_content_tools = 0 -> explicit
    b.u(1, 1)        # seq_force_screen_content_tools = 1 (> 0)
    b.u(1, 0)        # seq_choose_integer_mv = 0 -> explicit
    b.u(1, 1)        # seq_force_integer_mv
    b.u(3, 7)        # order_hint_bits_minus_1
    b.u(1, 1)        # enable_superres
    b.u(1, 1)        # enable_cdef
    b.u(1, 1)        # enable_restoration
    # color_config: 8-bit, colour description BT.2020/PQ/BT.2020ncl
    b.u(1, 0)        # high_bitdepth
    b.u(1, 0)        # mono_chrome
    b.u(1, 1)        # color_description_present_flag
    b.u(8, 9)        # color_primaries = BT.2020
    b.u(8, 16)       # transfer = PQ
    b.u(8, 9)        # matrix = BT.2020 NCL
    b.u(1, 1)        # color_range
    b.u(2, 1)        # chroma_sample_position (profile 0 -> 4:2:0)
    b.u(1, 1)        # separate_uv_delta_q
    b.u(1, 1)        # film_grain_params_present

    meta_obu = _obu(b"\x04junk-metadata", obu_type=5)
    tu = meta_obu + _obu(b.tobytes(), obu_type=1)
    got = av1_sequence_header_parse(tu)
    assert got == {
        "seq_profile": 0,
        "seq_level_idx": 9,
        "seq_tier": 1,
        "width": 1920,
        "height": 1080,
        "bit_depth": 8,
        "mono_chrome": 0,
        "chroma_sub_x": 1,
        "chroma_sub_y": 1,
        "fps": 30000 / 1001.0,
    }


def test_reduced_still_picture_and_srgb_and_mono():
    """The reduced header layout (level only, no op table) plus the two
    color_config special cases: sRGB forces 4:4:4 with no color_range
    bit, and mono_chrome returns before separate_uv_delta_q."""
    # reduced + sRGB (profile 1 so mono_chrome is not coded)
    b = _Bits()
    b.u(3, 1)       # seq_profile = 1 (4:4:4)
    b.u(1, 1)       # still_picture
    b.u(1, 1)       # reduced_still_picture_header
    b.u(5, 0)       # seq_level_idx[0]
    b.u(4, 9)       # frame_width_bits_minus_1 -> 10 bits
    b.u(4, 9)       # frame_height_bits_minus_1
    b.u(10, 599)    # width 600
    b.u(10, 399)    # height 400
    b.u(1, 0)       # use_128x128_superblock
    b.u(1, 0)       # enable_filter_intra
    b.u(1, 0)       # enable_intra_edge_filter
    b.u(1, 0)       # enable_superres
    b.u(1, 0)       # enable_cdef
    b.u(1, 0)       # enable_restoration
    b.u(1, 0)       # high_bitdepth
    b.u(1, 1)       # color_description_present_flag
    b.u(8, 1)       # CP_BT_709
    b.u(8, 13)      # TC_SRGB
    b.u(8, 0)       # MC_IDENTITY
    b.u(1, 0)       # separate_uv_delta_q (sRGB path: no color_range bit)
    b.u(1, 0)       # film_grain_params_present
    got = av1_sequence_header_parse(_obu(b.tobytes()))
    assert (got["width"], got["height"]) == (600, 400)
    assert (got["chroma_sub_x"], got["chroma_sub_y"]) == (0, 0)
    assert got["seq_tier"] == 0 and got["fps"] is None

    # reduced + monochrome (profile 0): returns before separate_uv_delta_q
    b = _Bits()
    b.u(3, 0)
    b.u(1, 1)
    b.u(1, 1)       # reduced
    b.u(5, 2)
    b.u(4, 7)
    b.u(4, 7)
    b.u(8, 255)     # width 256
    b.u(8, 191)     # height 192
    b.u(1, 0)
    b.u(1, 0)
    b.u(1, 0)
    b.u(1, 0)
    b.u(1, 0)
    b.u(1, 0)
    b.u(1, 0)       # high_bitdepth
    b.u(1, 1)       # mono_chrome
    b.u(1, 0)       # color_description_present_flag
    b.u(1, 1)       # color_range — LAST color_config bit for mono
    b.u(1, 0)       # film_grain_params_present
    got = av1_sequence_header_parse(_obu(b.tobytes()))
    assert got["mono_chrome"] == 1
    assert (got["chroma_sub_x"], got["chroma_sub_y"]) == (1, 1)


def test_rejects_and_truncation():
    with pytest.raises(ValueError):
        av1_sequence_header_parse(b"\x80\x00")  # forbidden bit
    with pytest.raises(ValueError):
        av1_sequence_header_parse(_obu(b"\x00", obu_type=2))  # no seq header
    tu = av1_sequence_header_encode(1920, 1080)
    for cut in range(1, len(tu) - 1):
        with pytest.raises(ValueError):
            av1_sequence_header_parse(tu[:cut])


def test_av1c_round_trip_and_mismatch_detection():
    tu = av1_sequence_header_encode(1280, 720, 0, 9, 1, fps=60)
    rec = av1c_record(tu)
    got = av1c_parse(rec)
    assert (got["width"], got["height"], got["fps"]) == (1280, 720, 60.0)
    assert got["record_matches"] is True
    # corrupt the record's level field: cross-check must flag it
    bad = bytes([rec[0], (rec[1] & 0xE0) | 13]) + rec[2:]
    assert av1c_parse(bad)["record_matches"] is False
    with pytest.raises(ValueError):
        av1c_parse(b"\x01" + rec[1:])  # marker bit missing


def test_mp4_av1c_extract_and_dims_mismatch(spark):
    from pyp_etl_pipeline_spark.multimodal.av1 import av1_container_features

    mp4 = mp4_av1_encode(640, 360, 2000, fps=24)
    got = mp4_av1c_extract(mp4)
    assert (got["width"], got["height"], got["fps"]) == (640, 360, 24.0)
    bad = mp4_av1_encode(640, 360, 2000, display_width=642)
    assert mp4_av1c_extract(bad)["container_width"] == 642

    rows = [(0, mp4), (1, bad), (2, b"junk")]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in av1_container_features(df, permissive=True).collect()}
    assert out[0]["dims_match"] is True and out[0]["record_matches"] is True
    assert out[1]["dims_match"] is False
    assert out[2]["width"] is None and out[2]["error"]


def test_seq_features_operator(spark):
    from pyp_etl_pipeline_spark.multimodal.av1 import av1_seq_features

    rows = [
        (i, av1_sequence_header_encode(320 + i, 240 + i, i % 3, 8 + i, i % 2, fps=24 + i))
        for i in range(9)
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in av1_seq_features(df).collect()}
    for i in range(9):
        r = out[i]
        assert (r["width"], r["height"]) == (320 + i, 240 + i)
        assert r["seq_profile"] == i % 3
        assert r["seq_level_idx"] == 8 + i
        assert r["fps"] == 24.0 + i
