"""multimodal/vp9.py: keyframe uncompressed header, vpcC, MP4 carriage.

No VP9 encoder exists in this container (no libvpx/ffmpeg), so the
real-bitstream check is a HAND-ASSEMBLED spec-layout keyframe header
built bit-by-bit with an independent packer — exercising the profile-3
reserved bit, the CS_RGB forced-4:4:4 branch, explicit subsampling,
and the render-size-different branch our encoder rarely combines. If a
real libvpx stream ever lands here, pin it like test_h264's x264
golden.
"""

from __future__ import annotations

import pytest

from pyp_etl_pipeline_spark.multimodal.vp9 import (
    CS_RGB,
    VP9_SYNC_CODE,
    mp4_vp9_encode,
    mp4_vpcc_extract,
    vp9_frame_header_encode,
    vp9_frame_header_parse,
    vpcc_parse,
    vpcc_record,
)


@pytest.mark.parametrize(
    "w,h,profile,depth,cs,crange,sub",
    [
        (1920, 1080, 0, 8, 2, 0, (1, 1)),   # fixed 4:2:0, depth not coded
        (1280, 720, 1, 8, 2, 1, (0, 0)),    # explicit 4:4:4
        (640, 360, 1, 8, 2, 0, (1, 0)),     # explicit 4:2:2
        (320, 180, 2, 10, 2, 0, (1, 1)),    # ten_or_twelve_bit = 0
        (320, 180, 2, 12, 2, 1, (1, 1)),    # ten_or_twelve_bit = 1
        (257, 99, 3, 12, 2, 0, (0, 0)),     # profile-3 reserved bit
        (600, 400, 1, 8, CS_RGB, 1, (0, 0)),  # sRGB forces full-range 4:4:4
        (17, 23, 0, 8, 0, 1, (1, 1)),       # odd dims are legal in VP9
    ],
)
def test_round_trip(w, h, profile, depth, cs, crange, sub):
    hdr = vp9_frame_header_encode(
        w, h, profile=profile, bit_depth=depth, color_space=cs,
        color_range=crange, sub_x=sub[0], sub_y=sub[1],
    )
    got = vp9_frame_header_parse(hdr)
    assert (got["width"], got["height"]) == (w, h)
    assert got["profile"] == profile
    assert got["bit_depth"] == depth
    assert got["color_space"] == cs
    assert got["color_range"] == (1 if cs == CS_RGB else crange)
    assert (got["chroma_sub_x"], got["chroma_sub_y"]) == sub
    assert (got["render_width"], got["render_height"]) == (w, h)


def test_render_size_different():
    hdr = vp9_frame_header_encode(640, 360, render_width=1280, render_height=720)
    got = vp9_frame_header_parse(hdr)
    assert (got["width"], got["height"]) == (640, 360)
    assert (got["render_width"], got["render_height"]) == (1280, 720)


class _Bits:
    """Independent bit packer (NOT the module's _BitWriter)."""

    def __init__(self):
        self.s = ""

    def u(self, n, v):
        self.s += format(v, f"0{n}b")

    def tobytes(self):
        s = self.s + "0" * (-len(self.s) % 8)
        return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


def test_hand_assembled_spec_golden():
    """A §6.2 keyframe header written field-by-field from the spec:
    profile 3 (high bit + low bit + reserved bit), 12-bit, explicit
    4:2:2 subsampling, limited range, render size different — the
    maximal-width path through color_config and frame_size."""
    b = _Bits()
    b.u(2, 2)               # frame_marker
    b.u(1, 1)               # profile_low_bit  (profile 3 = 0b11)
    b.u(1, 1)               # profile_high_bit
    b.u(1, 0)               # reserved_zero (profile 3 only)
    b.u(1, 0)               # show_existing_frame
    b.u(1, 0)               # frame_type = KEY_FRAME
    b.u(1, 1)               # show_frame
    b.u(1, 1)               # error_resilient_mode
    b.u(24, VP9_SYNC_CODE)  # frame_sync_code 0x498342
    b.u(1, 1)               # ten_or_twelve_bit -> 12
    b.u(3, 4)               # color_space = CS_BT_2020
    b.u(1, 0)               # color_range = limited
    b.u(1, 1)               # subsampling_x
    b.u(1, 0)               # subsampling_y -> 4:2:2
    b.u(1, 0)               # reserved_zero
    b.u(16, 3839)           # frame_width_minus_1  -> 3840
    b.u(16, 2159)           # frame_height_minus_1 -> 2160
    b.u(1, 1)               # render_and_frame_size_different
    b.u(16, 1919)           # render_width_minus_1  -> 1920
    b.u(16, 1079)           # render_height_minus_1 -> 1080
    got = vp9_frame_header_parse(b.tobytes())
    assert got == {
        "profile": 3,
        "bit_depth": 12,
        "color_space": 4,
        "color_range": 0,
        "chroma_sub_x": 1,
        "chroma_sub_y": 0,
        "width": 3840,
        "height": 2160,
        "render_width": 1920,
        "render_height": 1080,
        "show_frame": 1,
    }


def test_rejects_and_truncation():
    with pytest.raises(ValueError):
        vp9_frame_header_parse(b"\x00\x00\x00")  # frame_marker != 2
    # show_existing_frame: marker(10) profile0(00) show_existing(1)
    b = _Bits()
    b.u(2, 2)
    b.u(2, 0)
    b.u(1, 1)
    b.u(3, 5)  # frame_to_show_map_idx
    with pytest.raises(ValueError, match="show-existing"):
        vp9_frame_header_parse(b.tobytes())
    # inter frame: frame_type = 1
    b = _Bits()
    b.u(2, 2)
    b.u(2, 0)
    b.u(1, 0)
    b.u(1, 1)  # NON_KEY_FRAME
    b.u(1, 1)
    b.u(1, 0)
    b.u(8, 0)
    with pytest.raises(ValueError, match="keyframe"):
        vp9_frame_header_parse(b.tobytes())
    # bad sync code
    b = _Bits()
    b.u(2, 2)
    b.u(2, 0)
    b.u(1, 0)
    b.u(1, 0)
    b.u(1, 1)
    b.u(1, 0)
    b.u(24, 0x123456)
    with pytest.raises(ValueError, match="sync"):
        vp9_frame_header_parse(b.tobytes())
    hdr = vp9_frame_header_encode(1920, 1080)
    for cut in range(1, len(hdr) - 3):  # minus the 2 filler bytes + pad
        with pytest.raises(ValueError):
            vp9_frame_header_parse(hdr[:cut])


def test_encode_validates_profile_coupling():
    with pytest.raises(ValueError):
        vp9_frame_header_encode(64, 64, profile=0, bit_depth=10)
    with pytest.raises(ValueError):
        vp9_frame_header_encode(64, 64, profile=2, bit_depth=8)
    with pytest.raises(ValueError):
        vp9_frame_header_encode(64, 64, profile=0, color_space=CS_RGB)
    with pytest.raises(ValueError):
        vp9_frame_header_encode(64, 64, profile=1, sub_x=1, sub_y=1)


def test_vpcc_round_trip_and_requirements():
    hdr = vp9_frame_header_encode(1280, 720, profile=2, bit_depth=10, color_range=1)
    rec = vpcc_record(hdr, level=41)
    got = vpcc_parse(rec)
    assert got["record_profile"] == 2
    assert got["record_level"] == 41
    assert got["record_bit_depth"] == 10
    assert (got["record_sub_x"], got["record_sub_y"]) == (1, 1)
    assert got["record_full_range"] == 1
    with pytest.raises(ValueError, match="level"):
        vpcc_record(hdr, level=43)
    with pytest.raises(ValueError, match="version"):
        vpcc_parse(b"\x02" + rec[1:])
    # codecInitializationDataSize != 0 violates the VP9 binding
    with pytest.raises(ValueError, match="codecInitializationDataSize"):
        vpcc_parse(rec[:-2] + b"\x00\x04")
    # RGB maps to identity matrix coefficients
    rgb = vpcc_record(
        vp9_frame_header_encode(64, 64, profile=1, color_space=CS_RGB), level=10
    )
    assert vpcc_parse(rgb)["matrix_coefficients"] == 0


def test_mp4_vpcc_extract_and_qa_flags(spark):
    from pyp_etl_pipeline_spark.multimodal.vp9 import vp9_container_features

    mp4 = mp4_vp9_encode(640, 360, 2000, profile=2, level=30, bit_depth=10)
    got = mp4_vpcc_extract(mp4)
    assert (got["width"], got["height"]) == (640, 360)
    assert got["record_level"] == 30
    assert got["bit_depth"] == 10
    assert got["record_matches"] is True
    bad = mp4_vp9_encode(640, 360, 2000, display_width=642, display_height=362)
    assert mp4_vpcc_extract(bad)["container_width"] == 642

    # record-vs-stream drift: swap in a record claiming profile 1 while
    # the mdat frame stays profile 0 — the cross-check must flag it
    wrong_rec = vpcc_record(vp9_frame_header_encode(640, 360, profile=1), level=10)
    right_rec = vpcc_record(vp9_frame_header_encode(640, 360, profile=0), level=10)
    assert len(wrong_rec) == len(right_rec)
    drift = mp4_vp9_encode(640, 360, 2000, profile=0, level=10).replace(
        right_rec, wrong_rec
    )
    got_drift = mp4_vpcc_extract(drift)
    assert got_drift["profile"] == 0  # stream truth
    assert got_drift["record_matches"] is False

    rows = [(0, mp4), (1, bad), (2, b"junk")]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in vp9_container_features(df, permissive=True).collect()}
    assert out[0]["dims_match"] is True and out[0]["record_matches"] is True
    assert out[1]["dims_match"] is False
    assert out[2]["width"] is None and out[2]["error"]


def test_frame_features_operator(spark):
    from pyp_etl_pipeline_spark.multimodal.vp9 import vp9_frame_features

    rows = [
        (i, vp9_frame_header_encode(320 + i, 240 + i, profile=i % 2, color_range=i % 2))
        for i in range(9)
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in vp9_frame_features(df).collect()}
    for i in range(9):
        r = out[i]
        assert (r["width"], r["height"]) == (320 + i, 240 + i)
        assert r["profile"] == i % 2
        assert r["color_range"] == i % 2
