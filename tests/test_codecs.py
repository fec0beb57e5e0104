"""Pure-python PNG/WAV codec tests: round-trips through the minimal
encoders, hand-built PNGs exercising every scanline filter type and the
RGB path, WAV chunk-walk edge cases, and the decode_features operator."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from pyp_etl_pipeline_spark.multimodal import binary_ops, codecs
from pyp_etl_pipeline_spark.multimodal.binary_ops import decode_features, decode_real


def _chunk(tag: bytes, data: bytes) -> bytes:
    return struct.pack(">I", len(data)) + tag + data + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)


def _png_from_scanlines(width, height, color_type, scanlines: bytes) -> bytes:
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return codecs.PNG_MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(scanlines)) + _chunk(b"IEND", b"")


def test_png_roundtrip_gray():
    p = codecs.png_encode_gray(5, 3, 200)
    d = codecs.png_decode(p)
    assert (d["width"], d["height"], d["mean_val"]) == (5, 3, 200.0)
    assert codecs.sniff_kind(p) == "png"


def test_png_sub_filter():
    # filter 1 (Sub): raw deltas [10, 5, 5] -> pixels [10, 15, 20]
    p = _png_from_scanlines(3, 1, 0, b"\x01" + bytes([10, 5, 5]))
    assert codecs.png_decode(p)["mean_val"] == pytest.approx(15.0)


def test_png_up_filter():
    # row0 none [10, 20]; row1 Up deltas [1, 2] -> [11, 22]
    p = _png_from_scanlines(2, 2, 0, b"\x00" + bytes([10, 20]) + b"\x02" + bytes([1, 2]))
    assert codecs.png_decode(p)["mean_val"] == pytest.approx((10 + 20 + 11 + 22) / 4)


def test_png_average_filter():
    # row0 none [100, 100]; row1 Average: x0 = 10 + (0+100)//2 = 60,
    # x1 = 0 + (60+100)//2 = 80
    p = _png_from_scanlines(2, 2, 0, b"\x00" + bytes([100, 100]) + b"\x03" + bytes([10, 0]))
    assert codecs.png_decode(p)["mean_val"] == pytest.approx((100 + 100 + 60 + 80) / 4)


def test_png_paeth_filter():
    # row0 none [50, 60]; row1 Paeth: x0 pred=b=50 -> 55; x1 a=55,b=60,c=50
    # p=65 -> pa=10,pb=5,pc=15 -> pred=b=60 -> 62
    p = _png_from_scanlines(2, 2, 0, b"\x00" + bytes([50, 60]) + b"\x04" + bytes([5, 2]))
    assert codecs.png_decode(p)["mean_val"] == pytest.approx((50 + 60 + 55 + 62) / 4)


def test_png_rgb():
    # 2x1 RGB, filter 0: pixels (255,0,0), (0,0,255)
    p = _png_from_scanlines(2, 1, 2, b"\x00" + bytes([255, 0, 0, 0, 0, 255]))
    d = codecs.png_decode(p)
    assert d["color_type"] == 2
    assert d["mean_val"] == pytest.approx(510 / 6)


def test_png_rejects_unsupported():
    with pytest.raises(ValueError, match="signature"):
        codecs.png_decode(b"JFIF not a png")
    ihdr16 = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    p16 = codecs.PNG_MAGIC + _chunk(b"IHDR", ihdr16)
    with pytest.raises(ValueError, match="bit depth"):
        codecs.png_decode(p16)


def test_wav_roundtrip_rms():
    samples = [0, 100, -100, 100, -100, 0, 0, 0]
    p = codecs.wav_encode_pcm16(samples, rate=8000)
    d = codecs.wav_decode(p)
    assert d["n_channels"] == 1 and d["sample_rate"] == 8000
    assert d["n_samples"] == 8
    assert d["duration_ms"] == pytest.approx(1.0)
    assert d["rms"] == pytest.approx(np.sqrt(np.mean(np.array(samples, dtype=np.float64) ** 2)))
    assert codecs.sniff_kind(p) == "wav"


def test_wav_rejects_non_pcm():
    p = bytearray(codecs.wav_encode_pcm16([1, 2, 3]))
    # patch the audio-format field (offset: RIFF(12) + 'fmt '(4) + len(4))
    struct.pack_into("<H", p, 20, 3)  # IEEE float
    with pytest.raises(ValueError, match="audio format"):
        codecs.wav_decode(bytes(p))


def test_decode_real_dispatch():
    png = codecs.png_encode_gray(2, 2, 7)
    assert decode_real(png, "image")["format"] == "png"
    wav = codecs.wav_encode_pcm16([0, 1])
    assert decode_real(wav, "audio")["format"] == "wav"
    # JPEG now decodes natively; a truncated jpeg-ish stream is a decode
    # ERROR (it IS a jpeg by magic), not an unsupported format
    with pytest.raises(ValueError, match="JPEG"):
        decode_real(b"\xff\xd8\xff\xe0 jpeg-ish", "image")
    # MP4 container metadata now decodes natively; a truncated ftyp-ish
    # stream is a decode ERROR (it IS mp4 by magic), not unsupported
    with pytest.raises(ValueError, match="box"):
        decode_real(b"\x00\x00\x00\x18ftypmp42", "video")
    assert decode_real(codecs.mp4_encode(8, 6, 250), "video")["format"] == "mp4"
    # genuinely unsupported format (GIF) still raises the honest stub
    with pytest.raises(NotImplementedError, match="libav"):
        decode_real(b"GIF89a" + b"\x00" * 10, "image")


def test_decode_features_operator(spark):
    rows = [
        (1, codecs.png_encode_gray(4, 2, 128)),
        (2, codecs.wav_encode_pcm16([1000] * 80, rate=8000)),
        (3, b"not media at all"),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in decode_features(df).collect()}
    png = out[1]
    assert (png["format"], png["width"], png["height"], png["mean_val"]) == ("png", 4, 2, 128.0)
    wav = out[2]
    assert wav["format"] == "wav"
    assert wav["duration_ms"] == pytest.approx(10.0)
    assert wav["rms"] == pytest.approx(1000.0)
    stray = out[3]
    assert stray["format"] is None and stray["width"] is None and stray["rms"] is None


# ------------------------------------------------------------------ JPEG

def test_jpeg_roundtrip_lossless_solid():
    from pyp_etl_pipeline_spark.multimodal import codecs

    for (w, h, v) in [(1, 1, 0), (8, 8, 255), (17, 9, 77), (24, 12, 128), (100, 50, 200)]:
        p = codecs.jpeg_encode_gray(w, h, v)
        assert codecs.sniff_kind(p) == "jpeg"
        d = codecs.jpeg_decode(p)
        assert (d["width"], d["height"]) == (w, h)
        assert d["n_components"] == 1 and d["precision"] == 8
        assert not d["progressive"]
        # DC quant step 8 stores the flat-fill DC exactly -> lossless mean
        assert d["mean_val"] == v


def test_jpeg_header_only_foreign_stream():
    """Dims must parse for JPEGs we did NOT emit: a hand-built
    progressive (SOF2) 3-component header — the typical camera/web
    shape. mean_val stays None (no full pixel decode), dims are real."""
    import struct

    from pyp_etl_pipeline_spark.multimodal import codecs

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    sof2 = struct.pack(">BHHB", 8, 480, 640, 3) + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    payload = (
        b"\xff\xd8"
        + seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + seg(0xE1, b"Exif\x00\x00" + b"\x00" * 32)  # APP1 padding survives the walk
        + seg(0xC2, sof2)
        + b"\xff\xd9"
    )
    d = codecs.jpeg_decode(payload)
    assert (d["width"], d["height"]) == (640, 480)
    assert d["n_components"] == 3
    assert d["progressive"] is True
    assert d["mean_val"] is None


def test_jpeg_rejects_non_jpeg():
    import pytest as _pytest

    from pyp_etl_pipeline_spark.multimodal import codecs

    with _pytest.raises(ValueError, match="not a JPEG"):
        codecs.jpeg_decode(b"\x89PNG\r\n\x1a\nxxxx")


def test_decode_real_jpeg_no_longer_stubbed():
    from pyp_etl_pipeline_spark.multimodal import binary_ops, codecs

    p = codecs.jpeg_encode_gray(9, 5, 42)
    d = binary_ops.decode_real(p, "image")
    assert d["format"] == "jpeg" and (d["width"], d["height"]) == (9, 5)
    assert d["mean_val"] == 42


def test_mp4_roundtrip_metadata():
    from pyp_etl_pipeline_spark.multimodal import codecs

    p = codecs.mp4_encode(1920, 1080, 90500)
    assert codecs.sniff_kind(p) == "mp4"
    d = codecs.mp4_decode(p)
    assert d["brand"] == "isom"
    assert (d["width"], d["height"]) == (1920, 1080)
    assert d["duration_ms"] == 90500.0
    assert d["n_tracks"] == 1


def test_mp4_version1_mvhd():
    # 64-bit (version 1) mvhd layout: timescale at +20, duration as u64
    import struct

    from pyp_etl_pipeline_spark.multimodal import codecs

    mvhd = codecs._box(
        b"mvhd",
        bytes([1, 0, 0, 0])          # version 1
        + struct.pack(">QQ", 0, 0)   # 64-bit creation/modification
        + struct.pack(">IQ", 90000, 90000 * 7)  # timescale, duration (7s)
        + b"\x00" * 80,
    )
    payload = codecs._box(b"ftyp", b"isom" + b"\x00" * 4) + codecs._box(b"moov", mvhd)
    d = codecs.mp4_decode(payload)
    assert d["duration_ms"] == 7000.0
    assert d["n_tracks"] == 0 and d["width"] is None


def test_mp4_truncated_and_foreign_raise():
    import pytest as _pytest

    from pyp_etl_pipeline_spark.multimodal import codecs

    p = codecs.mp4_encode(64, 48, 1000)
    with _pytest.raises(ValueError):
        codecs.mp4_decode(p[: len(p) // 2])
    with _pytest.raises(ValueError, match="ftyp"):
        codecs.mp4_decode(b"RIFFxxxxWAVE")


def test_decode_features_mp4_and_stray(spark):
    # a valid MP4, a corrupt MP4 (magic intact, body truncated), and a
    # random blob through the Arrow batch: nulls for the strays, real
    # values for the good row, batch never fails
    from pyp_etl_pipeline_spark.multimodal import binary_ops, codecs

    good = codecs.mp4_encode(320, 240, 4500)
    rows = [(1, bytearray(good)), (2, bytearray(good[:30])), (3, bytearray(b"\x00" * 40))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in binary_ops.decode_features(df).collect()}
    assert out[1]["format"] == "mp4"
    assert (out[1]["width"], out[1]["height"], out[1]["duration_ms"]) == (320, 240, 4500.0)
    assert out[2]["format"] == "mp4" and out[2]["width"] is None
    assert out[3]["format"] is None and out[3]["width"] is None


def test_frame_sample_decoded_from_payload(spark):
    from pyp_etl_pipeline_spark.multimodal import binary_ops, codecs

    rows = [
        (1, "video", bytearray(codecs.mp4_encode(640, 480, 3200))),  # 3 frames
        (2, "video", bytearray(codecs.mp4_encode(640, 480, 500))),   # <1s -> 1 frame
        (3, "image", None),                                           # filtered by kind
        (4, "video", bytearray(b"nonsense-payload-not-mp4")),         # stray -> dropped
    ]
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    out = sorted(
        (r["media_id"], r["frame_ts_ms"])
        for r in binary_ops.frame_sample_decoded(df, every_ms=1000).collect()
    )
    assert out == [(1, 0), (1, 1000), (1, 2000), (2, 0)]


def test_wav_decode_zcr_and_peak():
    from pyp_etl_pipeline_spark.multimodal.codecs import wav_decode, wav_encode_pcm16

    # alternating sign every sample -> zcr 1.0; peak = 300
    d = wav_decode(wav_encode_pcm16([100, -200, 300, -100], 8000))
    assert d["zcr"] == 1.0 and d["peak"] == 300
    # constant positive -> zcr 0.0
    d = wav_decode(wav_encode_pcm16([5, 5, 5], 8000))
    assert d["zcr"] == 0.0 and d["peak"] == 5
    # zero counts as non-negative: 0 -> -1 is a crossing, -1 -> 0 too
    d = wav_decode(wav_encode_pcm16([0, -1, 0], 8000))
    assert d["zcr"] == 1.0


def test_avi_mjpeg_roundtrip_golden():
    """Golden values through the full container + frame decode chain:
    encode known solid fills -> RIFF walk -> per-frame JPEG decode."""
    p = codecs.avi_mjpeg_encode(16, 8, [10, 200, 37], fps=4)
    assert codecs.sniff_kind(p) == "avi"
    d = codecs.avi_mjpeg_decode(p)
    assert (d["width"], d["height"], d["codec"]) == (16, 8, "MJPG")
    assert (d["fps_num"], d["fps_den"], d["n_frames"]) == (4, 1, 3)
    assert d["duration_ms"] == pytest.approx(750.0)
    means = [codecs.jpeg_decode(f)["mean_val"] for f in d["frames"]]
    assert means == [10.0, 200.0, 37.0]
    # decode_real dispatches AVI natively now (no frames key in features)
    feat = decode_real(p, "video")
    assert feat["format"] == "avi" and feat["duration_ms"] == pytest.approx(750.0)
    # truncated AVI-ish stream is a decode error, not unsupported
    with pytest.raises(ValueError, match="AVI"):
        codecs.avi_mjpeg_decode(b"RIFF\x00\x00\x00\x00AVX ")


def test_sample_frames_decoded_golden(spark):
    """The sampled-frame operator must pick the grid-aligned frame and
    decode its true pixels: 6 frames at 4 fps sampled every 500 ms ->
    ts 0/500/1000 -> frame idx 0/2/4; strays and inter-frame video skip."""
    fills = [11, 22, 33, 44, 55, 66]
    rows = [
        (1, "video", codecs.avi_mjpeg_encode(6, 4, fills, fps=4)),
        (2, "video", codecs.mp4_encode(8, 6, 2000)),  # inter-frame: skipped
        (3, "video", b"junk"),
        (4, "image", codecs.png_encode_gray(2, 2, 9)),  # not video: filtered
    ]
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    got = sorted(
        (r["media_id"], r["frame_idx"], r["frame_ts_ms"], r["width"], r["height"], r["mean_val"])
        for r in binary_ops.sample_frames_decoded(df, every_ms=500).collect()
    )
    assert got == [
        (1, 0, 0, 6, 4, 11.0),
        (1, 2, 500, 6, 4, 33.0),
        (1, 4, 1000, 6, 4, 55.0),
    ]


def test_hadamard_spectrum_golden(spark):
    """WHT band energies from real WAV bytes: DC-only signal puts ALL
    energy in band 0; a maximally-alternating signal puts it in the top
    band; Parseval (sum of energies = 64 * sum of squares) holds."""
    import pandas as pd

    from pyp_etl_pipeline_spark.multimodal.binary_ops import hadamard_spectrum
    from pyp_etl_pipeline_spark.multimodal.codecs import wav_encode_pcm16

    const = wav_encode_pcm16([100] * 64, 8000)        # DC
    alt = wav_encode_pcm16([100 * (1 - 2 * (j % 2)) for j in range(64)], 8000)  # fastest alternation
    df = spark.createDataFrame(
        pd.DataFrame({"media_id": [1, 2], "payload": [const, alt]}),
        "media_id long, payload binary",
    )
    out = {(r["media_id"], r["band"]): r["energy"] for r in hadamard_spectrum(df).collect()}
    total = 64 * 64 * 100 * 100  # Parseval: sum_f H_f^2 = N * sum_j x_j^2
    assert out[(1, 0)] == total and all(out[(1, b)] == 0 for b in range(1, 8))
    # the (-1)^j alternation is itself a Walsh basis row, so its whole
    # energy lands in exactly ONE coefficient (natural-order row 1's
    # band); pure tones stay pure through the transform
    nz = [(b, e) for (m, b), e in out.items() if m == 2 and e != 0]
    assert len(nz) == 1 and nz[0][1] == total


def test_dhash_from_real_png_pixels(spark):
    import pandas as pd

    from pyp_etl_pipeline_spark.multimodal.binary_ops import dhash_features
    from pyp_etl_pipeline_spark.multimodal.codecs import png_encode_gray_pixels

    # horizontal ramp: every left->right gradient positive -> all 64 bits set
    ramp = png_encode_gray_pixels([[x * 10 for x in range(16)]] * 8)
    flat = png_encode_gray_pixels([[50] * 16] * 8)
    near = png_encode_gray_pixels(
        [[x * 10 + (1 if (x, y) == (0, 0) else 0) for x in range(16)] for y in range(8)]
    )
    df = spark.createDataFrame(
        pd.DataFrame({"media_id": [1, 2, 3], "payload": [ramp, flat, near]}),
        "media_id long, payload binary",
    )
    out = {r["media_id"]: r for r in dhash_features(df).collect()}
    assert out[1]["n_gradient_bits"] == 64
    assert out[1]["dhash_lo"] == (1 << 32) - 1 and out[1]["dhash_hi"] == (1 << 32) - 1
    assert out[2]["n_gradient_bits"] == 0 and out[2]["dhash_lo"] == 0
    # a one-pixel perturbation moves the hash by at most a few bits
    ham = bin(out[1]["dhash_lo"] ^ out[3]["dhash_lo"]).count("1") + bin(
        out[1]["dhash_hi"] ^ out[3]["dhash_hi"]
    ).count("1")
    assert ham <= 2


def test_gif_lzw_roundtrip_and_container():
    """Full GIF round-trip: genuine LZW (variable code widths, KwKwK,
    CLEAR resets) + container walk. The large random image forces
    12-bit codes AND the 4096-entry dictionary reset path."""
    import random

    import numpy as np

    from pyp_etl_pipeline_spark.multimodal.codecs import (
        gif_decode,
        gif_decode_pixels,
        gif_encode_gray_pixels,
        gif_lzw_compress,
        gif_lzw_decompress,
        sniff_kind,
    )

    rows = [[(3 * x + 7 * y + 11) % 256 for x in range(16)] for y in range(8)]
    payload = gif_encode_gray_pixels(rows)
    assert sniff_kind(payload) == "gif"
    px, w, h = gif_decode_pixels(payload)
    assert (w, h) == (16, 8) and (px == np.array(rows)).all()
    d = gif_decode(payload)
    assert d["sum_pixels"] == int(np.array(rows).sum())

    random.seed(41)
    big = [[random.randrange(256) for _ in range(90)] for _ in range(90)]
    px2, w2, h2 = gif_decode_pixels(gif_encode_gray_pixels(big))
    assert (w2, h2) == (90, 90) and (px2 == np.array(big)).all()

    # raw LZW stream round-trip at a small min_code_size (width growth path)
    random.seed(42)
    idx = bytes(random.randrange(4) for _ in range(5000))
    assert gif_lzw_decompress(gif_lzw_compress(idx, 2), 2) == idx

    # KwKwK corner: aaaa... produces the c == len(table) case immediately
    run = b"\x00" * 500
    assert gif_lzw_decompress(gif_lzw_compress(run, 2), 2) == run


def test_gif_color_palette_luminance_and_malformed():
    """A color (non-gray) palette maps through integer luminance; and
    malformed payloads raise ValueError (never garbage pixels)."""
    import struct

    import pytest as _pytest

    from pyp_etl_pipeline_spark.multimodal.codecs import (
        gif_decode_pixels,
        gif_encode_gray_pixels,
        gif_lzw_compress,
    )

    # hand-built 4-color GIF: red, green, blue, white; indices 0..3
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
    data = gif_lzw_compress(bytes([0, 1, 2, 3]), 2)
    payload = (
        b"GIF89a" + struct.pack("<HH", 2, 2) + bytes([0x81, 0, 0]) + pal
        + b"\x2c" + struct.pack("<HHHH", 0, 0, 2, 2) + b"\x00"
        + bytes([2, len(data)]) + data + b"\x00\x3b"
    )
    px, w, h = gif_decode_pixels(payload)
    lum = [(255 * 299) // 1000, (255 * 587) // 1000, (255 * 114) // 1000,
           (255 * 299 + 255 * 587 + 255 * 114) // 1000]
    assert px.reshape(-1).tolist() == lum

    with _pytest.raises(ValueError, match="magic"):
        gif_decode_pixels(b"NOTAGIF" + b"\x00" * 20)
    good = gif_encode_gray_pixels([[1, 2], [3, 4]])
    with _pytest.raises((ValueError, IndexError, struct.error)):
        gif_decode_pixels(good[:20])  # truncated before image data


def test_gif_pixel_stats_operator(spark):
    """gif_pixel_stats decodes REAL bytes; the position-weighted
    checksum detects a transposed image; NULL/stray payloads yield
    NULL stats."""
    import numpy as np
    import pandas as pd

    from pyp_etl_pipeline_spark.multimodal.binary_ops import gif_pixel_stats
    from pyp_etl_pipeline_spark.multimodal.codecs import gif_encode_gray_pixels

    rows = [[(x * 5 + y) % 256 for x in range(6)] for y in range(3)]
    transposed = [list(r) for r in np.array(rows).T.tolist()]
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [1, 2, 3, 4],
                "payload": [
                    gif_encode_gray_pixels(rows),
                    gif_encode_gray_pixels(transposed),
                    b"junk bytes",
                    None,
                ],
            }
        ),
        "media_id long, payload binary",
    )
    out = {r["media_id"]: r for r in gif_pixel_stats(df).collect()}
    a = np.array(rows, dtype=np.int64).reshape(-1)
    wts = np.arange(1, a.size + 1)
    assert out[1]["sum_pixels"] == int(a.sum())
    assert out[1]["checksum"] == int((wts * a).sum() % 1_000_000_007)
    assert out[2]["sum_pixels"] == out[1]["sum_pixels"]  # same multiset
    assert out[2]["checksum"] != out[1]["checksum"]  # different layout
    assert out[3]["sum_pixels"] is None and out[4]["checksum"] is None


def test_gif_animation_roundtrip_and_frame_stats(spark):
    """Animated GIF: every frame + GCE delay round-trips; the frame
    stats operator emits one row per frame with exact stats; a stray
    payload contributes zero rows."""
    import numpy as np
    import pandas as pd

    from pyp_etl_pipeline_spark.multimodal.binary_ops import gif_frame_stats
    from pyp_etl_pipeline_spark.multimodal.codecs import (
        gif_decode_frames,
        gif_decode_pixels,
        gif_encode_gray_animation,
    )

    frames = [
        [[(3 * x + 7 * y + 13 * f) % 256 for x in range(10)] for y in range(6)]
        for f in range(4)
    ]
    payload = gif_encode_gray_animation(frames, delay_cs=12)
    got = gif_decode_frames(payload)
    assert len(got) == 4
    for f, g in zip(frames, got):
        assert (g["pixels"] == np.array(f)).all()
        assert g["delay_cs"] == 12 and (g["width"], g["height"]) == (10, 6)
    # first-frame API reads the animation's first frame
    px, w, h = gif_decode_pixels(payload)
    assert (px == np.array(frames[0])).all()

    df = spark.createDataFrame(
        pd.DataFrame({"media_id": [1, 2], "payload": [payload, b"nope"]}),
        "media_id long, payload binary",
    )
    rows = gif_frame_stats(df).collect()
    assert sorted(r["frame_idx"] for r in rows) == [0, 1, 2, 3]
    assert all(r["media_id"] == 1 and r["delay_cs"] == 12 for r in rows)
    for r in rows:
        a = np.array(frames[r["frame_idx"]], dtype=np.int64).reshape(-1)
        wts = np.arange(1, a.size + 1)
        assert r["sum_pixels"] == int(a.sum())
        assert r["checksum"] == int((wts * a).sum() % 1_000_000_007)
