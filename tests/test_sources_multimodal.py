"""Ingest sources (S1-S4, encoding detection, validation), report sinks
(S10-S12), and multimodal binary plumbing (mapInPandas feature extraction,
resize metadata, frame-sample plan)."""

from __future__ import annotations

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from pyp_etl_pipeline_spark.multimodal import binary_ops
from pyp_etl_pipeline_spark.sources import ingest, reports


# ------------------------------------------------------------------ ingest

def test_detect_encoding_utf8(tmp_path):
    p = tmp_path / "a.csv"
    p.write_text("name,city\nCafé,Köln\n", encoding="utf-8")
    assert ingest.detect_encoding(str(p)) == "utf-8"


def test_detect_encoding_latin1(tmp_path):
    p = tmp_path / "b.csv"
    p.write_bytes("name\nCaf\xe9\n".encode("latin-1"))
    # 0xE9 alone is invalid utf-8 -> falls through to latin-1
    assert ingest.detect_encoding(str(p)) == "latin-1"


def test_read_csv_upload_nonutf8_branch(spark, tmp_path):
    """Round 12 regression: detect_encoding returns the PYTHON codec
    name 'latin-1', which Spark 4's CSV charset whitelist rejects —
    read_csv_upload must normalize it to iso-8859-1 or the whole S1
    fallback branch raises INVALID_PARAMETER_VALUE.CHARSET. Certifies
    byte-exact accent round-trip through the auto-detected read, and
    the explicit-encoding path through the same normalization."""
    p = tmp_path / "legacy.csv"
    p.write_bytes("name,city\nCaf\xe9,K\xf6ln\n\xc9lan,Z\xfcrich\n".encode("latin-1"))
    df = ingest.read_csv_upload(spark, str(p))  # auto-detect -> latin-1
    rows = {r["name"]: r["city"] for r in df.collect()}
    assert rows == {"Café": "Köln", "Élan": "Zürich"}
    df2 = ingest.read_csv_upload(spark, str(p), encoding="cp1252")
    assert {r["name"] for r in df2.collect()} == {"Café", "Élan"}


def test_validate_upload_path_rejects():
    with pytest.raises(ValueError):
        ingest.validate_upload_path("/tmp/evil.exe")
    with pytest.raises(ValueError):
        ingest.validate_upload_path("/tmp/../etc/passwd.csv")
    ingest.validate_upload_path("/tmp/ok.csv")  # no raise


def test_read_csv_upload_all_strings(spark, tmp_path):
    p = tmp_path / "m.csv"
    p.write_text("Business Name,Products\nAcme,\"a;b\"\nBeta,\n", encoding="utf-8")
    df = ingest.read_csv_upload(spark, str(p))
    assert [f.dataType.simpleString() for f in df.schema.fields] == ["string", "string"]
    rows = {r["Business Name"]: r["Products"] for r in df.collect()}
    assert rows == {"Acme": "a;b", "Beta": None}


def test_validate_excel_file_rejects_nonzip(tmp_path):
    p = tmp_path / "fake.xlsx"
    p.write_text("not a zip")
    with pytest.raises(ValueError):
        ingest.validate_excel_file(str(p))


# ------------------------------------------------------------------ reports

def test_write_report_csv_single_file(spark, tmp_path):
    df = spark.createDataFrame([("a", 1), ("b", 2)], "name string, n int")
    out = str(tmp_path / "report")
    reports.write_report_csv(df, out)
    files = [f for f in os.listdir(out) if f.endswith(".csv")]
    assert len(files) == 1  # coalesced to one part like the reference's CSV
    content = open(os.path.join(out, files[0])).read()
    assert content.startswith("name,n")


def test_truncate_dir(spark, tmp_path):
    df = spark.createDataFrame([(1,)], "x int")
    out = str(tmp_path / "t")
    reports.write_report_csv(df, out)
    reports.truncate_dir(out)
    assert not os.path.exists(out)


# --------------------------------------------------------------- multimodal

@pytest.fixture()
def media(spark):
    rows = [
        (1, "image", b"\x89PNG fake bytes", ("image/png", 640, 480, None)),
        (2, "audio", b"RIFF fake wav", ("audio/wav", None, None, 2500)),
        (3, "video", b"\x00\x00ftyp fake mp4", ("video/mp4", 1920, 1080, 3500)),
        (4, "image", None, ("image/png", 1, 1, None)),
    ]
    return spark.createDataFrame(rows, binary_ops.MEDIA_SCHEMA)


def test_extract_features_deterministic(media):
    out = {r["media_id"]: r for r in binary_ops.extract_features(media).collect()}
    assert len(out) == 4
    payload = b"\x89PNG fake bytes"
    assert out[1]["n_bytes"] == len(payload)
    assert out[1]["checksum"] == hashlib.md5(payload).hexdigest()
    assert out[1]["byte_stat0"] == (sum(payload) % 997) / 997.0
    # a MISSING payload yields NULL features (not md5('')/0 — r8 contract)
    assert out[4]["n_bytes"] is None and out[4]["byte_stat0"] is None
    assert out[4]["checksum"] is None and out[4]["kind"] is not None


def test_decode_real_is_stubbed():
    with pytest.raises(NotImplementedError):
        binary_ops.decode_real(b"x", "image")


def test_resize_images_real_pixels(spark, media):
    from pyp_etl_pipeline_spark.multimodal import codecs

    # real 4x4 gradient PNG: v(x, y) = 10x + 40y
    rows = [[10 * x + 40 * y for x in range(4)] for y in range(4)]
    real = spark.createDataFrame(
        [(7, codecs.png_encode_gray_pixels(rows))], "media_id long, payload binary"
    )
    out = binary_ops.resize_images(real, 2, 2).collect()
    assert len(out) == 1 and out[0]["width"] == 2 and out[0]["height"] == 2
    px, w, h, bpp = codecs.png_decode_pixels(bytes(out[0]["payload"]))
    assert (w, h, bpp) == (2, 2, 1)
    # nearest-neighbor picks src (x*4 DIV 2, y*4 DIV 2) = (0,0),(2,0),(0,2),(2,2)
    assert [[int(px[y, x]) for x in range(2)] for y in range(2)] == [[0, 20], [80, 100]]
    # fake / corrupt payloads drop (stray-tolerant decode contract)
    assert binary_ops.resize_images(media, 2, 2).count() == 0


def test_png_pixel_stats_roundtrip(spark):
    from pyp_etl_pipeline_spark.multimodal import codecs

    rows = [[1, 2], [3, 4]]
    df = spark.createDataFrame(
        [(1, codecs.png_encode_gray_pixels(rows))], "media_id long, payload binary"
    )
    r = binary_ops.png_pixel_stats(df).collect()[0]
    assert (r["width"], r["height"], r["n_px"]) == (2, 2, 4)
    assert r["pix_sum"] == 10
    assert r["pix_checksum"] == 1 * 1 + 2 * 2 + 3 * 3 + 4 * 4


def test_frame_sample_plan(media):
    frames = binary_ops.frame_sample_plan(media, every_ms=1000).collect()
    # only the video row; 3500ms -> frames at 0,1000,2000
    assert {r["media_id"] for r in frames} == {3}
    assert sorted(r["frame_ts_ms"] for r in frames) == [0, 1000, 2000]


# ------------------------------------------------------- audit report bundle

def test_build_audit_reports_and_zip(spark, tmp_path):
    import os
    import zipfile

    resolution = spark.createDataFrame(
        [("product", "Vitamin C", "P1", "Vitamin C", 100.0, "auto_resolve"),
         ("product", "Mystery", None, None, 20.0, "reject")],
        "kind string, item string, matched_id string, matched_title string, score double, band string",
    )
    invalid = spark.createDataFrame([("BadCo", "invalid email")], "businessName string, error string")
    new_dims = {"product": spark.createDataFrame([("New Thing", "gen:abc")], "title string, ext_id string")}

    processed, errors, created = reports.build_audit_reports("upload1.csv", resolution, invalid, new_dims)
    assert processed.columns[0] == "Submission Name" and len(processed.columns) == 14
    assert errors.columns == [
        "Submission Name", "Business Name", "Error Type", "Error Category",
        "Error Message", "Item Type", "Item Name", "Row Number", "Timestamp",
    ]
    rows = {r["Original Item Name"]: r for r in processed.collect()}
    assert rows["Vitamin C"]["Decision Status"] == "auto_resolve"
    assert rows["Mystery"]["Ignored"] is True
    assert created.collect()[0]["Node Type"] == "product"

    dirs = {}
    for name, df in [("processed_rows", processed), ("errors", errors), ("created_nodes", created)]:
        d = str(tmp_path / name)
        reports.write_report_csv(df, d)
        dirs[name] = d
    out_zip = str(tmp_path / "reports.zip")
    reports.zip_reports(out_zip, dirs)
    with zipfile.ZipFile(out_zip) as z:
        assert sorted(z.namelist()) == ["created_nodes.csv", "errors.csv", "processed_rows.csv"]


def test_read_jsonl_upload_schema_and_gz(spark, tmp_path):
    import gzip

    lines = [
        '{"doc_id": 1, "text": "hello", "lang": "en"}',
        '{"doc_id": 2, "text": "welt", "lang": "de"}',
    ]
    p = tmp_path / "corpus.jsonl"
    p.write_text("\n".join(lines))
    gz = tmp_path / "corpus.jsonl.gz"
    gz.write_bytes(gzip.compress(("\n".join(lines)).encode()))

    ddl = "doc_id long, text string, lang string"
    for src in (p, gz):
        df = ingest.read_jsonl_upload(spark, str(src), schema=ddl)
        rows = {r["doc_id"]: r for r in df.collect()}
        assert set(rows) == {1, 2} and rows[2]["lang"] == "de"


def test_read_jsonl_upload_corrupt_lines_do_not_fail(spark, tmp_path):
    p = tmp_path / "c.ndjson"
    p.write_text('{"doc_id": 1, "text": "ok"}\n{oops not json\n{"doc_id": 2, "text": "ok2"}')
    ddl = "doc_id long, text string, _corrupt_record string"
    out = ingest.read_jsonl_upload(spark, str(p), schema=ddl).collect()
    good = [r for r in out if r["doc_id"] is not None]
    bad = [r for r in out if r["_corrupt_record"] is not None]
    assert len(good) == 2 and len(bad) == 1


def test_read_jsonl_upload_rejects_wrong_extension(spark, tmp_path):
    p = tmp_path / "c.csv"
    p.write_text("a,b\n1,2\n")
    with pytest.raises(ValueError, match="not a jsonl"):
        ingest.read_jsonl_upload(spark, str(p))


# ------------------------------------------- video plugin seam (plugins.py)

class _ToyInterFrameDecoder:
    """Test-only backend exercising the DISPATCH plumbing (registration,
    format claim, frame grid, stray tolerance) — explicitly synthetic;
    the production path without a registered backend keeps raising
    NotImplementedError (no fake decode ships)."""

    container_formats = ("mkv",)

    def decode_frames(self, payload):
        import numpy as np

        if len(payload) < 8:
            raise ValueError("truncated")
        # 3 frames, 20x10, 1 s apart; pixel value = frame index
        for i in range(3):
            yield i, i * 1000.0, np.full((10, 20, 3), i, dtype="uint8")


MKV_MAGIC = b"\x1a\x45\xdf\xa3" + b"\x00" * 16


@pytest.fixture()
def _clean_video_registry():
    from pyp_etl_pipeline_spark.multimodal import plugins

    plugins.clear_video_decoders()
    yield
    plugins.clear_video_decoders()


def test_interframe_video_raises_without_backend(_clean_video_registry):
    with pytest.raises(NotImplementedError, match="plugins.py"):
        binary_ops.decode_real(MKV_MAGIC, "video")


def test_video_plugin_dispatch(spark, _clean_video_registry):
    from pyp_etl_pipeline_spark.multimodal import plugins

    plugins.register_video_decoder(_ToyInterFrameDecoder())
    meta = binary_ops.decode_real(MKV_MAGIC, "video")
    assert meta == {
        "format": "mkv", "width": 20, "height": 10, "n_frames": 3, "duration_ms": 2000.0,
    }
    # registry state does NOT travel driver -> Python worker, so the
    # distributed path takes an explicitly injected decoder: a class
    # defined HERE (nested, no module-level bases) pickles by value
    # into the worker closure
    class _NestedToy:
        container_formats = ("mkv",)

        def decode_frames(self, payload):
            import numpy as np

            if len(payload) < 8:
                raise ValueError("truncated")
            for i in range(3):
                yield i, i * 1000.0, np.full((10, 20, 3), i, dtype="uint8")

    df = spark.createDataFrame(
        [(1, "video", MKV_MAGIC), (2, "video", b"\x1a\x45\xdf\xa3"[:3]), (3, "video", None)],
        "media_id long, kind string, payload binary",
    )
    rows = sorted(
        binary_ops.sample_frames_decoded(df, every_ms=1000, decoder=_NestedToy()).collect(),
        key=lambda r: (r["media_id"], r["frame_ts_ms"]),
    )
    # only media 1 decodes: 2 sampled frames (duration 2000 ms / 1000 ms)
    assert [(r["media_id"], r["frame_idx"], r["frame_ts_ms"]) for r in rows] == [
        (1, 0, 0), (1, 1, 1000),
    ]
    assert rows[0]["width"] == 20 and rows[0]["height"] == 10
    assert rows[1]["mean_val"] == 1.0


def test_pyav_backend_registers_when_available(_clean_video_registry):
    pytest.importorskip("av", reason="libav/PyAV not on this image — seam stays honest")
    from pyp_etl_pipeline_spark.multimodal import plugins

    assert plugins.try_register_pyav()
    assert plugins.get_video_decoder("mp4") is not None
