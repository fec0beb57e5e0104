"""Ingest scans (S1-S4): CSV with encoding detection, Excel, validation.

Reference semantics:
- S1 encoding detection: try utf-8, utf-8-sig, latin-1, cp1252, iso-8859-1
  in order on a head sample; first that decodes wins (``app/etl.py:15-36``)
- S2 CSV scan, header row = schema, every value a nullable string
  (``app/etl.py:942-944``)
- S3/S4 Excel scan + validation (``app/etl.py:970-993``, ``:670-699``):
  spark-excel isn't on this classpath, so Excel goes through a
  pandas/openpyxl bridge when openpyxl is importable, else a clear error.

The encoding probe is a driver-side peek at one small head sample —
the distributed read then uses the detected charset.
"""

from __future__ import annotations

import os
import zipfile

from pyspark.sql import DataFrame, SparkSession

ENCODING_CANDIDATES = ("utf-8", "utf-8-sig", "latin-1", "cp1252", "iso-8859-1")
ALLOWED_EXTENSIONS = {".csv", ".xlsx", ".xls"}


def detect_encoding(path: str, sample_bytes: int = 1024) -> str:
    """S1: first candidate encoding that decodes a head sample."""
    with open(path, "rb") as f:
        head = f.read(sample_bytes)
    for enc in ENCODING_CANDIDATES:
        try:
            head.decode(enc)
            return enc
        except (UnicodeDecodeError, ValueError):
            continue
    return "latin-1"  # decodes any byte sequence


def validate_upload_path(path: str) -> None:
    """F9/S4 pre-flight: extension whitelist + path-traversal guard."""
    ext = os.path.splitext(path)[1].lower()
    if ext not in ALLOWED_EXTENSIONS:
        raise ValueError(f"unsupported extension: {ext}")
    # check the RAW path segments: normpath would resolve '..' away and
    # let a traversal through
    if ".." in path.split(os.sep):
        raise ValueError("path traversal detected")


def validate_excel_file(path: str) -> None:
    """S4: zip magic + must contain xl/ entries."""
    if not zipfile.is_zipfile(path):
        raise ValueError("not a valid xlsx (zip magic missing)")
    with zipfile.ZipFile(path) as z:
        if not any(n.startswith("xl/") for n in z.namelist()):
            raise ValueError("not a valid xlsx (no xl/ entries)")


def read_csv_upload(spark: SparkSession, path: str, encoding: str | None = None) -> DataFrame:
    """S1+S2: all-string CSV read (schema inference off, like the reference)."""
    validate_upload_path(path)
    enc = encoding or detect_encoding(path)
    return (
        spark.read.option("header", True)
        .option("inferSchema", False)
        .option("encoding", enc)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def read_excel_upload(spark: SparkSession, path: str, sheet: int | str = 0) -> DataFrame:
    """S3 via pandas/openpyxl bridge (small uploads; spark-excel would take
    over for distributed reads on a real cluster)."""
    validate_upload_path(path)
    validate_excel_file(path)
    try:
        import pandas as pd  # noqa: PLC0415
        pdf = pd.read_excel(path, sheet_name=sheet, dtype=str)
    except ImportError as e:  # openpyxl not in this container
        raise NotImplementedError("Excel ingest requires openpyxl/spark-excel") from e
    return spark.createDataFrame(pdf.where(pdf.notna(), None))
