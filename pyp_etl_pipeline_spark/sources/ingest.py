"""Ingest scans (S1-S4): CSV with encoding detection, Excel, validation.

Reference semantics:
- S1 encoding detection: try utf-8, utf-8-sig, latin-1, cp1252, iso-8859-1
  in order on a head sample; first that decodes wins (``app/etl.py:15-36``)
- S2 CSV scan, header row = schema, every value a nullable string
  (``app/etl.py:942-944``)
- S3/S4 Excel scan + validation (``app/etl.py:970-993``, ``:670-699``):
  a self-contained stdlib zip+XML xlsx parser (``sources/xlsx.py``) —
  no openpyxl/spark-excel dependency needed for the reference's primary
  upload format.

The encoding probe is a driver-side peek at one small head sample —
the distributed read then uses the detected charset.
"""

from __future__ import annotations

import os
import zipfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

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


MAX_EXCEL_BYTES = 16 * 1024 * 1024  # reference upload envelope (app/config.py:36)


def read_excel_upload(
    spark: SparkSession, path: str, sheet: int | str = 0, max_bytes: int | None = MAX_EXCEL_BYTES
) -> DataFrame:
    """S3: all-string Excel read via the self-contained stdlib xlsx parser
    (``sources/xlsx.py`` — zip + XML, no openpyxl dependency). Mirrors the
    reference's openpyxl scan (``app/etl.py:970-993``): first row =
    headers, values as-is; all columns nullable strings like the CSV path
    so both feed the same normalization chain. Empty header cells become
    ``col_<i>`` and duplicate headers get a ``_<i>`` suffix — a DataFrame
    needs distinct non-empty column names where the reference's positional
    row access did not.

    Scale envelope (deliberate): the workbook parses on the DRIVER and
    ships via ``createDataFrame`` — correct for the reference's upload
    contract (Flask caps requests at 16 MiB, ``app/config.py:36``, so a
    spreadsheet is by definition driver-sized) and enforced here with the
    same ``max_bytes`` cap rather than discovered via an OOM. A many-GB
    xlsx is not a thing this source accepts; bulk data belongs to the
    distributed CSV/parquet readers (``max_bytes=None`` opts out for
    callers that really mean it). Legacy ``.xls`` (BIFF) is accepted by
    extension but rejected by the zip check — faithfully reproducing the
    reference, whose openpyxl reader cannot parse true BIFF either
    (``app/etl.py:972``)."""
    from pyp_etl_pipeline_spark.sources.xlsx import parse_xlsx  # noqa: PLC0415

    validate_upload_path(path)
    if max_bytes is not None:
        size = os.path.getsize(path)
        if size > max_bytes:
            raise ValueError(
                f"xlsx is {size} bytes > the {max_bytes}-byte upload envelope "
                "(reference MAX_CONTENT_LENGTH); this source parses on the "
                "driver by design — use the distributed CSV/parquet readers "
                "for bulk data, or pass max_bytes=None to override"
            )
    validate_excel_file(path)
    headers, rows = parse_xlsx(path, sheet=sheet)
    if not headers:
        raise ValueError("xlsx sheet is empty (no header row)")
    names = _dataframe_column_names(headers)
    fields = ", ".join(f"`{n}` string" for n in names)
    return spark.createDataFrame(rows, schema=fields)


def _dataframe_column_names(headers: list[str]) -> list[str]:
    """Empty header cells -> ``col_<i>``, duplicates -> ``_<i>`` suffix —
    shared by the driver-side and distributed Excel paths so both yield
    identical schemas."""
    names: list[str] = []
    seen: set[str] = set()
    for i, h in enumerate(headers):
        name = (h or "").strip() or f"col_{i}"
        if name in seen:
            name = f"{name}_{i}"
        seen.add(name)
        names.append(name)
    return names


def read_excel_distributed(
    spark: SparkSession,
    path: str,
    sheet: int | str = 0,
    rows_per_task: int = 50_000,
) -> DataFrame:
    """S3 at cluster scale: the same worksheet -> all-string DataFrame
    contract as ``read_excel_upload``, but with the PARSE distributed —
    byte-identical output (pinned in tests), no driver materialization.

    The driver does only planning-weight work: resolve the sheet part,
    one streaming row COUNT (no values materialized), and a 1-row read
    for the header. Data rows are split into ``rows_per_task``-sized
    ranges; each (path, part, start, end) task re-opens the workbook on
    an EXECUTOR and streams exactly its slice via the stdlib parser
    (``xlsx.read_rows_slice`` — picklable pure python, Arrow-batched out
    through mapInPandas). A multi-GB sheet therefore costs the driver
    one SAX-style pass for the count and the cluster one parse spread
    over ceil(n/rows_per_task) tasks, instead of OOMing the driver the
    way a createDataFrame of the whole sheet would.

    Honest limits: xlsx is a zip, so a task cannot SEEK to its row range
    — each task streams the sheet from the top and discards rows before
    ``start`` (cheap SAX skimming; the quadratic term is parse-only, no
    value materialization). And the shared-strings part loads per task,
    as in any xlsx reader. For many-file corpora, call this per file and
    union — tasks from different files parallelize perfectly.
    """
    from pyp_etl_pipeline_spark.sources.xlsx import (  # noqa: PLC0415
        count_sheet_rows,
        read_rows_slice,
        resolve_sheet_part,
    )

    validate_upload_path(path)
    validate_excel_file(path)
    path = os.path.abspath(path)  # executors must not depend on driver cwd
    part = resolve_sheet_part(path, sheet)
    n_rows = count_sheet_rows(path, part)
    if n_rows == 0:
        raise ValueError("xlsx sheet is empty (no header row)")
    header_rows = read_rows_slice(path, part, 0, 1)
    headers = [(h if h is not None else "") for h in header_rows[0]]
    names = _dataframe_column_names(headers)
    width = len(names)
    schema = StructType([StructField(n, StringType(), True) for n in names])
    tasks = [
        (path, part, start, min(start + rows_per_task, n_rows))
        for start in range(1, n_rows, rows_per_task)
    ]
    if not tasks:
        return spark.createDataFrame([], schema)

    # worker-side import bootstrap: executors of a BARE session launched
    # from a foreign cwd (the driver's plain session) don't have the repo
    # on sys.path, and the module import inside the closure resolves
    # by reference — capture the path as a string and insert it first
    # (the same contract every mapInPandas codec here follows; the r11
    # plain-session gate caught xl01 failing without it)
    repo_root = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))

    def parse_slices(batches):  # pragma: no cover — runs on executors
        import sys  # noqa: PLC0415

        if repo_root not in sys.path:
            sys.path.insert(0, repo_root)
        import pandas as pd  # noqa: PLC0415

        from pyp_etl_pipeline_spark.sources.xlsx import read_rows_slice as slice_fn  # noqa: PLC0415

        for pdf in batches:
            for task in pdf.itertuples(index=False):
                rows = slice_fn(task.path, task.part, int(task.start), int(task.end))
                padded = [r[:width] + [None] * (width - len(r)) for r in rows]
                yield pd.DataFrame(
                    {names[i]: [r[i] for r in padded] for i in range(width)},
                    dtype=object,
                )

    task_df = spark.createDataFrame(
        tasks, "path string, part string, start long, end long"
    ).repartition(len(tasks))
    return task_df.mapInPandas(parse_slices, schema)


JSONL_EXTENSIONS = {".jsonl", ".ndjson", ".json"}


def read_jsonl_upload(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    corrupt_col: str = "_corrupt_record",
):
    """JSONL/NDJSON corpus scan — the interchange format of LLM data
    pipelines (one JSON document per line; extension tier, no reference
    counterpart — the reference ingests CSV/Excel uploads only).

    Distributed line-splittable read via ``spark.read.json``; ``.gz``
    members are decompressed transparently by the Hadoop codec (gzip is
    not splittable — at 100 TB ship many shard files, which this reader
    accepts as a directory/glob path, never one giant archive).

    Pass ``schema`` (DDL string) in production: with ``schema=None``
    Spark runs a FULL extra inference pass over the data before the real
    scan — fine for an upload-sized file, a wasted 100 TB read on a
    corpus. PERMISSIVE mode routes malformed lines into ``corrupt_col``
    (schema reads must declare it to capture them) instead of failing
    the job, matching the engine's stray-payload contract elsewhere.
    """
    base = path
    for suffix in (".gz",):
        if base.endswith(suffix):
            base = base[: -len(suffix)]
    ext = os.path.splitext(base)[1].lower()
    if ext and ext not in JSONL_EXTENSIONS:
        raise ValueError(f"not a jsonl upload: {ext}")
    if ".." in path.split(os.sep):
        raise ValueError("path traversal detected")
    reader = (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
    )
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)
