"""Report sinks (S10/S11) and reset (S12).

Reference semantics: three CSV audit reports — processed rows, errors,
created nodes (``app/report_utils.py:17-265``) — plus a per-row error CSV
(``app/routes.py:461-485``). Here each report is a DataFrame written with
``coalesce(1)`` for a single human-readable artifact (the audit file is
small by construction; the data path never coalesces).
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_report_csv(df: DataFrame, out_dir: str, single_file: bool = True) -> None:
    """S10: audit CSV (header, overwrite)."""
    w = df.coalesce(1) if single_file else df
    w.write.mode("overwrite").option("header", True).csv(out_dir)


def write_error_report(errors: DataFrame, out_dir: str, row_col: str = "row_id", error_col: str = "error") -> None:
    """S11: (Row, Error) CSV of validation failures."""
    write_report_csv(errors.select(F.col(row_col).alias("Row"), F.col(error_col).alias("Error")), out_dir)


def truncate_dir(path: str) -> None:
    """S12: clear a staging directory (overwrite-style reset)."""
    shutil.rmtree(path, ignore_errors=True)
