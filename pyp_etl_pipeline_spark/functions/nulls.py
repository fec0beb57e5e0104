"""Sentinel-null predicates (F1).

Reference semantics (``app/etl.py:141-158``): a value is invalid iff it is
NULL, float NaN, or its lowercased/trimmed form is one of
``'', 'null', 'none', 'n/a', 'na', 'nan'``.

Pure column expressions — JVM-side, codegen-friendly, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from pyp_etl_pipeline_spark.schema import SENTINEL_NULLS


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def is_invalid_value(c: Column | str) -> Column:
    """True iff the (string) value is a sentinel null / missing."""
    c = _col(c)
    return c.isNull() | F.lower(F.trim(c)).isin(*SENTINEL_NULLS)


def is_valid_value(c: Column | str) -> Column:
    return ~is_invalid_value(c)


def null_normalize(c: Column | str) -> Column:
    """Trim and map sentinel nulls to real NULLs."""
    c = _col(c)
    return F.when(is_invalid_value(c), F.lit(None).cast("string")).otherwise(F.trim(c))
