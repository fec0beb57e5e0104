"""Multi-value cell explode + per-group dedup (E1/E2, U1).

Reference semantics:
- E1: split cells on ``[;,]`` into one item row per fragment
  (``app/etl.py:1217``), four kinds from four columns
  (``app/etl.py:1381-1384``)
- T7: trim fragments, drop empty/sentinel fragments (``app/etl.py:1222-1226``)
- E2: case-insensitive within-(row, kind) dedup (``app/etl.py:1219-1237``)
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyp_etl_pipeline_spark.functions.nulls import is_valid_value
from pyp_etl_pipeline_spark.schema import ITEM_KIND_COLUMNS

SPLIT_PATTERN = "[;,]"


def split_multi_value(c: Column | str) -> Column:
    """E1: multi-value string cell -> array of trimmed non-empty fragments."""
    c = F.col(c) if isinstance(c, str) else c
    frags = F.transform(F.split(c, SPLIT_PATTERN), lambda x: F.trim(x))
    return F.filter(frags, lambda x: x != F.lit(""))


def explode_items(
    df: DataFrame,
    key_cols: Iterable[str],
    kind_columns: dict[str, str] | None = None,
    dedup: bool = True,
) -> DataFrame:
    """E1+U1(+E2): explode each kind column into (keys..., kind, item) rows.

    One ``stack``-style union of kind-tagged frames; dedup is
    case-insensitive per (keys, kind).
    """
    kind_columns = kind_columns or ITEM_KIND_COLUMNS
    # absent kind columns behave as all-empty (the reference iterates a
    # fixed kind list but missing spreadsheet columns simply yield nothing)
    kind_columns = {k: c for k, c in kind_columns.items() if c in df.columns}
    if not kind_columns:
        raise ValueError("no item-kind columns present in the input")
    key_cols = list(key_cols)
    parts = []
    for kind, col_name in kind_columns.items():
        part = (
            df.filter(is_valid_value(col_name))
            .select(*key_cols, F.lit(kind).alias("kind"), F.explode(split_multi_value(col_name)).alias("item"))
            .filter(is_valid_value("item"))
        )
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    if dedup:
        out = out.withColumn("_k", F.lower(F.col("item"))).dropDuplicates([*key_cols, "kind", "_k"]).drop("_k")
    return out
