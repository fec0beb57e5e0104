"""As-of join: match each left row to the most recent right row at or
before its timestamp, per key.

The reference has no time-series operators; this is a scale extension in
the spirit of SURVEY §2.11 — a custom operator Spark lacks natively,
expressed as a *composition of built-in operators* (option (a) of the
custom-operator ladder) rather than a Pandas UDF:

union the two sides with a side tag, sort per key by (ts, side-order),
and carry the last seen right-side payload forward with ``last(...,
ignorenulls=True)`` over an unbounded-preceding window. One shuffle on
the key, per-key sort — the same cost shape as sessionization, with AQE
handling skewed keys. The naive alternative (per-left-row subquery /
range join) is O(n*m) per key and collapses at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str = "ts",
    right_value_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: for each left row, the latest right row with
    ``right.ts <= left.ts`` on the same key (ties: the right row wins —
    'at or before'). Left rows with no prior right row keep NULLs.

    Output: all left columns + ``<ts><suffix>`` + the requested right
    value columns (suffixed).
    """
    right_value_cols = right_value_cols or [c for c in right.columns if c not in (key, ts)]

    l_tag = left.select(
        F.col(key),
        F.col(ts),
        F.lit(0).alias("__is_right"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(
            "struct<" + ", ".join(f"`{c}`:{right.schema[c].dataType.simpleString()}" for c in [ts, *right_value_cols]) + ">"
        ).alias("__r"),
    )
    r_tag = right.select(
        F.col(key),
        F.col(ts),
        F.lit(1).alias("__is_right"),
        F.lit(None).cast(
            "struct<" + ", ".join(f"`{c}`:{left.schema[c].dataType.simpleString()}" for c in left.columns) + ">"
        ).alias("__l"),
        F.struct(*[F.col(c) for c in [ts, *right_value_cols]]).alias("__r"),
    )

    # right rows sort BEFORE left rows at equal ts so 'at or before' includes ties
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("__is_right").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = l_tag.unionByName(r_tag).withColumn("__last_r", F.last("__r", ignorenulls=True).over(w))

    out = merged.filter(F.col("__is_right") == 0).select(
        *[F.col("__l").getField(c).alias(c) for c in left.columns],
        F.col("__last_r").getField(ts).alias(f"{ts}{suffix}"),
        *[F.col("__last_r").getField(c).alias(f"{c}{suffix}") for c in right_value_cols],
    )
    return out
