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
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join, pandas ``merge_asof`` directions (round 8):

    - ``backward`` (default): latest right row with ``right.ts <=
      left.ts`` (ties: the right row wins — 'at or before').
    - ``forward``: earliest right row with ``right.ts >= left.ts``
      ('at or after') — the "next quote/event" lookup.
    - ``nearest``: whichever of the two is closer in absolute time;
      exact ties prefer BACKWARD (the pandas convention).

    Left rows with no matching right row keep NULLs. Same plan shape in
    every direction: one shuffle on the key, a per-key sorted window
    carrying the last (resp. first) right payload — forward is the
    mirrored window, nearest evaluates both and picks per-row. The
    naive per-row range join is O(n*m) per key and collapses at scale.

    Output: all left columns + ``<ts><suffix>`` + the requested right
    value columns (suffixed).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
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

    merged = l_tag.unionByName(r_tag)
    # right rows sort BEFORE left rows at equal ts (backward window) so
    # 'at or before' includes ties; the forward window mirrors it (right
    # rows AFTER left at equal ts would exclude ties, so there right
    # sorts before left too but the frame looks ahead)
    w_back = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("__is_right").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("__is_right").asc())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    if direction == "backward":
        merged = merged.withColumn("__pick", F.last("__r", ignorenulls=True).over(w_back))
    elif direction == "forward":
        merged = merged.withColumn("__pick", F.first("__r", ignorenulls=True).over(w_fwd))
    else:  # nearest
        back = F.last("__r", ignorenulls=True).over(w_back)
        fwd = F.first("__r", ignorenulls=True).over(w_fwd)
        merged = merged.withColumn("__b", back).withColumn("__f", fwd)
        lts = F.col(ts)
        d_b = lts - F.col("__b").getField(ts)
        d_f = F.col("__f").getField(ts) - lts
        merged = merged.withColumn(
            "__pick",
            F.when(F.col("__b").isNull(), F.col("__f"))
            .when(F.col("__f").isNull(), F.col("__b"))
            # exact tie prefers backward (pandas convention)
            .when(d_f < d_b, F.col("__f"))
            .otherwise(F.col("__b")),
        )

    out = merged.filter(F.col("__is_right") == 0).select(
        *[F.col("__l").getField(c).alias(c) for c in left.columns],
        F.col("__pick").getField(ts).alias(f"{ts}{suffix}"),
        *[F.col("__pick").getField(c).alias(f"{c}{suffix}") for c in right_value_cols],
    )
    return out
