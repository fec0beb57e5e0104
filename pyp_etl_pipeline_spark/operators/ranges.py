"""Interval (range) join via bin-bucketed equi-join.

A point-in-interval join (``p.ts BETWEEN i.start AND i.end``) has no
equi-key, so Catalyst can only plan it as a broadcast nested-loop (small
side) or cartesian join — O(points x intervals) compares, the classic
scale-killer for event-vs-window analytics. This operator converts it to
an EQUI-join: time is cut into fixed bins of ``bin_width_s`` seconds,
each interval is exploded to the bin ids it overlaps, each point maps to
exactly ONE bin, and the join runs on (keys..., bin) with the exact
range predicate applied after the hash match.

Properties:
- exact: the bin ranges cover the interval, so no match is missed, and
  because each point has exactly one bin no pair matches twice — no
  DISTINCT needed afterward.
- scale: compares drop from |P| x |I| to sum over bins of
  |P_bin| x |I_bin|; the join is a plain shuffled hash join that AQE can
  skew-split. Interval fan-out is ceil(len/bin_width)+1 rows, so pick
  ``bin_width_s`` around the TYPICAL interval length (wider wastes
  per-bin selectivity, narrower multiplies the exploded interval side).
- composable: extra equi-keys (e.g. user_id) ride the join key, which
  both shrinks bins and removes cross-user false candidates.

The as-of join (``operators/asof.py``) covers "latest event at or
before"; this covers containment. Together they replace the reference's
per-row timestamp probes (reference app/etl.py date filtering is
row-at-a-time Python) with shuffle-bounded joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _epoch(c: Column) -> Column:
    # whole-second FLOOR on BOTH sides keeps bin assignment consistent;
    # the exact predicate below still compares full-precision timestamps.
    # cast(ts AS long) floors like DuckDB floor(epoch(ts)) even for
    # pre-1970 timestamps, where unix_timestamp() truncates toward zero
    # (caught by the --tsextremes sweep).
    return c.cast("long")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bin_width_s: int = 900,
    keys: list[str] | None = None,
) -> DataFrame:
    """Inner join of ``points`` rows onto every ``intervals`` row whose
    [start, end] (inclusive) contains the point's timestamp, with
    optional extra equi-``keys``. Columns of both inputs are preserved
    (names must not collide apart from ``keys``). Intervals with
    ``end < start`` match nothing (dropped up front — Spark's
    ``sequence`` would otherwise generate a DESCENDING bin range and
    corrupt the blocking). Outer variants compose on top: aggregate this
    result and join back to ``intervals`` (see rj01).
    """
    keys = keys or []
    w = F.lit(int(bin_width_s)).cast("long")
    iv = intervals.filter(F.col(end_col) >= F.col(start_col))
    iv = iv.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(_epoch(F.col(start_col)) / w),
                F.floor(_epoch(F.col(end_col)) / w),
            )
        ),
    )
    pt = points.withColumn("__bin", F.floor(_epoch(F.col(point_ts)) / w))
    joined = pt.join(iv, [*keys, "__bin"]).filter(
        (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) <= F.col(end_col))
    )
    return joined.drop("__bin")
