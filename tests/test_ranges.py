"""Interval join: bin-bucketed equi-join equivalence with the naive
theta-join semantics (containment, inclusive bounds, key isolation)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from pyp_etl_pipeline_spark.operators.ranges import interval_join


def _ts(m, s=0):
    return datetime(2024, 1, 1, 10, m, s)


def test_interval_join_matches_naive(spark):
    points = spark.createDataFrame(
        [(i, 1 + i % 2, _ts(i)) for i in range(60)], "pid long, user_id long, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [
            (100, 1, _ts(6), _ts(20)),   # spans two 900s bins
            (101, 1, _ts(0), _ts(0)),    # single instant
            (102, 1, _ts(40), _ts(30)),  # end < start: matches nothing
            (103, 2, _ts(55), _ts(59)),
        ],
        "iid long, user_id long, start_ts timestamp, end_ts timestamp",
    )
    got = {
        (r["pid"], r["iid"])
        for r in interval_join(points, intervals, bin_width_s=900, keys=["user_id"]).collect()
    }
    naive = {
        (r["pid"], r["iid"])
        for r in points.alias("p")
        .join(
            intervals.alias("i"),
            (F.col("p.user_id") == F.col("i.user_id"))
            & (F.col("p.ts") >= F.col("i.start_ts"))
            & (F.col("p.ts") <= F.col("i.end_ts")),
        )
        .collect()
    }
    assert got == naive
    # inclusive bounds actually exercised (even pid -> user 1)
    assert (6, 100) in got and (20, 100) in got and (0, 101) in got
    # key isolation: user 2's points (odd pid) never match user 1's interval
    assert all(not (p % 2 == 1 and i == 100) for p, i in got)


def test_interval_join_no_duplicate_pairs(spark):
    points = spark.createDataFrame([(1, _ts(10))], "pid long, ts timestamp")
    # interval spanning many bins must still yield ONE matched row
    intervals = spark.createDataFrame(
        [(9, _ts(0), _ts(59))], "iid long, start_ts timestamp, end_ts timestamp"
    )
    rows = interval_join(points, intervals, bin_width_s=60).collect()
    assert len(rows) == 1
