"""As-of join: hand-checkable golden cases + tie semantics."""

from __future__ import annotations

import datetime as dt

import pytest

from pyp_etl_pipeline_spark.operators.asof import asof_join


def ts(m):
    return dt.datetime(2024, 1, 1, 10, m)


@pytest.fixture(scope="module")
def sides(spark):
    trades = spark.createDataFrame(
        [
            (1, ts(5), "T1"),
            (1, ts(10), "T2"),
            (1, ts(2), "T0"),   # before any quote
            (2, ts(7), "T3"),
        ],
        "user_id long, ts timestamp, trade string",
    )
    quotes = spark.createDataFrame(
        [
            (1, ts(4), 100.0),
            (1, ts(9), 105.0),
            (1, ts(10), 106.0),  # tie with T2 -> included ('at or before')
            (2, ts(8), 50.0),    # after T3 -> not matched
        ],
        "user_id long, ts timestamp, price double",
    )
    return trades, quotes


def test_asof_join_golden(sides):
    trades, quotes = sides
    out = {r["trade"]: r for r in asof_join(trades, quotes, key="user_id").collect()}
    assert out["T1"]["price_right"] == 100.0 and out["T1"]["ts_right"] == ts(4)
    assert out["T2"]["price_right"] == 106.0          # equal-ts quote wins
    assert out["T0"]["price_right"] is None           # nothing at or before
    assert out["T3"]["price_right"] is None           # quote is after the trade
    assert len(out) == 4                              # left rows all preserved


def test_asof_join_matches_duckdb_asof(spark, sides):
    import duckdb

    trades, quotes = sides
    got = sorted(
        (r["user_id"], r["trade"], r["price_right"])
        for r in asof_join(trades, quotes, key="user_id").collect()
    )
    con = duckdb.connect()
    con.register("trades", trades.toPandas())
    con.register("quotes", quotes.toPandas())
    want = sorted(
        tuple(r)
        for r in con.execute(
            """
            SELECT t.user_id, t.trade, q.price
            FROM trades t ASOF LEFT JOIN quotes q
              ON t.user_id = q.user_id AND t.ts >= q.ts
            """
        ).fetchall()
    )
    assert got == want


def test_asof_join_forward_golden(sides):
    trades, quotes = sides
    out = {r["trade"]: r for r in asof_join(trades, quotes, key="user_id", direction="forward").collect()}
    assert out["T0"]["price_right"] == 100.0 and out["T0"]["ts_right"] == ts(4)
    assert out["T1"]["price_right"] == 105.0          # next quote after 10:05 is 10:09
    assert out["T2"]["price_right"] == 106.0          # equal-ts quote counts ('at or after')
    assert out["T3"]["price_right"] == 50.0           # quote after the trade matches forward
    assert len(out) == 4


def test_asof_join_nearest_golden(sides):
    trades, quotes = sides
    out = {r["trade"]: r for r in asof_join(trades, quotes, key="user_id", direction="nearest").collect()}
    assert out["T0"]["price_right"] == 100.0          # only forward exists
    assert out["T1"]["price_right"] == 100.0          # 1 min back beats 4 min forward
    assert out["T2"]["price_right"] == 106.0          # exact match
    assert out["T3"]["price_right"] == 50.0           # only forward exists
    assert len(out) == 4


def test_asof_join_nearest_tie_prefers_backward(spark):
    left = spark.createDataFrame([(1, 10, "L")], "user_id long, ts long, tag string")
    right = spark.createDataFrame(
        [(1, 8, "back"), (1, 12, "fwd")], "user_id long, ts long, side string"
    )
    out = asof_join(left, right, key="user_id", direction="nearest").collect()[0]
    assert out["side_right"] == "back"


def test_asof_join_rejects_bad_direction(sides):
    trades, quotes = sides
    with pytest.raises(ValueError, match="direction"):
        asof_join(trades, quotes, key="user_id", direction="sideways")
