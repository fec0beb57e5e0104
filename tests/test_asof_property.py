"""Property test: asof_join equals the brute-force per-row definition on
random inputs (hypothesis-generated keys/timestamps/values)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyp_etl_pipeline_spark.operators.asof import asof_join

KEYS = st.integers(min_value=0, max_value=3)
TS = st.integers(min_value=0, max_value=50)


def brute_force(left_rows, right_rows):
    out = {}
    for lk, lt, lv in left_rows:
        best = None
        for rk, rt, rv in right_rows:
            if rk == lk and rt <= lt and (best is None or rt > best[0]):
                best = (rt, rv)
        out[(lk, lt, lv)] = best
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(st.tuples(KEYS, TS, st.integers(0, 99)), min_size=1, max_size=12, unique_by=lambda r: (r[0], r[1])),
    st.lists(st.tuples(KEYS, TS, st.integers(0, 99)), min_size=0, max_size=12, unique_by=lambda r: (r[0], r[1])),
)
def test_asof_matches_bruteforce(spark, left_rows, right_rows):
    left = spark.createDataFrame(left_rows, "k long, ts long, lv long")
    right = spark.createDataFrame(right_rows or [(99, 0, 0)], "k long, ts long, rv long")
    rr = right_rows or [(99, 0, 0)]

    got = {
        (r["k"], r["ts"], r["lv"]): (r["ts_right"], r["rv_right"])
        for r in asof_join(left, right, key="k", ts="ts").collect()
    }
    want = brute_force(left_rows, rr)
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == (v if v is not None else (None, None)), k
