"""functions/aggregates.py: the order-independence contract itself —
identical results under any partition layout, exact agreement with a
python Decimal reference, and Spark/DuckDB twin equivalence."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from pyp_etl_pipeline_spark.functions import aggregates as A

VALUES = [
    1.005, 2.115, -0.5, 3.333333, 0.0, -17.125, 99999.99, -0.000001,
    123.4549, 123.4551, 5.0000005, 1e9, -1e9, 0.1, 0.2, 0.3,
]


def _spark_result(spark, vals, n_parts):
    df = spark.createDataFrame([(v,) for v in vals], "x double").repartition(n_parts)
    row = df.agg(
        A.exact_sum("x").alias("s"), A.exact_avg("x").alias("a")
    ).collect()[0]
    return row["s"], row["a"]


def test_partition_layout_invariance(spark):
    """The contract: any partitioning, same cents. A plain double sum
    fails this exact test shape on adversarial inputs."""
    results = {_spark_result(spark, VALUES, n) for n in (1, 2, 7, 32)}
    assert len(results) == 1, results


def test_matches_decimal_reference(spark):
    """Exact agreement with a python Decimal ground truth of the same
    scheme (micro round-half-up, integer rounding)."""
    import math

    # reference via the exact formula: floor(x*1e6 + 0.5)
    micro = [math.floor(v * 1_000_000 + 0.5) for v in VALUES]
    s = sum(micro)
    cents = (abs(s) + 5000) // 10000
    want_sum = (-cents if s < 0 else cents) / 100.0
    d = len(VALUES) * 100
    b = abs(s) + len(VALUES) * 50
    q = b // d
    want_avg = (-q if s < 0 else q) / 10000.0
    got_sum, got_avg = _spark_result(spark, VALUES, 5)
    assert got_sum == want_sum
    assert got_avg == want_avg


def test_sql_twins_agree_with_spark(spark):
    got_sum, got_avg = _spark_result(spark, VALUES, 3)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in VALUES])
    duck = con.execute(
        f"SELECT {A.sql_exact_sum('x')} AS s, {A.sql_exact_avg('x')} AS a FROM t"
    ).fetchone()
    assert (got_sum, got_avg) == duck


def test_sql_twin_runs_under_spark_sql_too(spark):
    """q05 feeds the same text to Spark SQL and DuckDB — the twins must
    stay dialect-neutral."""
    spark.createDataFrame([(v,) for v in VALUES], "x double").createOrReplaceTempView("agg_t")
    row = spark.sql(
        f"SELECT {A.sql_exact_sum('x')} AS s, {A.sql_exact_avg('x')} AS a FROM agg_t"
    ).collect()[0]
    assert (row["s"], row["a"]) == _spark_result(spark, VALUES, 3)


def test_nulls_and_empty(spark):
    df = spark.createDataFrame([(1.5,), (None,), (2.5,)], "x double")
    row = df.agg(A.exact_sum("x").alias("s"), A.exact_avg("x").alias("a")).collect()[0]
    assert row["s"] == 4.0
    assert row["a"] == 2.0  # mean over the two non-null rows
    empty = spark.createDataFrame([], "x double")
    row = empty.agg(A.exact_sum("x").alias("s")).collect()[0]
    assert row["s"] is None


@pytest.mark.parametrize("vals,scale,expected", [
    ([1.004999, 2.0], 2, 3.0),   # micro rounding feeds the cent
    ([0.005, 0.005], 2, 0.01),   # rounding happens ONCE on the sum (10000 micro)
    ([-1.115], 2, -1.12),        # half-mill rounds away on the negative sum
])
def test_boundary_values(spark, vals, scale, expected):
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    row = df.agg(A.exact_sum("x", scale).alias("s")).collect()[0]
    assert row["s"] == expected


def test_incremental_state_merge_equals_single_pass(spark):
    """Merging per-batch partial states (any order, any batching) must
    equal the direct aggregate over the union — the algebraic property
    ia01 certifies against the DuckDB oracle."""
    from pyp_etl_pipeline_spark.operators import incremental

    rows = [
        ("a", "u%d" % (i % 7), float(i) * 0.31 - 3 if i % 11 else None)
        for i in range(300)
    ] + [("b", "u1", 5.0), ("b", "u2", None)]
    df = spark.createDataFrame(rows, "event_type string, user_id string, value double")

    direct = sorted(map(tuple, incremental.finalize_state(incremental.agg_state(df)).collect()))

    b1 = df.filter("hash(user_id) % 3 = 0")
    b2 = df.filter("hash(user_id) % 3 = 1")
    b3 = df.filter("hash(user_id) % 3 != 0 AND hash(user_id) % 3 != 1")
    s1, s2, s3 = (incremental.agg_state(b) for b in (b1, b2, b3))
    # fold in both associations/orders
    m123 = incremental.merge_states(incremental.merge_states(s1, s2), s3)
    m321 = incremental.merge_states(s3, incremental.merge_states(s2, s1))
    assert sorted(map(tuple, incremental.finalize_state(m123).collect())) == direct
    assert sorted(map(tuple, incremental.finalize_state(m321).collect())) == direct


def test_wide_variants_match_narrow_in_domain(spark):
    vals = [123.456789, -0.005, 99999999.99, -123456.78, 0.000001, 3.14159265]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    for scale in (0, 2, 4, 6):
        row = df.agg(
            A.exact_sum("v", scale).alias("narrow"),
            A.exact_sum_wide("v", scale).alias("wide"),
        ).collect()[0]
        assert row["narrow"] == row["wide"], scale


def test_wide_sum_exact_beyond_long_and_twin_agrees(spark):
    """2000 rows at the per-row domain max: the micro sum is ~1.84e22 —
    past int64 — so the narrow path raises ANSI ARITHMETIC_OVERFLOW
    while the wide path matches DuckDB's HUGEINT twin exactly (the
    >= sf1e4 global-money-total scenario from SCALE.md)."""
    big = spark.range(2000).select((F.lit(9.2e12) + F.col("id").cast("double")).alias("v"))
    got = big.agg(A.exact_sum_wide("v").alias("s")).collect()[0]["s"]
    con = duckdb.connect()
    want = con.execute(
        "SELECT " + A.sql_exact_sum_wide("v") + " AS s FROM "
        "(SELECT 9.2e12 + CAST(range AS DOUBLE) AS v FROM range(2000))"
    ).fetchone()[0]
    assert got == want
    with pytest.raises(Exception, match="ARITHMETIC_OVERFLOW|overflow"):
        big.agg(A.exact_sum("v").alias("s")).collect()


def test_wide_twin_sweep_past_2pow53(spark):
    """ADVICE r10 (high): the old twin used DuckDB `/` on HUGEINT —
    FLOAT division, rounding the >2^53 numerator to double BEFORE the
    divide — and drifted 1 ulp from Spark's exact decimal quotient on
    ~3/8 random datasets just past int64 micro. Sweep many random
    magnitudes spanning 2^53..~1e22 micro and require bit-exact
    agreement at every supported scale (incl. the scale>=6 branch,
    whose old twin float-divided the raw HUGEINT sum)."""
    import random

    rng = random.Random(0xC0FFEE)
    datasets = []
    for mag in (2.0e9, 9.1e9, 4.0e10, 7.7e11, 9.0e12):  # per-row unit scale
        for _ in range(3):
            n = rng.randint(3, 40)
            vals = [
                rng.uniform(0.1, mag) * (1 if rng.random() < 0.85 else -1)
                for _ in range(n)
            ]
            datasets.append(vals)
    # ADVICE r11 (medium): the 1-ulp class above lives PAST 2^64 (the
    # direct DuckDB HUGEINT->DOUBLE cast misrounds ~2% of 2^64..2^80
    # values); the magnitudes above top out ~2^68 only occasionally.
    # Add datasets whose micro sums land squarely in 2^64..2^74.
    for _ in range(8):
        n = rng.randint(400, 1200)
        vals = [rng.uniform(1.0e12, 9.0e12) for _ in range(n)]
        if rng.random() < 0.3:
            vals = [-v for v in vals]
        datasets.append(vals)

    con = duckdb.connect()
    for i, vals in enumerate(datasets):
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        agg = df.agg(
            *[A.exact_sum_wide("v", sc).alias(f"s{sc}") for sc in (0, 2, 4, 6)]
        ).collect()[0]
        con.execute("CREATE OR REPLACE TABLE sweep_t (v DOUBLE)")
        con.executemany("INSERT INTO sweep_t VALUES (?)", [(v,) for v in vals])
        duck = con.execute(
            "SELECT "
            + ", ".join(
                f"{A.sql_exact_sum_wide('v', sc)} AS s{sc}" for sc in (0, 2, 4, 6)
            )
            + " FROM sweep_t"
        ).fetchone()
        for j, sc in enumerate((0, 2, 4, 6)):
            assert agg[f"s{sc}"] == duck[j], (i, sc, agg[f"s{sc}"], duck[j])


def test_hugeint_to_double_twin_cast_is_correctly_rounded():
    """ADVICE r11 (medium): DuckDB's direct CAST(HUGEINT AS DOUBLE) is
    NOT correctly rounded past 2^64 — ~2% of random 2^64..2^80 values
    land 1 ulp from the nearest double (which is what Python int->float
    and Spark's decimal->double produce). The twin therefore routes the
    final cast through VARCHAR (_sql_hugeint_to_double). Sweep random
    bit patterns across 2^56..2^90 and require the VARCHAR route to be
    bit-exact against Python's correctly-rounded conversion; also prove
    the sweep has teeth by asserting the DIRECT cast does misround on
    at least some of the same values."""
    import random

    rng = random.Random(0xA11CE)
    vals = []
    for bits in range(56, 91):
        for _ in range(160):
            v = rng.getrandbits(bits) | (1 << (bits - 1))
            if rng.random() < 0.5:
                v = -v
            vals.append(v)

    con = duckdb.connect()
    con.execute("CREATE TABLE hv (s VARCHAR)")
    con.executemany("INSERT INTO hv VALUES (?)", [(str(v),) for v in vals])
    rows = con.execute(
        "SELECT s, "
        f"{A._sql_hugeint_to_double('CAST(s AS HUGEINT)')} AS viastr, "
        "CAST(CAST(s AS HUGEINT) AS DOUBLE) AS direct FROM hv"
    ).fetchall()
    direct_misrounds = 0
    for s, viastr, direct in rows:
        want = float(int(s))  # python int->float: correctly rounded
        assert viastr == want, (s, viastr.hex(), want.hex())
        if direct != want:
            direct_misrounds += 1
    # teeth: the bug class this test exists for must be observable here
    assert direct_misrounds > 0, "direct cast never misrounded — sweep lost its teeth"
