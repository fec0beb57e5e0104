"""Salted-join equivalence and skew diagnosis."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyp_etl_pipeline_spark.operators import skew


def test_salted_join_equals_plain_join(spark):
    # one pathologically hot key (90% of rows) + a long tail
    big = spark.createDataFrame(
        [("hot", i) for i in range(900)] + [(f"k{i}", i) for i in range(100)],
        "key string, v int",
    )
    small = spark.createDataFrame([("hot", "H"), ("k1", "A"), ("k2", "B")], "key string, tag string")

    plain = big.join(small, "key").groupBy("key", "tag").agg(F.count("*").alias("n"), F.sum("v").alias("s"))
    salted = skew.salted_join(big, small, "key", n_salts=4).groupBy("key", "tag").agg(
        F.count("*").alias("n"), F.sum("v").alias("s")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    big = spark.createDataFrame([("a", 1), ("b", 2)], "key string, v int")
    small = spark.createDataFrame([("a", "A")], "key string, tag string")
    out = {r["key"]: r["tag"] for r in skew.salted_join(big, small, "key", n_salts=3, how="left").collect()}
    assert out == {"a": "A", "b": None}


def test_salt_spreads_hot_key(spark):
    big = spark.createDataFrame([("hot", i) for i in range(1000)], "key string, v int")
    small = spark.createDataFrame([("hot", "H")], "key string, tag string")
    salted = skew.salted_join(big, small, "key", n_salts=8)
    # the physical join key includes the salt -> hot key occupies n_salts buckets
    b = big.withColumn("__salt", F.pmod(F.monotonically_increasing_id(), F.lit(8)).cast("int"))
    n_buckets = b.select("__salt").distinct().count()
    assert n_buckets > 1
    assert salted.count() == 1000


def test_top_keys_by_frequency(spark):
    df = spark.createDataFrame([("hot",)] * 80 + [("warm",)] * 15 + [("cold",)] * 5, "key string")
    out = skew.top_keys_by_frequency(df, "key", n=2).collect()
    assert out[0]["key"] == "hot" and out[0]["fraction"] == 0.8
    assert out[1]["key"] == "warm"
