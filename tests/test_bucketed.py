"""Bucketed-table co-located joins: the write-once-shuffle-never layout
for repeat joins against a stable key. Asserts the property that matters
at 100 TB — the bucketed-bucketed equi-join plan contains NO Exchange —
and that results match the plain-join baseline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyp_etl_pipeline_spark.sources.bucketed import read_table, write_bucketed


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    spark.sql("DROP TABLE IF EXISTS bkt_fact")
    spark.sql("DROP TABLE IF EXISTS bkt_dim")
    fact = spark.range(0, 5000).select(
        (F.col("id") % 500).alias("key"), (F.col("id") * 2).alias("val")
    )
    dim = spark.range(0, 500).select(
        F.col("id").alias("key"), F.concat(F.lit("name_"), F.col("id")).alias("name")
    )
    write_bucketed(fact, "bkt_fact", "key", n_buckets=8)
    write_bucketed(dim, "bkt_dim", "key", n_buckets=8)
    yield "bkt_fact", "bkt_dim"
    spark.sql("DROP TABLE IF EXISTS bkt_fact")
    spark.sql("DROP TABLE IF EXISTS bkt_dim")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    fact_t, dim_t = bucketed_pair
    fact, dim = read_table(spark, fact_t), read_table(spark, dim_t)
    # disable broadcast so the join strategy is decided by layout alone
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = fact.join(dim, "key")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 5000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_aggregation_has_no_exchange(spark, bucketed_pair):
    fact_t, _ = bucketed_pair
    fact = read_table(spark, fact_t)
    agg = fact.groupBy("key").agg(F.sum("val").alias("s"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert agg.count() == 500


def test_bucketed_results_match_plain_join(spark, bucketed_pair):
    fact_t, dim_t = bucketed_pair
    fact, dim = read_table(spark, fact_t), read_table(spark, dim_t)
    bucketed_rows = {tuple(r) for r in fact.join(dim, "key").collect()}
    plain_fact = spark.range(0, 5000).select(
        (F.col("id") % 500).alias("key"), (F.col("id") * 2).alias("val")
    )
    plain_dim = spark.range(0, 500).select(
        F.col("id").alias("key"), F.concat(F.lit("name_"), F.col("id")).alias("name")
    )
    plain_rows = {tuple(r) for r in plain_fact.join(plain_dim, "key").collect()}
    assert bucketed_rows == plain_rows


def test_date_partitioned_write_prunes_partitions(spark, tmp_path):
    import datetime as dt

    from pyspark.sql import functions as F

    from pyp_etl_pipeline_spark.sources.bucketed import (
        read_partition_pruned,
        write_date_partitioned,
    )

    rows = [
        (i, dt.datetime(2024, 1, 1 + (i % 3), 8 + i % 5), float(i))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    path = str(tmp_path / "pt")
    write_date_partitioned(df, path)

    # three day directories on disk
    import os

    days = sorted(d for d in os.listdir(path) if d.startswith("event_date="))
    assert days == ["event_date=2024-01-01", "event_date=2024-01-02", "event_date=2024-01-03"]

    pruned = read_partition_pruned(spark, path, "event_date", dt.date(2024, 1, 2))
    # the predicate must land in PartitionFilters (plan-time pruning),
    # NOT in the post-scan data filters
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters:", 1)[1].split("]", 1)[0]
    assert "event_date" in seg
    # correct data back
    got = pruned.select(F.sum("value").alias("s"), F.count("*").alias("n")).collect()[0]
    exp = [r for r in rows if r[1].day == 2]
    assert got["n"] == len(exp) and got["s"] == sum(r[2] for r in exp)
