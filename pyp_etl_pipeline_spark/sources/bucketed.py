"""Bucketed-table storage for co-located repeat joins.

SCALE.md's similarity-join trade-off: a pipeline that repeatedly joins a
huge fact against a stable key (entity resolution against a canonical
dictionary, lineitem against part, near-dup pairs against the corpus)
pays the fact-side shuffle on EVERY run unless the storage layout
pre-partitions by the join key. Spark's bucketed tables
(``bucketBy(n, key).sortBy(key).saveAsTable``) persist that layout: a
join of two tables bucketed by the same key into the same bucket count
compiles with NO Exchange on either side — the shuffle happened once, at
write time, and is amortized over every subsequent query.

Notes for real deployments (all standard Spark semantics):
- bucket counts must match (or divide, with
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``) across join
  sides;
- buckets only help equi-joins/aggregations on the bucket key;
- writes go through the session catalog (``saveAsTable``) — path-based
  ``parquet(path)`` writes do not carry bucket metadata.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str | Sequence[str],
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) managed table.
    ``bucket_col`` may be a single column or a list (composite bucket
    key — joins must then use ALL bucket columns as equi-keys to skip
    the exchange).

    Sorting within buckets additionally lets sort-merge joins skip their
    sort phase when the hash join is not chosen."""
    cols = [bucket_col] if isinstance(bucket_col, str) else list(bucket_col)
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *cols)
    if sort:
        w = w.sortBy(*cols)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — bucket metadata only survives the catalog path."""
    return spark.table(table)


def write_date_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    partition_col: str = "event_date",
    mode: str = "overwrite",
) -> None:
    """Persist with Hive-style date partitioning (``.../event_date=D/``)
    — the other half of the storage-layout story next to bucketing: at
    100 TB, time-scoped queries must PRUNE partitions at plan time, not
    filter rows after a full scan. For a daily re-run that replaces
    only the day it touches, write via
    ``sources/sinks.write_partitioned_overwrite`` (dynamic partition
    overwrite, set per call — NOT a session default)."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    (
        df.withColumn(partition_col, F.to_date(ts_col))
        .write.mode(mode)
        .partitionBy(partition_col)
        .parquet(path)
    )


def read_partition_pruned(
    spark: SparkSession, path: str, partition_col: str, value
) -> DataFrame:
    """Read one partition; the equality filter lands in the scan's
    PartitionFilters (plan-time directory pruning — verified in
    tests/test_bucketed.py), so unrelated days are never opened."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    return spark.read.parquet(path).filter(F.col(partition_col) == value)
