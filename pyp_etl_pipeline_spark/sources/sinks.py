"""Atomic / idempotent table sinks (S9 write discipline).

Reference semantics: per-company atomicity — a failed company mutates
nothing and is skipped, never half-written (``app/routes.py:1223-1227``,
``:1995-2010``). The Spark translation is partition-level idempotency:

- ``write_partitioned_overwrite``: dynamic partition overwrite — a
  re-run of the same batch replaces exactly the partitions it owns and
  touches nothing else, so retries are idempotent (the cluster-native
  equivalent of the reference's skip-not-partial contract). On
  Delta/Iceberg the same call sites become ``MERGE INTO`` /
  ``replaceWhere``.
- ``write_versioned_snapshot``: full-snapshot publish via
  write-new-then-swap-pointer — readers only ever see a committed
  snapshot; the pointer file is updated last.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


def write_partitioned_overwrite(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
) -> None:
    """Idempotent batch publish: overwrite only the partitions present in
    ``df`` (dynamic mode), leaving sibling partitions intact."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def write_versioned_snapshot(df: DataFrame, root: str, version: str | None = None) -> str:
    """Publish a full snapshot under ``root/v=<version>`` and flip the
    ``root/_CURRENT`` pointer only after the data write completes.
    Returns the published snapshot path."""
    version = version or time.strftime("%Y%m%dT%H%M%S") + f"-{os.getpid()}"
    snap = os.path.join(root, f"v={version}")
    df.write.mode("errorifexists").parquet(snap)
    pointer = os.path.join(root, "_CURRENT")
    tmp = pointer + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"version": version, "path": snap}, f)
    os.replace(tmp, pointer)  # atomic on POSIX
    return snap


def read_current_snapshot(spark: SparkSession, root: str) -> DataFrame:
    """Read whatever snapshot ``_CURRENT`` points at."""
    with open(os.path.join(root, "_CURRENT")) as f:
        meta = json.load(f)
    return spark.read.parquet(meta["path"])
