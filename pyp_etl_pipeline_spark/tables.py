"""Loaders for the driver's deterministic parquet tables (TESTDATA.md)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events parquet stores ts as TIMESTAMP(NANOS), which Spark's
    parquet reader rejects by default. Read nanos as long and convert to a
    microsecond timestamp with exact integer arithmetic (DIV, not double
    division — nanos exceed double's exact-integer range)."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
