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
    """Schema-adaptive events loader. The driver has shipped two layouts:

    - TIMESTAMP(NANOS): Spark's reader rejects it by default; read nanos
      as long and convert with exact integer arithmetic (DIV, not double
      division — nanos exceed double's exact-integer range).
    - timestamp[us] (no timezone): Spark infers TIMESTAMP_NTZ; convert
      naive-as-UTC via tz-INDEPENDENT integer arithmetic
      (timestampdiff against the NTZ epoch, then timestamp_micros).
      A plain cast to TIMESTAMP would interpret the wall time in the
      SESSION timezone — correct only when that happens to be UTC, and
      the driver harness builds its own session whose tz we don't
      control. This form matches DuckDB's naive epoch(ts) everywhere.
    """
    from pyspark.sql import functions as F  # noqa: PLC0415
    from pyspark.sql.types import LongType  # noqa: PLC0415

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df.withColumn(
        "ts",
        F.timestamp_micros(
            F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
        ),
    )


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
