"""Events loader contract: schema-adaptivity + timezone independence."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyp_etl_pipeline_spark.tables import load_events


def test_load_events_timestamp_type(spark, sf_dir):
    df = load_events(spark, sf_dir)
    assert df.schema["ts"].dataType.typeName() == "timestamp"
    assert df.count() > 0


def test_load_events_tz_independent(spark, sf_dir):
    """The driver harness builds its own session whose timezone we don't
    control; epoch seconds must not shift with it. Naive file time is
    UTC by contract (matches DuckDB epoch(ts))."""
    utc = [r[0] for r in load_events(spark, sf_dir).select(F.unix_timestamp("ts")).orderBy("event_id").limit(5).collect()]
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        est = [r[0] for r in load_events(spark, sf_dir).select(F.unix_timestamp("ts")).orderBy("event_id").limit(5).collect()]
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    assert utc == est
