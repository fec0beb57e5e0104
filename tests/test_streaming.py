"""Structured Streaming window operators: batch-equivalence against the
batch operators on the same sf0.001 events table."""

from __future__ import annotations

from pyp_etl_pipeline_spark.operators import windows
from pyp_etl_pipeline_spark.streaming import events as stream_ev
from pyp_etl_pipeline_spark.tables import load_events


def test_streaming_tumbling_matches_batch(spark, sf_dir):
    stream = stream_ev.read_events_stream(spark, sf_dir)
    agg = stream_ev.streaming_tumbling_agg(stream, watermark="0 seconds")
    stream_ev.run_to_memory(agg, "t_tumbling", output_mode="complete")
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.table("t_tumbling").collect()
    }

    batch = windows.tumbling_agg(load_events(spark, sf_dir))
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in batch.collect()
    }
    assert got == want


def test_streaming_session_counts(spark, sf_dir):
    stream = stream_ev.read_events_stream(spark, sf_dir)
    agg = stream_ev.streaming_session_agg(stream, watermark="0 seconds")
    stream_ev.run_to_memory(agg, "t_session", output_mode="complete")
    rows = spark.table("t_session").collect()
    assert len(rows) > 0
    total = sum(r["n_events"] for r in rows)
    assert total == load_events(spark, sf_dir).count()
