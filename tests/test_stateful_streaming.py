"""Custom stateful streaming operator (applyInPandasWithState): running
per-user totals must equal the batch groupBy over the same input."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyp_etl_pipeline_spark.streaming import stateful
from pyp_etl_pipeline_spark.streaming.events import read_events_stream, run_to_memory
from pyp_etl_pipeline_spark.tables import load_events


def test_running_totals_match_batch(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    out = stateful.running_user_totals(stream.select("user_id", "value"))
    run_to_memory(out, "t_state_totals", output_mode="update")
    got = {
        r["user_id"]: (r["n_events"], r["sum_value"], r["max_value"])
        for r in spark.table("t_state_totals").collect()
    }

    batch = (
        load_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("s"),
            F.max("value").alias("m"),
        )
    )
    want = {r["user_id"]: (r["n"], r["s"], r["m"]) for r in batch.collect()}
    assert set(got) == set(want)
    for uid, (n, s, m) in want.items():
        gn, gs, gm = got[uid]
        assert gn == n and abs(gs - s) < 0.05 and gm == m, uid
