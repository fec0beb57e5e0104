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


def test_streaming_dedup_across_microbatches(spark, sf_dir, tmp_path):
    """Exactly-once must survive redelivery in a LATER micro-batch, not
    just union-in-one-batch: the same events file lands twice in the
    watch dir, maxFilesPerTrigger=1 forces one file per micro-batch, and
    the drained output must still equal the batch DISTINCT. The second
    copy is removed either against retained state (inside the 2h
    watermark) or as late data (behind it) — both are the exactly-once
    contract."""
    import shutil

    src = f"{sf_dir}/events.parquet"
    watch = tmp_path / "replayed"
    watch.mkdir()
    shutil.copy(src, watch / "part-000-events.parquet")
    shutil.copy(src, watch / "part-001-events.parquet")

    stream = stream_ev.read_events_stream(
        spark, str(watch), glob="*.parquet", max_files_per_trigger=1
    )
    dd = stream_ev.streaming_dedup(stream, ("event_id",), watermark="2 hours")
    stream_ev.run_to_memory(dd, "t_dedup_mb", output_mode="append")

    out = spark.table("t_dedup_mb")
    n_events = load_events(spark, sf_dir).count()
    assert out.count() == n_events
    assert out.select("event_id").distinct().count() == n_events


def test_streaming_window_join_matches_batch(spark, sf_dir):
    from pyspark.sql import functions as F

    def legs(df):
        errors = df.filter(F.col("event_type") == "error").select(
            F.col("event_id").alias("err_id"), "user_id", F.col("ts").alias("start_ts")
        )
        clicks = df.filter(F.col("event_type") == "click").select(
            F.col("event_id").alias("click_id"), "user_id", "ts"
        )
        return errors, clicks

    s_err, s_clk = legs(stream_ev.read_events_stream(spark, sf_dir))
    joined = stream_ev.streaming_window_join(
        s_err, s_clk, interval_ts="start_ts", window="6 hours", watermark="12 hours"
    ).select("err_id", "click_id")
    stream_ev.run_to_memory(joined, "t_ssjoin", output_mode="append")
    got = {(r["err_id"], r["click_id"]) for r in spark.table("t_ssjoin").collect()}

    b_err, b_clk = legs(load_events(spark, sf_dir))
    want = {
        (r["err_id"], r["click_id"])
        for r in b_err.alias("e")
        .join(
            b_clk.alias("c"),
            (F.col("e.user_id") == F.col("c.user_id"))
            & (F.col("c.ts") >= F.col("e.start_ts"))
            & (F.col("c.ts") <= F.col("e.start_ts") + F.expr("INTERVAL 6 HOURS")),
        )
        .collect()
    }
    assert got == want and len(got) > 0


def test_streaming_upsert_multibatch_matches_batch_latest(spark, sf_dir, tmp_path):
    """The foreachBatch MERGE sink drains a 2-file watch dir one file per
    micro-batch; the final published snapshot must equal the batch
    latest-per-user, and each epoch must publish its own version."""
    import shutil

    from pyspark.sql import functions as F

    from pyp_etl_pipeline_spark.streaming import upsert_sink

    src = f"{sf_dir}/events.parquet"
    watch = tmp_path / "watch"
    watch.mkdir()
    shutil.copy(src, watch / "part-000.parquet")
    shutil.copy(src, watch / "part-001.parquet")  # redelivered copy

    stream = stream_ev.read_events_stream(spark, str(watch), glob="*.parquet", max_files_per_trigger=1)
    root = str(tmp_path / "state")
    upsert_sink.run_streaming_upsert(stream, root)

    got = upsert_sink.read_current_snapshot(spark, root)
    ev = load_events(spark, sf_dir)
    expect = upsert_sink.elect_latest(ev, ("user_id",), ("ts", "event_id"))
    assert got.count() == expect.count()
    j = got.alias("g").join(expect.alias("e"), "user_id")
    assert j.filter(F.col("g.event_id") != F.col("e.event_id")).count() == 0
    # one snapshot per drained micro-batch, pointer at the last
    versions = upsert_sink.published_versions(root)
    assert len(versions) >= 2
    assert upsert_sink.current_version(root) == versions[-1]


def test_streaming_upsert_epoch_replay_is_noop(spark, sf_dir, tmp_path):
    """Replaying an epoch (restart between sink write and source commit)
    must not re-publish: the sink detects its own version and skips."""
    import os

    from pyp_etl_pipeline_spark.streaming import upsert_sink

    root = str(tmp_path / "state")
    ev = load_events(spark, sf_dir).limit(100)
    fn = upsert_sink.foreach_batch_upsert(root, ("user_id",), ("ts", "event_id"))
    fn(ev, 0)
    v1 = upsert_sink.published_versions(root)
    mtime = os.path.getmtime(os.path.join(root, "_CURRENT"))
    fn(ev, 0)  # replay
    assert upsert_sink.published_versions(root) == v1
    assert os.path.getmtime(os.path.join(root, "_CURRENT")) == mtime
    fn(ev, 1)  # next epoch merges and publishes
    assert len(upsert_sink.published_versions(root)) == 2


def test_streaming_upsert_recovers_partial_write(spark, sf_dir, tmp_path):
    """A crash mid-parquet-write leaves v=epochN/ on disk but _CURRENT
    unflipped. The replay must treat that epoch as UNpublished — rewrite
    the partial directory instead of skipping it (the directory-existence
    check this sink originally used silently lost the batch)."""
    import os

    from pyp_etl_pipeline_spark.streaming import upsert_sink

    root = str(tmp_path / "state")
    ev = load_events(spark, sf_dir).limit(100)
    fn = upsert_sink.foreach_batch_upsert(root, ("user_id",), ("ts", "event_id"))
    fn(ev, 0)
    # simulate a crashed epoch-1 attempt: directory created, junk inside,
    # no pointer flip
    partial = os.path.join(root, "v=epoch0000000001")
    os.makedirs(partial)
    with open(os.path.join(partial, "part-00000.parquet"), "w") as f:
        f.write("truncated")
    assert upsert_sink.current_version(root) == "epoch0000000000"
    fn(ev, 1)  # replayed epoch 1 must publish for real
    assert upsert_sink.current_version(root) == "epoch0000000001"
    got = upsert_sink.read_current_snapshot(spark, root)
    expect = upsert_sink.elect_latest(ev, ("user_id",), ("ts", "event_id"))
    assert got.count() == expect.count()
    # and a genuine replay of a COMMITTED epoch still skips
    mtime = os.path.getmtime(os.path.join(root, "_CURRENT"))
    fn(ev, 1)
    assert os.path.getmtime(os.path.join(root, "_CURRENT")) == mtime


def test_stream_static_enrich_matches_batch_join(spark, sf_dir):
    """The stream-static broadcast enrichment must equal the batch join
    row-for-row, and a left join must keep unmatched stream rows."""
    from pyp_etl_pipeline_spark.tables import load_table

    dim = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    stream = stream_ev.read_events_stream(spark, sf_dir)
    joined = stream_ev.streaming_static_enrich(stream, dim).select(
        "event_id", "c_mktsegment"
    )
    stream_ev.run_to_memory(joined, "t_enrich", output_mode="append")
    got = sorted(map(tuple, spark.table("t_enrich").collect()))

    ev = load_events(spark, sf_dir)
    want = sorted(
        map(
            tuple,
            ev.join(
                dim.withColumnRenamed("c_custkey", "user_id"), "user_id"
            ).select("event_id", "c_mktsegment").collect(),
        )
    )
    assert got == want and len(got) == ev.count()  # every user_id resolves

    # left join keeps stream rows with no dim match
    tiny = dim.filter("c_custkey < 5")
    left = stream_ev.streaming_static_enrich(stream, tiny, how="left").select(
        "event_id", "c_mktsegment"
    )
    stream_ev.run_to_memory(left, "t_enrich_left", output_mode="append")
    rows = spark.table("t_enrich_left").collect()
    assert len(rows) == ev.count()
    assert any(r["c_mktsegment"] is None for r in rows)


def test_stream_stream_left_outer_emits_null_rows(spark):
    """The leftOuter stream-stream join must emit watermark-expired
    unmatched errors with NULL click columns and reproduce the batch
    LEFT JOIN exactly (sentinel advances the watermark past all real
    rows — see st09)."""
    from pyspark.sql import functions as F

    from pyp_etl_pipeline_spark.driver_queries_ext3 import st09_stream_stream_left_join
    from pyp_etl_pipeline_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    got = st09_stream_stream_left_join(spark, sf)
    rows = sorted(map(tuple, got.collect()))

    e = load_table(spark, sf, "events")
    err = e.filter("event_type = 'error'").select(
        F.col("event_id").alias("err_event_id"), "user_id", F.col("ts").alias("start_ts")
    )
    clk = e.filter("event_type = 'click'").select(
        F.col("event_id").alias("click_event_id"), F.col("user_id").alias("cu"), "ts"
    )
    batch = err.join(
        clk,
        (F.col("user_id") == F.col("cu"))
        & (F.col("ts") >= F.col("start_ts"))
        & (F.col("ts") <= F.col("start_ts") + F.expr("INTERVAL 6 HOURS")),
        "left",
    ).select("err_event_id", "user_id", "click_event_id")
    expected = sorted(map(tuple, batch.collect()))
    assert rows == expected
    assert any(r[2] is None for r in rows)  # genuine null-emission happened


def test_streaming_materialized_rollup_equals_batch(spark):
    from pyp_etl_pipeline_spark.driver_queries_ext3 import st10_streaming_materialized_rollup
    from pyp_etl_pipeline_spark.operators import incremental
    from pyp_etl_pipeline_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    got = sorted(map(tuple, st10_streaming_materialized_rollup(spark, sf).collect()))
    direct = sorted(
        map(tuple, incremental.finalize_state(
            incremental.agg_state(load_table(spark, sf, "events"))
        ).collect())
    )
    assert got == direct
