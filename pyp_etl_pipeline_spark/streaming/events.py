"""Structured Streaming versions of the event-window operators.

The reference has no streaming surface (each upload is a finite batch);
these generalize the batch window operators in ``operators/windows.py``
to unbounded inputs: watermarked tumbling/sliding aggregation and
session windows. For tests, a parquet directory driven with
``availableNow``/``processAllAvailable`` + a memory sink gives
deterministic synchronous batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyp_etl_pipeline_spark.functions import aggregates
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

def _events_schema(ts_type) -> StructType:
    return StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", ts_type),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )


def read_events_stream(
    spark: SparkSession,
    sf_dir: str,
    glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over the events parquet. Schema-adaptive, as in
    ``tables.load_events``: a TIMESTAMP(NANOS) file is read as long nanos
    + exact DIV conversion; a timestamp[us] file is read as TIMESTAMP_NTZ
    and converted naive-as-UTC with tz-independent arithmetic (see
    ``tables.load_events`` — a session-tz-dependent cast would shift
    epochs under any non-UTC harness session).
    ``max_files_per_trigger`` throttles ingestion so a multi-file
    directory drains over several micro-batches — the shape real
    at-least-once redelivery arrives in."""
    from pyspark.sql.types import LongType as _Long  # noqa: PLC0415
    from pyspark.sql.types import TimestampNTZType  # noqa: PLC0415

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch_ts = spark.read.option("pathGlobFilter", glob).parquet(sf_dir).schema["ts"].dataType
    nanos = isinstance(batch_ts, _Long)
    schema = _events_schema(LongType() if nanos else TimestampNTZType())
    reader = spark.readStream.schema(schema).format("parquet").option("pathGlobFilter", glob)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.load(sf_dir)
    if nanos:
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return raw.withColumn(
        "ts",
        F.timestamp_micros(
            F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
        ),
    )


def streaming_tumbling_agg(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling count/sum per event_type; late rows beyond the
    watermark are dropped, state is bounded."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            aggregates.exact_sum("value").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


def streaming_sliding_agg(
    events: DataFrame, size: str = "1 hour", slide: str = "15 minutes", watermark: str = "2 hours"
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", size, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def streaming_session_agg(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Session windows via the built-in session_window (stateful)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("session_start"), F.col("w.end").alias("session_end"), "user_id", "n_events")
    )


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append") -> None:
    """Drive a streaming query over all currently-available input and stop —
    the deterministic harness pattern for batch-equivalence tests."""
    q = stream_df.writeStream.outputMode(output_mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()


def streaming_dedup(
    events: DataFrame,
    key_cols: tuple[str, ...] = ("event_id",),
    watermark: str = "2 hours",
) -> DataFrame:
    """Exactly-once event dedup on an unbounded stream:
    ``dropDuplicatesWithinWatermark`` keeps first-arrival per key and
    expires state once the key's event time falls behind the watermark —
    bounded state, unlike plain ``dropDuplicates`` on a stream, which
    retains every key forever. The standard at-least-once -> exactly-once
    repair step in front of downstream aggregation."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(list(key_cols))


def streaming_window_join(
    intervals: DataFrame,
    points: DataFrame,
    key: str = "user_id",
    interval_ts: str = "start_ts",
    point_ts: str = "ts",
    window: str = "15 minutes",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join with an event-time range condition: every
    ``points`` row within ``[interval_ts, interval_ts + window]`` of a
    matching-``key`` ``intervals`` row. The time bounds on BOTH event-time
    columns plus the watermarks let Spark compute a state eviction
    horizon for each side — without them a stream-stream join buffers
    both streams forever. State held is O(rows inside the watermark +
    range window), the bounded-state shape that survives an unbounded
    100 TB/day event feed. Columns of both inputs are preserved.

    ``how="leftOuter"``: unmatched ``intervals`` rows emit with NULL
    point columns — but only once the watermark passes their last
    possible match time (state eviction). Rows newer than
    ``max_seen_ts - watermark - window`` stay buffered and are NOT
    emitted when the query stops: a drained replay therefore needs a
    watermark-advancing sentinel past the real data (st09 does this),
    and a live pipeline simply keeps running. Null-emission rides the
    no-data micro-batch after the final data batch
    (``spark.sql.streaming.noDataMicroBatches.enabled``, default on).
    """
    l = intervals.withWatermark(interval_ts, watermark)
    r = points.withWatermark(point_ts, watermark)
    cond = (
        (l[key] == r[key])
        & (r[point_ts] >= l[interval_ts])
        & (r[point_ts] <= l[interval_ts] + F.expr(f"INTERVAL {window}"))
    )
    return l.join(r, cond, how).drop(r[key])


def streaming_static_enrich(
    events: DataFrame,
    dim: DataFrame,
    stream_key: str = "user_id",
    dim_key: str = "c_custkey",
    how: str = "inner",
) -> DataFrame:
    """Stream-static join: enrich an unbounded event stream with a
    bounded dimension table — the canonical streaming-enrichment shape.

    Unlike a stream-stream join this holds NO join state: the static
    side is (re-)planned per micro-batch, so a broadcast-sized dim costs
    one broadcast per batch and an updated dim table is picked up on the
    next batch automatically. No watermark is required for inner joins.
    At 100 TB/day stream volume the per-batch cost is the batch scan +
    one broadcast hash join — the same plan as the batch equivalent."""
    d = dim.withColumnRenamed(dim_key, stream_key) if dim_key != stream_key else dim
    return events.join(F.broadcast(d), stream_key, how)
