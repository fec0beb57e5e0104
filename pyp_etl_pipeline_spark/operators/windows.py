"""Event-time window operators over the events table (stage-5 extension).

Batch implementations chosen to have exact ANSI-SQL twins (DuckDB oracle):
- tumbling windows: date_trunc bucketing
- sliding windows: explode each event into the ceil(size/slide) windows
  containing it (epoch arithmetic; engine-portable, unlike F.window's
  struct output)
- sessionization: gaps-and-islands via lag + running sum — the classic
  formulation, identical semantics in any SQL engine. Streaming variants
  live in ``pyp_etl_pipeline_spark/streaming``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyp_etl_pipeline_spark.functions import aggregates


def tumbling_agg(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    unit: str = "hour",
) -> DataFrame:
    """Tumbling window aggregate: count + sum + avg per (bucket, key).

    Order-independent exact aggregation: double sums flip their last
    cent across partition layouts (functions/aggregates.py). The micro
    conversion is pre-projected once and shared by sum and avg."""
    pre = df.select(
        F.date_trunc(unit, F.col(ts_col)).alias("window_start"),
        F.col(key_col),
        aggregates.micro_col(value_col).alias("__m"),
        F.col(value_col).isNotNull().cast("long").alias("__nn"),
    )
    agg = pre.groupBy("window_start", key_col).agg(
        F.count("*").alias("n_events"),
        F.sum("__m").alias("__s"),
        F.sum("__nn").alias("__cnt"),
    )
    return agg.select(
        "window_start",
        key_col,
        "n_events",
        aggregates.finalize_sum(F.col("__s")).alias("sum_value"),
        aggregates.finalize_avg(F.col("__s"), F.col("__cnt")).alias("avg_value"),
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    size_s: int = 3600,
    slide_s: int = 900,
) -> DataFrame:
    """Sliding window aggregate (size/slide in seconds, epoch-aligned).

    Each event belongs to size/slide windows; we explode into those
    window starts then aggregate — identical to F.window(ts, size, slide)
    but with a portable BIGINT epoch window_start."""
    n = size_s // slide_s
    epoch = F.col(ts_col).cast("long")  # floor-to-second (sign-safe; unix_timestamp truncates pre-1970)
    anchor = F.floor(epoch / slide_s) * slide_s
    starts = F.transform(F.sequence(F.lit(0), F.lit(n - 1)), lambda i: anchor - i * slide_s)
    return (
        df.select(F.explode(starts).alias("window_start"), F.col(key_col), F.col(value_col))
        .groupBy("window_start", key_col)
        .agg(
            F.count("*").alias("n_events"),
            aggregates.exact_sum(value_col).alias("sum_value"),
        )
    )


def sessionize(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_s: int = 1800,
    tiebreak_col: str | None = "event_id",
) -> DataFrame:
    """Gaps-and-islands sessionization: a session breaks when the gap to the
    previous event of the same user exceeds ``gap_s`` seconds.

    Output: one row per session with start/end epoch, event count.
    ``tiebreak_col`` makes the per-user ordering total when timestamps
    collide; when the column is absent, a single ``xxhash64`` surrogate of
    the remaining columns joins the ordering instead, so colliding
    timestamps still order deterministically across runs (row order within
    a window partition is otherwise unspecified and the lag-based session
    split would be nondeterministic). Hash collisions are harmless: the
    session aggregates (min/max/count) are invariant to tie order.
    Scale note: one shuffle on user_id; the window sort is per-user and
    AQE handles skewed users; for power-law users add a salt prefix split.
    """
    order = [F.col(ts_col).asc()]
    if tiebreak_col and tiebreak_col in df.columns:
        order.append(F.col(tiebreak_col).asc())
    else:
        # One 8-byte surrogate key instead of every remaining column: the
        # per-user window sort pays (ts, hash) bytes regardless of row width.
        rest = [c for c in df.columns if c not in (ts_col, user_col)]
        if rest:
            order.append(F.xxhash64(F.struct(*[F.col(c) for c in rest])).asc())
    w = Window.partitionBy(user_col).orderBy(*order)
    epoch = F.col(ts_col).cast("long")  # floor-to-second (sign-safe; unix_timestamp truncates pre-1970)
    gap = epoch - F.lag(epoch).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_s), 1).otherwise(0)
    sess = df.withColumn("__new", is_new).withColumn(
        "session_seq", F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sess.groupBy(user_col, "session_seq")
        .agg(
            F.min(epoch).alias("session_start"),
            F.max(epoch).alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .withColumn("duration_s", F.col("session_end") - F.col("session_start"))
    )


def group_zscores(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    z_threshold: float = 3.0,
    quant: int = 100,
) -> DataFrame:
    """Per-group z-score anomaly flags — the standard outlier screen
    over metric streams (per event type, per tenant, per sensor).

    Engine-portable by the module's usual trick: values quantize to
    ``1/quant`` units (centi by default) and the group moments are EXACT
    integer sums (map-side combinable, order-independent), so mean and
    variance are identical on any engine/partitioning; only the final
    mean/var/z arithmetic runs in doubles, on identical integer inputs.
    With centi units the sum-of-squares stays in int64 up to ~1e9 rows
    per group at |value| <= 1e5 — beyond that, widen ``quant`` down or
    pre-aggregate.

    Physical shape: one map-side-combined groupBy for the moments
    (output rows = groups), broadcast back over the stream; the flag
    itself is map-only. No window, no sort of the event stream.

    Output: (id, group, value, z, is_anomaly); z = 0 for zero-variance
    groups, rounded to 6.
    """
    q = F.floor(F.col(value_col).cast("double") * quant + F.lit(0.5)).cast("long")
    # null metrics are excluded OUTRIGHT (not just from the sums): a
    # null would otherwise inflate count(*) while F.sum skips it,
    # silently biasing mean/variance
    v = df.filter(F.col(value_col).isNotNull()).select(
        F.col(id_col).alias("id"), F.col(group_col).alias("grp"),
        F.col(value_col).alias("value"), q.alias("__q"),
    )
    stats = v.groupBy("grp").agg(
        F.count("*").alias("__n"),
        F.sum("__q").alias("__s"),
        F.sum(F.col("__q") * F.col("__q")).alias("__s2"),
    )
    mean = F.col("__s").cast("double") / F.col("__n")
    var = (F.col("__s2").cast("double") - mean * F.col("__s").cast("double")) / F.col("__n")
    z = F.when(var <= 0, F.lit(0.0)).otherwise(
        (F.col("__q").cast("double") - mean) / F.sqrt(var)
    )
    return (
        v.join(F.broadcast(stats), "grp")
        .select(
            "id",
            F.col("grp").alias(group_col),
            "value",
            F.round(z, 6).alias("z"),
            (F.abs(z) > F.lit(z_threshold)).alias("is_anomaly"),
        )
    )


def ewma_by_key(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key exponentially weighted moving average with alpha = 1/2 in
    EXACT integer centi-units: s_0 = v_0, s_t = floor((s_{t-1} + v_t)/2)
    over the key's events in (ts, tiebreak) order. The ordered stateful
    fold every monitoring pipeline needs (recency-weighted level per
    user/device), made engine-portable by integer halving — no float
    accumulation, identical on any engine and any partitioning (w09).

    Shape: one shuffle on the key, the per-key history folded as an
    in-row array (``sort_array`` + ``aggregate`` — the same bounded
    per-key-history envelope as sessionization). Null values are
    excluded; keys with no non-null values drop out.
    """
    centi = F.floor(F.col(value_col).cast("double") * 100 + F.lit(0.5)).cast("long")
    rows = events.filter(F.col(value_col).isNotNull()).select(
        F.col(key_col).alias("key"),
        F.struct(
            F.col(ts_col).alias("ts"), F.col(tiebreak_col).alias("tb"), centi.alias("v")
        ).alias("e"),
    )
    agg = rows.groupBy("key").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sort_array(F.collect_list("e")).alias("__es"),
    )
    vals = F.transform(F.col("__es"), lambda e: e["v"])
    ewma = F.aggregate(
        F.slice(vals, 2, F.size(vals) - 1),
        F.element_at(vals, 1),
        lambda acc, x: F.floor((acc + x) / 2).cast("long"),
    )
    return agg.select(F.col("key").alias(key_col), "n_events", ewma.alias("ewma_centi"))


def gap_fill(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    unit: str = "hour",
) -> DataFrame:
    """Calendar-spine gap fill: per key, emit EVERY ``unit`` bucket from
    the key's first to last observation, zero-filling counts for missing
    buckets and carrying the last observed sum forward (LOCF). The
    standard densification step before any time-series model or rolling
    metric — downstream windows silently skip missing buckets otherwise.

    Shape: one map-side-combinable aggregate to (key, bucket); a k-row
    bounds aggregate per key; the spine is generated DISTRIBUTED via
    ``sequence`` + explode on the bounds rows (never a driver-side
    calendar); one left join back. At 100 TB the join is
    shuffle-on-(key, bucket) against an agg output that is already tiny
    relative to the raw events; spine length per key = span/unit rows,
    so for multi-year spans at fine units repartition the exploded spine
    by key range before the join. Sums use exact integer micro-units
    (order-independent; functions/aggregates.py). LOCF is a running
    ``last(ignorenulls)`` over the per-key bucket order — deterministic
    because buckets are unique per key.
    """
    pre = events.select(
        F.col(key_col),
        F.date_trunc(unit, F.col(ts_col)).alias("bucket"),
        aggregates.micro_col(value_col).alias("__m"),
    )
    agg = pre.groupBy(key_col, "bucket").agg(
        F.count("*").alias("__n"),
        F.sum("__m").alias("__s"),
    )
    bounds = agg.groupBy(key_col).agg(
        F.min("bucket").alias("__lo"), F.max("bucket").alias("__hi")
    )
    spine = bounds.select(
        key_col,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.expr(f"interval 1 {unit}"))
        ).alias("bucket"),
    )
    joined = spine.join(agg, [key_col, "bucket"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        key_col,
        "bucket",
        F.coalesce(F.col("__n"), F.lit(0)).cast("long").alias("n_events"),
        aggregates.finalize_sum(F.col("__s")).alias("sum_value"),
        F.col("__n").isNull().alias("filled"),
        aggregates.finalize_sum(
            F.last("__s", ignorenulls=True).over(w)
        ).alias("locf_sum"),
    )
