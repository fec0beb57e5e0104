"""Incremental aggregate maintenance: partial states that MERGE.

A 100 TB rollup must not recompute history when a day of data lands.
The pattern: persist per-group PARTIAL AGGREGATE STATE — all of it
algebraic (count / integer-micro sum / min / max) or register-shaped
(HLL max-rho per register, operators/sketch.hll_registers) — and fold
each new batch in with a union + groupBy merge whose cost is
O(batch + |state|), never O(history). Finalization (avg from sums, the
HLL harmonic estimate) happens only at read time, so states stay
mergeable forever.

Certified by ia01: history-state merged with a delta-state hashes
IDENTICAL to the single-pass aggregate over the full input (the DuckDB
oracle computes the latter) — the algebraic-correctness property that
makes the incremental path safe to ship.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyp_etl_pipeline_spark.functions import aggregates
from pyp_etl_pipeline_spark.operators import sketch

StatePair = tuple[DataFrame, DataFrame]


def agg_state(
    df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    distinct_col: str = "user_id",
    p: int = 8,
) -> StatePair:
    """Partial state for one batch: (scalars, hll_registers).

    scalars: one row per group — n_rows, n_vals (non-null values),
    sum_micro (exact integer), min_m / max_m (micro). registers:
    (group, __reg, __r) for the distinct-count sketch. Both are
    map-side-combinable single-shuffle aggregates over the batch."""
    m = aggregates.micro_col(value_col)
    scalars = (
        df.select(
            F.col(group_col),
            m.alias("__m"),
        )
        .groupBy(group_col)
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.count("__m").cast("long").alias("n_vals"),
            F.sum("__m").alias("sum_micro"),
            F.min("__m").alias("min_m"),
            F.max("__m").alias("max_m"),
        )
    )
    regs = sketch.hll_registers(df, distinct_col, (group_col,), p=p)
    return scalars, regs


def merge_states(a: StatePair, b: StatePair, group_col: str = "event_type") -> StatePair:
    """Merge two partial states: scalar rows add/min/max by group;
    register rows take the per-(group, register) max. Associative and
    commutative — any number of batches folds in, in any order."""
    sa, ra = a
    sb, rb = b
    scalars = (
        sa.unionByName(sb)
        .groupBy(group_col)
        .agg(
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.sum("n_vals").cast("long").alias("n_vals"),
            F.sum("sum_micro").alias("sum_micro"),
            F.min("min_m").alias("min_m"),
            F.max("max_m").alias("max_m"),
        )
    )
    regs = (
        ra.unionByName(rb)
        .groupBy(group_col, "__reg")
        .agg(F.max("__r").alias("__r"))
    )
    return scalars, regs


def finalize_state(
    state: StatePair, group_col: str = "event_type", p: int = 8
) -> DataFrame:
    """Read-time finalization: exact sum/avg from the integer state,
    min/max back to value units, HLL estimate from merged registers."""
    scalars, regs = state
    est = sketch.hll_finalize(regs, (group_col,), p=p).select(
        group_col, "est_distinct"
    )
    return (
        scalars.join(est, group_col, "left")
        .select(
            group_col,
            F.col("n_rows"),
            F.col("n_vals"),
            aggregates.finalize_sum(F.col("sum_micro")).alias("sum_value"),
            aggregates.finalize_avg(F.col("sum_micro"), F.col("n_vals")).alias("avg_value"),
            (F.col("min_m") / 1_000_000.0).cast("double").alias("min_value"),
            (F.col("max_m") / 1_000_000.0).cast("double").alias("max_value"),
            F.col("est_distinct"),
        )
    )
