"""Aggregation / summary operators (A1-A6, O1-O7 helpers).

Reference semantics: processed/error counters (``app/etl.py:1103-1105``),
review-state categorization (``app/routes.py:527-549``), push summary
(``:2019-2028``), per-member ID rollups (``:1424-1447``), error summary by
category (``app/error_utils.py:224-244``). All are one-pass groupBy
aggregations with map-side partial aggregation for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def band_summary(items: DataFrame, band_col: str = "band") -> DataFrame:
    """A1/A2: item counts per confidence band."""
    return items.groupBy(band_col).agg(F.count("*").alias("n_items"))


def review_state_summary(reviews: DataFrame) -> DataFrame:
    """A2: pending / approved / rejected / ignored categorization."""
    state = (
        F.when(F.col("ignored"), F.lit("ignored"))
        .when(F.col("approved").isNull(), F.lit("pending"))
        .when(F.col("approved"), F.lit("approved"))
        .otherwise(F.lit("rejected"))
    )
    return reviews.groupBy(state.alias("state")).agg(F.count("*").alias("n"))


def per_member_rollup(items: DataFrame, member_col: str = "member_id", id_col: str = "matched_id") -> DataFrame:
    """A4/U2: distinct resolved IDs per member as a sorted array."""
    return (
        items.filter(F.col(id_col).isNotNull())
        .groupBy(member_col)
        .agg(F.sort_array(F.collect_set(id_col)).alias("all_ids"), F.count("*").alias("n_items"))
    )


def top_k_per_group(
    df: DataFrame, group_cols: list[str], order_col: str, k: int, tiebreak_cols: list[str] | None = None
) -> DataFrame:
    """O2/O3: bounded top-k per group with deterministic tie-breaks."""
    order = [F.desc(order_col)] + [F.asc(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return df.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def error_summary_by_category(
    errors: DataFrame, category_col: str = "category", ts_col: str = "ts", window_hours: int = 24
) -> DataFrame:
    """A5: last-N-hours error counts per category."""
    cutoff = F.current_timestamp() - F.expr(f"INTERVAL {window_hours} HOURS")
    return errors.filter(F.col(ts_col) >= cutoff).groupBy(category_col).agg(F.count("*").alias("n_errors"))


def observe_quota(df: DataFrame, bytes_col: str, name: str = "quota"):
    """A6 analog: attach an Observation aggregating processed bytes —
    Spark's ``observe`` replaces the reference's daily-quota accumulator
    (zero extra passes; metrics materialize with the first action).
    Returns (df_with_observation, observation); read ``observation.get``
    after an action and feed it to ``operators.quota.DailyQuota``."""
    from pyspark.sql import Observation  # noqa: PLC0415

    obs = Observation(name)
    out = df.observe(obs, F.sum(F.col(bytes_col)).alias("bytes_processed"), F.count(F.lit(1)).alias("rows"))
    return out, obs
