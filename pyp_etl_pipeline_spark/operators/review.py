"""Review-queue state machine (F6/F7/J6 bands + decision application, J12).

Reference semantics (``app/routes.py:522-869``):
- pending = approved IS NULL AND NOT ignored (F7, ``:527-529``)
- high-confidence band = 90 <= score < auto_resolve AND suggestion present
  (F8, ``:817-825``)
- batch decisions (approve-as-new / approve-high-confidence with the J8
  semantic guard / ignore-all) mutate (approved, resolved,
  matched_canonical_id, ignored)
- J12 canonical back-fill: matched ID -> display title via dim join with
  ``coalesce`` fallback to the suggestion (``:552-651``)

All decisions are applied as set-based joins/when-columns — the review
"queue" is just a DataFrame with a band column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyp_etl_pipeline_spark.operators.guard import semantically_valid_match
from pyp_etl_pipeline_spark.schema import AUTO_RESOLVE_THRESHOLD


def pending_reviews(reviews: DataFrame) -> DataFrame:
    """F7: approved IS NULL AND NOT ignored."""
    return reviews.filter(F.col("approved").isNull() & ~F.col("ignored"))


def high_confidence_band(reviews: DataFrame, lo: float = 90.0, hi: float = AUTO_RESOLVE_THRESHOLD) -> DataFrame:
    """F8: 90 <= score < auto-resolve threshold, suggestion present."""
    return reviews.filter(
        (F.col("score") >= lo) & (F.col("score") < hi) & F.col("suggested_ext_id").isNotNull()
    )


def apply_batch_approve_high_confidence(reviews: DataFrame) -> DataFrame:
    """Batch-approve the high-confidence band, gated by the J8 semantic
    guard; guard failures stay pending (exactly the reference's skip)."""
    eligible = (
        (F.col("approved").isNull())
        & ~F.col("ignored")
        & (F.col("score") >= 90.0)
        & (F.col("score") < AUTO_RESOLVE_THRESHOLD)
        & F.col("suggested_ext_id").isNotNull()
        & semantically_valid_match(F.col("item"), F.col("suggested_name"))
    )
    # pin eligibility BEFORE mutating approved: the predicate reads
    # approved, so updating it first would flip eligibility mid-chain
    return (
        reviews.withColumn("__eligible", eligible)
        .withColumn("approved", F.when(F.col("__eligible"), F.lit(True)).otherwise(F.col("approved")))
        .withColumn("resolved", F.when(F.col("__eligible"), F.lit(True)).otherwise(F.col("resolved")))
        .withColumn(
            "matched_canonical_id",
            F.when(F.col("__eligible"), F.col("suggested_ext_id")).otherwise(F.col("matched_canonical_id")),
        )
        .drop("__eligible")
    )


def apply_batch_ignore(reviews: DataFrame) -> DataFrame:
    """Ignore-all on pending rows."""
    pending = F.col("approved").isNull() & ~F.col("ignored")
    return reviews.withColumn("ignored", F.when(pending, F.lit(True)).otherwise(F.col("ignored")))


def apply_decisions(reviews: DataFrame, decisions: DataFrame, key: str = "item") -> DataFrame:
    """Join a decisions table (item_key, action, chosen_ext_id) onto the
    review queue. action in {approve_match, create_new, ignore}."""
    d = F.broadcast(decisions.select(F.col(key), "action", "chosen_ext_id"))
    j = reviews.join(d, key, "left")
    return (
        j.withColumn(
            "approved",
            F.when(F.col("action") == "approve_match", F.lit(True))
            .when(F.col("action") == "create_new", F.lit(True))
            .when(F.col("action") == "ignore", F.lit(False))
            .otherwise(F.col("approved")),
        )
        .withColumn(
            "resolved",
            F.when(F.col("action") == "approve_match", F.lit(True)).otherwise(F.col("resolved")),
        )
        .withColumn(
            "matched_canonical_id",
            F.when(F.col("action") == "approve_match", F.coalesce("chosen_ext_id", "suggested_ext_id"))
            .otherwise(F.col("matched_canonical_id")),
        )
        .withColumn("ignored", F.when(F.col("action") == "ignore", F.lit(True)).otherwise(F.col("ignored")))
        .drop("action", "chosen_ext_id")
    )


def backfill_canonical_names(
    items: DataFrame,
    dim: DataFrame,
    id_col: str = "matched_canonical_id",
    dim_id: str = "ext_id",
    dim_title: str = "title",
    fallback_col: str = "suggested_name",
    out_col: str = "display_name",
) -> DataFrame:
    """J12: resolve matched IDs back to display titles, falling back to the
    original suggestion (left join + coalesce — never N point lookups)."""
    d = F.broadcast(dim.select(F.col(dim_id).alias("__id"), F.col(dim_title).alias("__title")))
    return (
        items.join(d, items[id_col] == F.col("__id"), "left")
        .withColumn(out_col, F.coalesce(F.col("__title"), F.col(fallback_col)))
        .drop("__id", "__title")
    )
