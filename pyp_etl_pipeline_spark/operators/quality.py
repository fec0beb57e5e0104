"""Data-quality expectations and snapshot diffing.

Two classic pipeline-hardening operators (extension tier — the
reference's F-family validates ROWS; these validate TABLES and table
VERSIONS):

- ``expectation_report``: declarative table-level checks (null rate,
  uniqueness, value range, referential integrity) evaluated in ONE
  aggregate pass per table + one small semi-join per FK rule, producing
  a (rule, metric, threshold, ok) report — the Great-Expectations-style
  contract gate a pipeline runs before publishing a table.
- ``diff_snapshots``: keyed change-data capture between two table
  versions — INSERT / DELETE / UPDATE rows from one full-outer join,
  with UPDATE detected by null-safe comparison over the tracked
  columns. The standard way to turn periodic full snapshots into an
  incremental feed.

Both are pure DataFrame algebra: the report is map-side-combinable
aggregates (output rows = number of rules); the diff is one shuffle on
the key (or zero if both snapshots are bucketed/co-partitioned on it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _rule_row(name: str, metric, threshold, ok) -> F.Column:
    return F.struct(
        F.lit(name).alias("rule"),
        metric.cast("double").alias("metric"),
        F.lit(float(threshold)).alias("threshold"),
        ok.alias("ok"),
    )


def expectation_report(
    df: DataFrame,
    not_null: dict[str, float] | None = None,
    unique: tuple[str, ...] = (),
    ranges: dict[str, tuple[float, float]] | None = None,
) -> DataFrame:
    """Evaluate table-level expectations in one aggregate pass.

    - ``not_null``: {column: max allowed null fraction}
    - ``unique``: columns whose values must be globally unique
    - ``ranges``: {column: (lo, hi)} — metric is the IN-RANGE fraction,
      threshold 1.0

    Output: (rule, metric, threshold, ok), one row per rule. All rules
    ride ONE map-side-combined aggregate (null counts, distinct counts,
    range counts); the report explodes from a single aggregated row, so
    the operator costs one scan regardless of rule count.

    Uniqueness is over NON-NULL values (SQL-UNIQUE-constraint
    semantics: nulls are neither duplicates of each other nor of
    anything) — pair with a ``not_null`` rule when nulls themselves are
    a defect. An empty table passes every rule with defined metrics
    (never NULL ok flags).
    """
    not_null = not_null or {}
    ranges = ranges or {}
    n = F.count(F.lit(1))
    rules = []
    for col, max_frac in not_null.items():
        frac = F.when(n > 0, F.sum(F.col(col).isNull().cast("long")) / n).otherwise(0.0)
        rules.append(_rule_row(f"not_null:{col}", frac, max_frac, frac <= max_frac))
    for col in unique:
        # metric = excess-duplicate fraction among non-null values:
        # count(col) skips nulls, so all-distinct-plus-nulls scores 0
        dup = F.when(
            n > 0, (F.count(F.col(col)) - F.count_distinct(F.col(col))) / n
        ).otherwise(0.0)
        rules.append(_rule_row(f"unique:{col}", dup, 0.0, dup <= 0))
    for col, (lo, hi) in ranges.items():
        inr = F.when(
            n > 0, F.coalesce(F.sum(F.col(col).between(lo, hi).cast("long")), F.lit(0)) / n
        ).otherwise(1.0)
        rules.append(_rule_row(f"range:{col}", inr, 1.0, inr >= 1.0))
    agg = df.agg(F.array(*rules).alias("__rules"))
    return agg.select(F.explode("__rules").alias("r")).select("r.rule", "r.metric", "r.threshold", "r.ok")


def referential_report(
    child: DataFrame,
    parent: DataFrame,
    fk: str,
    pk: str,
) -> DataFrame:
    """FK integrity as a rule row: fraction of child rows whose ``fk``
    exists in ``parent.pk`` (nulls count as misses). One anti-join."""
    total = child.count()
    orphans = child.join(
        parent.select(F.col(pk).alias(fk)).distinct(), fk, "left_anti"
    ).count()
    frac = (total - orphans) / total if total else 1.0
    spark = child.sparkSession
    return spark.createDataFrame(
        [(f"fk:{fk}->{pk}", float(frac), 1.0, orphans == 0)],
        "rule string, metric double, threshold double, ok boolean",
    )


def diff_snapshots(
    old: DataFrame,
    new: DataFrame,
    key_cols: tuple[str, ...],
    compare_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """Keyed CDC between two snapshots: one full-outer join on the key.

    Output: key columns + ``change`` ('insert' | 'delete' | 'update')
    + old_/new_ prefixed tracked columns; unchanged rows are dropped.
    UPDATE uses null-safe comparison per tracked column (NULL -> value
    and value -> NULL are real changes). One shuffle on the key — or
    none when both snapshots are bucketed on it (``sources/bucketed``).
    """
    if compare_cols is None:
        compare_cols = tuple(c for c in new.columns if c not in key_cols)
    o = old.select(
        *key_cols,
        F.lit(True).alias("__in_old"),
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
    )
    nw = new.select(
        *key_cols,
        F.lit(True).alias("__in_new"),
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
    )
    j = o.join(nw, list(key_cols), "full_outer")
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("insert"))
        .when(F.col("__in_new").isNull(), F.lit("delete"))
        .when(changed, F.lit("update"))
    )
    return (
        j.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(
            *key_cols,
            "change",
            *[F.col(f"old_{c}") for c in compare_cols],
            *[F.col(f"new_{c}") for c in compare_cols],
        )
    )


def linkage_eval(
    pred: DataFrame,
    truth: DataFrame,
    keys: tuple[str, str] = ("id_a", "id_b"),
) -> DataFrame:
    """Confusion metrics for a candidate-pair generator against a truth
    pair set: one row with n_pred / n_truth / tp / fp / fn and
    precision / recall / F1 in exact integer micro-units (integer
    division — bit-identical on any engine; no float ratio drift).

    The eval every blocking/LSH scheme needs before it ships: recall
    tells you what the blocker misses, precision what the verifier must
    absorb. Shape: two distinct-aggregates + one full outer join on the
    pair key, then a single global rollup — all map-side combinable;
    never materializes a cross product. Zero denominators yield NULL
    metrics rather than a divide error.
    """
    ks = list(keys)
    p = pred.select(*ks).distinct().withColumn("in_pred", F.lit(1))
    t = truth.select(*ks).distinct().withColumn("in_truth", F.lit(1))
    j = p.join(t, ks, "full")
    agg = j.agg(
        F.coalesce(F.sum("in_pred"), F.lit(0)).cast("long").alias("n_pred"),
        F.coalesce(F.sum("in_truth"), F.lit(0)).cast("long").alias("n_truth"),
        F.sum(
            F.when(F.col("in_pred").isNotNull() & F.col("in_truth").isNotNull(), 1).otherwise(0)
        ).cast("long").alias("tp"),
    )
    pm = F.expr("IF(n_pred > 0, (tp * 1000000) DIV n_pred, NULL)")
    rm = F.expr("IF(n_truth > 0, (tp * 1000000) DIV n_truth, NULL)")
    return (
        agg.withColumn("fp", (F.col("n_pred") - F.col("tp")).cast("long"))
        .withColumn("fn", (F.col("n_truth") - F.col("tp")).cast("long"))
        .withColumn("precision_micro", pm.cast("long"))
        .withColumn("recall_micro", rm.cast("long"))
        .withColumn(
            "f1_micro",
            F.expr(
                "IF(precision_micro IS NOT NULL AND recall_micro IS NOT NULL "
                "AND precision_micro + recall_micro > 0, "
                "(2 * precision_micro * recall_micro) DIV (precision_micro + recall_micro), NULL)"
            ).cast("long"),
        )
    )


def profile_table(df: DataFrame, cols: tuple[str, ...]) -> DataFrame:
    """One-pass column profiler: per column, row count, null count,
    exact distinct count, and min/max rendered as strings — the ANALYZE/
    data-catalog summary every ingestion pipeline publishes next to a
    table. All metrics ride ONE aggregate over one scan (multi-distinct
    lowers to a single Expand + shuffle in Spark), then unpivot to long
    format via ``stack`` — never one job per column. At 100 TB swap the
    exact distincts for the HLL registers (operators/sketch) the same
    way ia01 does; the output contract is unchanged.
    """
    aggs = [F.count("*").cast("long").alias("__n")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).cast("long").alias(f"__nn_{c}"),
            F.count_distinct(F.col(c)).cast("long").alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nn_{c}, __nd_{c}, __mn_{c}, __mx_{c}" for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS (column, n_non_null, n_distinct, min_str, max_str)",
        "__n AS n_rows",
    ).select(
        "column",
        F.col("n_rows"),
        (F.col("n_rows") - F.col("n_non_null")).cast("long").alias("n_null"),
        "n_distinct",
        "min_str",
        "max_str",
    )
