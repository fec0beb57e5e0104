"""Type-2 slowly-changing-dimension history from a change log.

The reference's upsert sink (S9, ``operators/upsert.apply_merge``)
keeps only the LATEST state of each member. A warehouse-grade pipeline
also needs the history: when did each value become effective, when was
it superseded, which row is current. ``scd2_history`` builds exactly
that from an (key, ts, value) change log:

- consecutive observations with an UNCHANGED value collapse into one
  validity row (null-safe comparison — a null value is a real state);
- ``valid_from`` = first ts of the run, ``valid_to`` = the next run's
  start (NULL for the open/current row), ``is_current`` flags it.

Physical shape: ONE shuffle (hash by key); both windows — the
change-detection lag and the interval-closing lead — share the same
(key, ts) sort, which Catalyst plans as a single exchange + sort. No
self-joins, no per-key collect. At 100 TB a hot key costs one sorted
partition scan, nothing quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    changes: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Collapse an ordered change log into SCD2 validity intervals.

    ``changes`` must carry at most one observation per (key, ts) —
    pre-aggregate duplicates with a deterministic rule first (see j14).
    Output: (key, value, valid_from, valid_to, is_current), one row per
    value RUN, ordered semantics identical in any partitioning.
    """
    key, ts, val = F.col(key_col), F.col(ts_col), F.col(value_col)
    w = Window.partitionBy(key_col).orderBy(ts_col)
    prev = F.lag(val).over(w)
    # run starts: first observation, or value differs from the previous
    # (null-safe: NULL -> 'x' and 'x' -> NULL are both real transitions)
    runs = changes.withColumn("__start", F.lag(ts_col).over(w).isNull() | ~val.eqNullSafe(prev))
    starts = runs.filter(F.col("__start")).select(key, val.alias("__value"), ts.alias("valid_from"))
    w2 = Window.partitionBy(key_col).orderBy("valid_from")
    return (
        starts.withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(
            key,
            F.col("__value").alias(value_col),
            "valid_from",
            "valid_to",
            "is_current",
        )
    )
