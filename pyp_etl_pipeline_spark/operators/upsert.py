"""MERGE-style upsert operators (J9/J10/S9) — set-based, no point lookups.

Reference semantics:
- J10 dim lookup-or-create (``app/routes.py:1149-1219``, ``:1650-1733``,
  ``:1756-1810``): per-title point query, insert on miss, capture new ID.
  Here: one left join against the dimension + deterministic generated IDs
  (``md5(lower(trim(title)))``) for misses — the classic two-phase dim
  upsert collapsed into one distributed pass.
- J9 member upsert probe (``app/routes.py:1319-1364``): businessName
  equality decides update-vs-insert. Here: full outer join -> action column
  (update / insert / delete-candidate), i.e. MERGE INTO semantics emulated
  with joins on plain parquet (Delta/Iceberg would make it a literal MERGE).
- S9 sink write: join-based apply of the action column.

The reference does 1-4 HTTP point lookups *per member* at push time; these
operators replace that wholesale with joins (the #1 scale fix).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyp_etl_pipeline_spark.functions.text import lower_key


def generated_id(c, prefix: str = "gen:"):
    """Deterministic surrogate ID for newly-created dimension rows.
    md5 of the lowercase key — stable across runs/engines, no sequence
    bottleneck at scale (vs. monotonically_increasing_id)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.concat(F.lit(prefix), F.md5(lower_key(col)))


def dim_lookup_or_create(
    staged: DataFrame,
    dim: DataFrame,
    staged_title: str = "title",
    dim_title: str = "title",
    dim_id: str = "ext_id",
    broadcast_dim: bool = True,
) -> DataFrame:
    """J10: one row per distinct staged title with
    ``final_id`` (existing or generated) and ``is_new``."""
    s = staged.select(F.col(staged_title).alias("title")).filter(F.col("title").isNotNull()).distinct()
    d = dim.select(lower_key(dim_title).alias("__key"), F.col(dim_id).alias("__existing_id"))
    if broadcast_dim:
        d = F.broadcast(d)
    out = s.join(d, lower_key("title") == F.col("__key"), "left").drop("__key")
    return out.select(
        "title",
        F.coalesce(F.col("__existing_id"), generated_id("title")).alias("final_id"),
        F.col("__existing_id").isNull().alias("is_new"),
    )


def new_dim_rows(lookup: DataFrame) -> DataFrame:
    """The insert half of the two-phase dim upsert."""
    return lookup.filter(F.col("is_new")).select("title", F.col("final_id").alias("ext_id"))


def merge_classify(
    staged: DataFrame,
    sink: DataFrame,
    key: str = "businessName",
    sink_key: str | None = None,
) -> DataFrame:
    """J9: full outer join on the business key -> MERGE action column.

    Returns (key, action) with action in {update, insert, sink_only}.
    ``update`` = key in both; ``insert`` = staged only; ``sink_only`` rows
    are untouched (kept for audit symmetry with the reference's skip path).
    """
    sink_key = sink_key or key
    s = staged.select(lower_key(key).alias("merge_key"), F.col(key).alias("staged_name")).distinct()
    t = sink.select(lower_key(sink_key).alias("merge_key"), F.col(sink_key).alias("sink_name")).distinct()
    j = s.join(t, "merge_key", "full_outer")
    return j.select(
        "merge_key",
        F.coalesce("staged_name", "sink_name").alias("name"),
        F.when(F.col("staged_name").isNotNull() & F.col("sink_name").isNotNull(), F.lit("update"))
        .when(F.col("staged_name").isNotNull(), F.lit("insert"))
        .otherwise(F.lit("sink_only"))
        .alias("action"),
    )


def apply_merge(
    staged: DataFrame,
    sink: DataFrame,
    key_cols: list[str],
) -> DataFrame:
    """S9 emulated MERGE: staged rows replace matching sink rows; unmatched
    sink rows survive. (anti-join + union — the plain-parquet MERGE.)"""
    survivors = sink.join(staged.select(*key_cols).distinct(), key_cols, "left_anti")
    return survivors.unionByName(staged, allowMissingColumns=True)


def processed_files_gate(incoming: DataFrame, ledger: DataFrame, file_col: str = "source_file") -> DataFrame:
    """Idempotent re-ingest (reference ``app/etl.py:910-920`` row lock):
    drop rows whose file already appears in the processed-files ledger."""
    return incoming.join(F.broadcast(ledger.select(file_col).distinct()), file_col, "left_anti")
