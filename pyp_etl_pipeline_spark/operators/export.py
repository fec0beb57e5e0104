"""Deterministic sharded export of a training corpus.

The last step of a data pipeline: write the corpus as N stable shards
whose membership depends only on the row key — not on partition count,
cluster size, or input order — so a re-run, a resumed export, or a
different cluster produces byte-identical shard membership. Downstream
trainers then stream shard files independently (one reader per shard)
and any shard can be re-exported alone.

Hash is the engine-portable md5-prefix integer (same family as the
MinHash/sampling operators) rather than Spark's internal ``hash()``:
reproducible in any system that can md5, which is what makes the shard
layout a durable CONTRACT rather than an engine artifact.

Scale: assignment is map-only; the write is one hash repartition by
shard (each output task writes exactly one shard directory via
``partitionBy``) with rows sorted by key inside the shard for
deterministic file content.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def shard_key(c: Column | str) -> Column:
    """Portable 60-bit integer hash of a key column (md5-prefix)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("long")


def shard_assign(df: DataFrame, id_col: str = "doc_id", n_shards: int = 16) -> DataFrame:
    """Add a deterministic ``shard`` column in [0, n_shards)."""
    return df.withColumn("shard", (shard_key(id_col) % F.lit(n_shards)).cast("int"))


def write_sharded(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    n_shards: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as ``path/shard=K/`` parquet directories: one
    shuffle keyed by shard, rows sorted by ``id_col`` within each shard
    so repeated exports of the same data produce identical files."""
    out = shard_assign(df, id_col, n_shards)
    (
        out.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", id_col)
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(path)
    )


def write_jsonl_sharded(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    n_shards: int = 16,
    mode: str = "overwrite",
    compression: str | None = None,
) -> None:
    """JSONL variant of ``write_sharded`` — the interchange format LLM
    trainers actually consume (one JSON document per line,
    ``path/shard=K/*.json[.gz]``). Same deterministic shard contract:
    membership is a pure function of the key, rows sort by key within a
    shard. Pass ``compression='gzip'`` for .gz shards (each FILE is a
    whole shard, so gzip's non-splittability doesn't matter — readers
    parallelize across shards, the reason sharded-gz is the de-facto
    corpus layout)."""
    out = shard_assign(df, id_col, n_shards)
    w = (
        out.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", id_col)
        .write.mode(mode)
        .partitionBy("shard")
    )
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def zvalue(x: Column | str, y: Column | str, bits: int = 16) -> Column:
    """Morton/Z-order key: interleave the low ``bits`` bits of two
    non-negative integer columns (x in even positions, y in odd).
    Pure integer bit algebra — engine-portable, no UDF.

    This is the multi-dimensional clustering key behind Delta/Iceberg
    Z-ORDER: sorting or range-partitioning files by z-value co-locates
    rows close in BOTH dimensions, so min/max file statistics prune
    2-D range predicates that a single-column sort can only prune on
    its leading column."""
    xc = (F.col(x) if isinstance(x, str) else x).cast("long")
    yc = (F.col(y) if isinstance(y, str) else y).cast("long")

    def bit(c: Column, i: int) -> Column:
        # values are bounded by 2^bits << 2^52, so the floor-div is exact
        return F.pmod(F.floor(c / F.lit(1 << i)).cast("long"), F.lit(2))

    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(bit(xc, i), 2 * i) + F.shiftleft(bit(yc, i), 2 * i + 1)
    return z


def sql_zvalue(x: str, y: str, bits: int = 16) -> str:
    """DuckDB twin of ``zvalue``."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} // {1 << i}) % 2) << {2 * i})")
        terms.append(f"((({y} // {1 << i}) % 2) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def plan_compaction(
    files: DataFrame,
    size_col: str,
    order_col: str,
    target_size: int,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Small-file compaction planner: assign files (in ``order_col``
    order, preserving sort/clustering) to merge groups of roughly
    ``target_size`` bytes — ``merge_group = (cum_size - size) DIV
    target`` over the deterministic distributed prefix sum
    (operators/prefix; never a single-partition window). The lakehouse
    OPTIMIZE planning step: metadata-sized input (one row per file), so
    the plan for a million-file table is itself a trivial job, and the
    order-preserving assignment keeps data-skipping ranges intact after
    the rewrite. Exclusive-prefix keying guarantees every group gets at
    least one file and groups are contiguous in the sort order.
    """
    from pyp_etl_pipeline_spark.operators.prefix import grouped_prefix_sum  # noqa: PLC0415

    cum = grouped_prefix_sum(
        files, size_col, order_col, group_cols=group_cols, cum_col="__cum"
    )
    return cum.withColumn(
        "merge_group",
        ((F.col("__cum") - F.col(size_col)) / F.lit(target_size)).cast("long"),
    ).drop("__cum")
