"""Streaming MERGE sink: per-micro-batch keyed upsert via foreachBatch.

The standard Structured Streaming pattern for maintaining a keyed state
table (latest row per key) on a store without native MERGE: every
micro-batch elects its per-key winners, merges them against the current
published snapshot, and publishes the result with the engine's atomic
snapshot-swap sink (``sources/sinks.write_versioned_snapshot`` —
readers only ever see a committed version). On Delta/Iceberg the merge
step becomes ``MERGE INTO`` and the snapshot rewrite disappears; the
foreachBatch skeleton is identical.

Exactly-once: the snapshot version is keyed by the micro-batch epoch id,
and a replayed epoch (restart after a sink write but before the source
commit) detects that the ``_CURRENT`` pointer already covers it and
SKIPS — the documented idempotent-foreachBatch contract. Detection must
key on the POINTER (flipped only after the parquet write commits), not
on the data directory: Spark creates ``v=epochN/`` before the write
commits, so a crash mid-write leaves the directory present but
unpublished — a directory-existence check would skip the replay and
silently lose the batch. A leftover partial directory is instead
removed and rewritten.

Scale envelope: the state table is rewritten per batch, so it must be
dimension-sized (latest-per-user, device registry), not corpus-sized —
the same envelope as any snapshot-maintained dim. Winner election is a
map-side-combinable ``max(struct)`` on both the batch and the merge, so
the only shuffle per batch is keyed by the (small) key space.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyp_etl_pipeline_spark.sources.sinks import read_current_snapshot, write_versioned_snapshot


def elect_latest(df: DataFrame, key_cols: tuple[str, ...], order_cols: tuple[str, ...]) -> DataFrame:
    """One row per key: the max by ``order_cols`` (lexicographic; make the
    last order col unique for a deterministic winner). map-side-combinable
    aggregate, no window."""
    payload = [c for c in df.columns if c not in key_cols]
    ordered = list(order_cols) + [c for c in payload if c not in order_cols]
    out = df.groupBy(*[F.col(k) for k in key_cols]).agg(
        F.max(F.struct(*ordered)).alias("__w")
    )
    return out.select(*key_cols, *[F.col(f"__w.{c}").alias(c) for c in payload])


def foreach_batch_upsert(
    root: str,
    key_cols: tuple[str, ...],
    order_cols: tuple[str, ...],
):
    """Build the foreachBatch function: merge each micro-batch's winners
    into the versioned snapshot at ``root``, idempotently per epoch."""

    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        version = f"epoch{epoch_id:010d}"
        # Replay detection via the committed pointer, NOT the data dir:
        # versions are zero-padded, so string order == epoch order, and
        # _CURRENT only ever advances after a completed write.
        published = current_version(root)
        if published is not None and published >= version:
            return  # replayed epoch: pointer proves the publish committed
        snap = os.path.join(root, f"v={version}")
        if os.path.exists(snap):
            import shutil  # noqa: PLC0415

            shutil.rmtree(snap)  # partial write from a crashed attempt
        spark = batch_df.sparkSession
        winners = elect_latest(batch_df, key_cols, order_cols)
        if os.path.exists(os.path.join(root, "_CURRENT")):
            current = read_current_snapshot(spark, root)
            winners = elect_latest(current.unionByName(winners), key_cols, order_cols)
        write_versioned_snapshot(winners, root, version=version)

    return fn


def run_streaming_upsert(
    stream_df: DataFrame,
    root: str,
    key_cols: tuple[str, ...] = ("user_id",),
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> None:
    """Drain all currently-available input through the upsert sink and
    stop (the deterministic harness pattern, as ``run_to_memory``)."""
    q = (
        stream_df.writeStream.foreachBatch(foreach_batch_upsert(root, key_cols, order_cols))
        .option("checkpointLocation", os.path.join(root, "_checkpoint"))
        .start()
    )
    q.processAllAvailable()
    q.stop()


def published_versions(root: str) -> list[str]:
    """Snapshot versions present under ``root`` (ascending epoch order)."""
    if not os.path.isdir(root):
        return []
    vs = [d[2:] for d in os.listdir(root) if d.startswith("v=")]
    return sorted(vs)


def current_version(root: str) -> str | None:
    pointer = os.path.join(root, "_CURRENT")
    if not os.path.exists(pointer):
        return None
    with open(pointer) as f:
        return json.load(f)["version"]
