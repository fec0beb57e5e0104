"""Sequence packing for pretraining: concatenate documents into one
token stream and split it into fixed-length context windows.

The standard GPT-style packing move — documents are laid end to end in a
deterministic order (doc id) and the stream is chunked every ``max_len``
tokens; a document that straddles a chunk boundary is split across the
two bins. This module plans that layout: one output row per (bin,
document segment), with the in-document and in-bin offsets a downstream
tokenizer/writer needs to materialize the packed sequences.

The scale-relevant part is the GLOBAL PREFIX SUM over token counts. A
naive ``sum() over (order by id)`` window has no partition key, so Spark
executes it on a single partition — a non-starter on a corpus. Instead
the classic two-pass distributed scan:

1. assign each row a DETERMINISTIC contiguous bucket: bucket =
   floor((id - min_id) / span * n_buckets), with the (min, max) bounds
   computed once and broadcast (1-row cross join, stays lazy). Buckets
   are monotone in id, so bucket boundaries respect the global order;
2. per-bucket cumulative sum (window partitioned by bucket — fully
   parallel after a hash repartition on the bucket key);
3. a per-bucket total relation (one row per bucket) gets its own tiny
   exclusive-prefix window and is broadcast back;
4. global offset = bucket offset + local cumulative sum.

The bucket key is a pure function of the DATA, never of physical
placement: an earlier revision keyed on ``spark_partition_id()`` after
a ``repartitionByRange``, and because both are nondeterministic under
recompute (task retry, AQE re-plan) the two consumer branches of the
ranged relation could observe different pids and corrupt every global
offset downstream — exactly the kind of bug that is rare on local[32]
and routine on a 1000-executor cluster. (Root-caused in round 6:
pk01 driver hash mismatch.)

Three cheap exchanges total (1-row bounds aggregate + the bucket hash
repartition + the #buckets-row aggregate), everything else map-side;
the bin explosion is pure column algebra. The DuckDB oracle runs the
single-node window equivalent, so the distributed scan is verified
bit-for-bit against the sequential semantics (pk01).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyp_etl_pipeline_spark.operators.textan import token_count


def pack_sequences(
    df: DataFrame,
    max_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Plan the packed layout of ``df``'s documents into ``max_len``-token
    bins (whitespace tokens, ``textan.token_count`` semantics; empty
    docs contribute nothing).

    Output: one row per (bin, doc segment) —
    ``bin_id``, ``doc_id``, ``doc_offset`` (first packed token's index
    within the doc), ``seg_len``, ``bin_offset`` (segment start within
    the bin). Every bin except the last is exactly full:
    sum(seg_len) over a bin = max_len.
    """
    if max_len <= 0:
        raise ValueError(f"max_len must be positive, got {max_len}")
    toks = (
        df.filter(F.col(id_col).isNotNull())
        .select(F.col(id_col).alias("id"), token_count(text_col).cast("long").alias("n"))
        .filter(F.col("n") > 0)
    )
    # deterministic two-pass distributed prefix sum (see module
    # docstring; shared implementation in operators/prefix.py)
    from pyp_etl_pipeline_spark.operators.prefix import grouped_prefix_sum  # noqa: PLC0415

    spanned = grouped_prefix_sum(toks, value_col="n", order_col="id", cum_col="gend").withColumn(
        "gstart", F.col("gend") - F.col("n")
    )
    L = F.lit(max_len).cast("long")
    first_bin = F.floor(F.col("gstart") / L)
    last_bin = F.floor((F.col("gend") - 1) / L)
    seg = spanned.select(
        "id",
        "gstart",
        "gend",
        F.explode(F.sequence(first_bin, last_bin)).alias("bin_id"),
    )
    seg_start = F.greatest(F.col("bin_id") * L, F.col("gstart"))
    seg_end = F.least((F.col("bin_id") + 1) * L, F.col("gend"))
    return seg.select(
        F.col("bin_id"),
        F.col("id").alias("doc_id"),
        (seg_start - F.col("gstart")).alias("doc_offset"),
        (seg_end - seg_start).alias("seg_len"),
        (seg_start - F.col("bin_id") * L).alias("bin_offset"),
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """RAG-style sliding-window chunking: split each document into
    ``chunk_tokens``-token windows advancing by ``chunk_tokens -
    overlap`` (whitespace tokens, ``textan.whitespace_tokens``
    semantics). The dual of ``pack_sequences`` — packing concatenates
    documents into fixed bins, chunking splits documents into
    overlapping retrieval units.

    chunk count = max(1, ceil((n - overlap) / stride)): every token is
    covered, consecutive chunks share ``overlap`` tokens, a doc shorter
    than one chunk yields exactly one chunk, empty docs yield nothing.

    Entirely map-only (sequence + slice + posexplode per row — no
    shuffle, no data movement beyond the scan), so it pipelines into
    the read at any corpus size.

    Output: (id, chunk_idx, n_tokens, chunk_text).
    """
    if chunk_tokens <= 0 or not 0 <= overlap < chunk_tokens:
        raise ValueError(f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}")
    from pyp_etl_pipeline_spark.operators.textan import whitespace_tokens  # noqa: PLC0415

    stride = chunk_tokens - overlap
    base = df.filter(F.col(id_col).isNotNull()).select(
        F.col(id_col).alias("id"), whitespace_tokens(text_col).alias("__toks")
    )
    n = F.size("__toks")
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)) / F.lit(stride)).cast("int"), F.lit(1)
    )
    withn = base.filter(n > 0).select("id", "__toks", n_chunks.alias("__nc"))
    return withn.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.col("__nc") - 1),
                lambda i: F.array_join(
                    F.slice("__toks", i * stride + 1, chunk_tokens), " "
                ),
            )
        ).alias("chunk_idx", "chunk_text"),
        F.size("__toks").alias("__n"),
    ).select(
        "id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.least(
            F.lit(chunk_tokens), F.col("__n") - F.col("chunk_idx") * stride
        ).cast("long").alias("n_tokens"),
        "chunk_text",
    )


def padding_efficiency(
    df: DataFrame,
    text_col: str = "text",
    bucket_multiple: int = 32,
) -> DataFrame:
    """Padding waste of length-bucketed batching vs pad-to-global-max.

    Training dataloaders pad every sequence in a batch to the batch max;
    grouping sequences into length buckets (here: token count rounded UP
    to a multiple of ``bucket_multiple``) is the classic fix. This
    operator certifies the economics: per bucket, the tokens wasted on
    padding under bucketing vs what the same rows would waste padded to
    the global max. Pure integer arithmetic end to end.

    Scale: one map-only projection + one hash aggregation; the global
    max arrives by broadcast (1-row cross join, stays lazy). No windows,
    no sort — the shape survives any corpus size.
    """
    from pyp_etl_pipeline_spark.operators.textan import token_count  # noqa: PLC0415

    lens = df.filter(F.col(text_col).isNotNull()).select(
        token_count(text_col).cast("long").alias("n_tok")
    ).filter(F.col("n_tok") > 0)
    m = bucket_multiple
    staged = lens.select(
        "n_tok",
        F.expr(f"(n_tok + {m - 1}) DIV {m} * {m}").alias("bucket_len"),
    )
    gmax = staged.agg(F.max("n_tok").cast("long").alias("g_max"))
    per_bucket = staged.groupBy("bucket_len").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("sum_tokens"),
    )
    return (
        per_bucket.join(F.broadcast(gmax))
        .select(
            "bucket_len",
            "n_docs",
            "sum_tokens",
            (F.col("bucket_len") * F.col("n_docs") - F.col("sum_tokens")).alias("waste_bucketed"),
            (F.col("g_max") * F.col("n_docs") - F.col("sum_tokens")).alias("waste_global"),
            F.expr(
                "CASE WHEN g_max * n_docs - sum_tokens > 0"
                " THEN ((g_max * n_docs - sum_tokens) - (bucket_len * n_docs - sum_tokens))"
                "      * CAST(1000000 AS BIGINT) DIV (g_max * n_docs - sum_tokens)"
                " ELSE CAST(1000000 AS BIGINT) END"
            ).alias("savings_micro"),
        )
    )
