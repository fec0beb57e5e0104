"""Embedding-column utilities for training-data pipelines: int8
quantization planning and domain-centroid geometry.

Both operators are deliberately integer-exact so their results are
partition-order independent (the repo-wide oracle contract): per-element
float work happens INSIDE one row's array (deterministic element order),
and anything summed ACROSS rows is floored to integer micro first.

Reference capability precedent: the reference stores embeddings for its
hnsw search (`memberSchema (2).gql:86`); quantization/centroid analytics
are the extension tier a 100 TB curation pipeline needs on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def int8_quantize_stats(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-vector symmetric int8 quantization plan + reconstruction error.

    For each vector: ``scale = max(|x_i|) / 127``, ``q_i =
    floor(x_i / max_abs * 127)``, reconstruction ``q_i * max_abs / 127``.
    Emits the quantized L1 mass and the total absolute reconstruction
    error (micro-floored per element BEFORE the in-row sum, so the
    result is bit-identical across engines).

    Scale: pure map — no shuffle, no state. At 100 TB this is the
    planning pass for a 4x storage cut (float32 -> int8): each output
    row tells the writer the per-vector scale and certifies the error
    budget. All-zero vectors quantize to all zeros (guarded division).
    """
    xd = _as_double(F.col(vec_col))
    max_abs = F.array_max(F.transform(xd, F.abs))
    # q_i depends only on x_i and max_abs -> elementwise, in-row
    q = F.transform(
        xd,
        lambda x: F.when(max_abs > 0.0, F.floor(x / max_abs * F.lit(127.0)))
        .otherwise(F.lit(0))
        .cast("long"),
    )
    err_micro_terms = F.zip_with(
        xd,
        q,
        lambda x, qi: F.when(
            max_abs > 0.0,
            F.floor(F.abs(x - qi.cast("double") * max_abs / F.lit(127.0)) * MICRO),
        )
        .otherwise(F.lit(0))
        .cast("long"),
    )
    zero = F.lit(0).cast("long")
    return (
        df.filter(F.col(vec_col).isNotNull() & (F.size(F.col(vec_col)) > 0))
        .select(
            F.col(id_col),
            F.size(F.col(vec_col)).cast("long").alias("dim"),
            F.floor(max_abs * MICRO).cast("long").alias("max_abs_micro"),
            F.aggregate(q, zero, lambda a, x: a + F.abs(x)).alias("q_l1"),
            F.aggregate(err_micro_terms, zero, lambda a, x: a + x).alias("recon_err_micro"),
        )
    )


def label_centroid_cosine(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Pairwise cosine similarity between per-label centroid vectors.

    The mixture-design primitive: how geometrically close are two
    domains' embedding clouds? Cosine is scale-invariant, so the
    centroid's ``1/n`` factor cancels — we work directly on integer
    element SUMS (each element micro-floored per row before the
    cross-row sum, making the reduction order-independent and exact).

    Plan shape: posexplode to (label, idx, micro) -> groupBy(label, idx)
    integer sum (ONE shuffle of n_rows x dim skinny rows) -> the
    centroid relation is tiny (n_labels x dim), so the pairwise epilogue
    is a broadcast self-join. Element sums are divided by the per-label
    row count (integer DIV — cosine is invariant to the 1/n factor, and
    DuckDB // matches Spark DIV) BEFORE the dot product, so the
    accumulator bound is dim * (1e6 * max|x|)^2 — independent of corpus
    size (safe for any n while max|x| < ~379/sqrt(dim); unit-scale
    embeddings are far inside it). The raw per-(label, idx) sum(mi)
    itself only overflows past ~9e12 rows per label (mi ~ 1e6), beyond
    a 100 TB embedding table. (ADVICE r8: the old DIV-1000 downshift
    overflowed at ~1e5-1e7 rows per label.)
    """
    e = df.filter(
        F.col(vec_col).isNotNull()
        & F.col(label_col).isNotNull()
        & (F.size(F.col(vec_col)) > 0)
    )
    terms = e.select(
        F.col(label_col).cast("long").alias("label"),
        F.posexplode(_as_double(F.col(vec_col))).alias("idx", "x"),
    ).select("label", "idx", F.floor(F.col("x") * MICRO).cast("long").alias("mi"))
    cent = terms.groupBy("label", "idx").agg(
        F.expr("CAST(sum(mi) AS BIGINT) DIV count(1)").alias("s"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    a = cent.select(
        F.col("label").alias("label_a"),
        "idx",
        F.col("s").alias("sa"),
        F.col("n").alias("n_a"),
    )
    b = cent.select(
        F.col("label").alias("label_b"),
        F.col("idx").alias("idx_b"),
        F.col("s").alias("sb"),
        F.col("n").alias("n_b"),
    )
    pairs = a.join(
        F.broadcast(b),
        (F.col("idx") == F.col("idx_b")) & (F.col("label_a") < F.col("label_b")),
    )
    agg = pairs.groupBy("label_a", "label_b").agg(
        F.max("n_a").cast("long").alias("n_a"),
        F.max("n_b").cast("long").alias("n_b"),
        F.sum(F.col("sa") * F.col("sb")).cast("long").alias("dot"),
        F.sum(F.col("sa") * F.col("sa")).cast("long").alias("na2"),
        F.sum(F.col("sb") * F.col("sb")).cast("long").alias("nb2"),
    )
    cos = F.col("dot") / (F.sqrt(F.col("na2").cast("double")) * F.sqrt(F.col("nb2").cast("double")))
    return agg.select(
        "label_a",
        "label_b",
        "n_a",
        "n_b",
        F.when(
            (F.col("na2") > 0) & (F.col("nb2") > 0), F.floor(cos * MICRO)
        ).cast("long").alias("cos_micro"),
    )
