"""Multimodal column operators: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns with a typed metadata
struct. The Spark-side plumbing — schema, partition-preserving
``mapInPandas`` batch shape, Arrow transfer — is real and tested; the
codec step itself is stubbed (image/audio libraries are not in this
container): ``decode_stub`` computes deterministic fake features from the
bytes, and ``decode_real`` raises ``NotImplementedError`` at the exact
point a PIL/libav call would slot in.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType()),
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("duration_ms", IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes long, checksum string, feat0 double, feat1 double"


def decode_real(payload: bytes, kind: str):
    """The real codec hook. PIL / soundfile / pyav land here on a cluster
    image that ships them."""
    raise NotImplementedError("media codecs are not available in this container")


def _fake_features(payload: bytes) -> tuple[float, float]:
    """Deterministic stand-in features derived from the raw bytes."""
    if not payload:
        return 0.0, 0.0
    s = sum(payload)
    return (s % 997) / 997.0, (len(payload) % 31) / 31.0


def extract_features(df: DataFrame, use_stub: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` keeps partitioning; each batch is a pandas DataFrame so
    a real decoder would vectorize over the batch, not per row.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib  # noqa: PLC0415

        for pdf in batches:
            payloads = pdf["payload"]
            if not use_stub:
                decode_real(b"", "image")  # pragma: no cover
            feats = [(_fake_features(p if p is not None else b"")) for p in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in payloads],
                    "checksum": [hashlib.md5(p or b"").hexdigest() for p in payloads],
                    "feat0": [f[0] for f in feats],
                    "feat1": [f[1] for f in feats],
                }
            )

    return df.mapInPandas(op, schema=FEATURE_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: passes target dims through the same batch shape;
    the pixel work is the stubbed codec step."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            # real impl: decode -> resize(width, height) -> re-encode
            out["payload"] = out["payload"]  # stub: payload unchanged
            yield out

    return df.mapInPandas(op, schema=df.schema).withColumn(
        "meta", F.struct(F.col("meta.mime"), F.lit(width).alias("width"), F.lit(height).alias("height"), F.col("meta.duration_ms"))
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per planned frame timestamp
    (pure column algebra; the decode of each frame is the stub)."""
    n_frames = F.greatest(F.floor(F.col("meta.duration_ms") / every_ms), F.lit(1)).cast("int")
    return df.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(F.transform(F.sequence(F.lit(0), n_frames - 1), lambda i: i * every_ms)).alias("frame_ts_ms"),
    )
