"""Multimodal column operators: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns with a typed metadata
struct, processed in Arrow-batched ``mapInPandas`` (partition-preserving,
batch-vectorized — the shape a PIL/libav decoder would use).

Two decode paths:
- REAL: PNG (gray8/rgb8), WAV (PCM16) and JPEG decode in pure python +
  numpy (``multimodal/codecs.py`` — zlib inflate + scanline unfilter,
  RIFF walk + PCM RMS, JPEG marker walk + baseline DC entropy decode).
  ``decode_real`` dispatches on magic bytes and ``decode_features``
  exposes width/height/duration/signal stats as a DataFrame operator
  (oracle-checked by mm02/mm03). JPEG dims/components parse for ANY
  jpeg; pixel stats (mean) for single-component baseline scans.
- MP4/ISO-BMFF containers decode natively too (box walk: ftyp brand,
  mvhd duration, tkhd dims — ``codecs.mp4_decode``, oracle-checked by
  mm04/mm05); ``frame_sample_decoded`` plans frame grids from those
  real container bytes.
- PLUMBING: ``extract_features`` computes transport/integrity stats of
  the raw bytes (length, md5, byte-sum mod — NOT media features; see
  its docstring). Only pixel/audio decode of COMPRESSED inter-frame
  video (the codec payloads inside the container) needs external
  codecs that are not in this container; ``decode_real`` raises
  ``NotImplementedError`` naming the format.
"""

from __future__ import annotations

import os
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

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, checksum string, "
    "byte_stat0 double, byte_stat1 double"
)

# Repo root as a PLAIN STRING: worker-side closures capture it (strings
# pickle by value) and bootstrap sys.path before importing this package —
# the harness may launch executors from a cwd where the repo isn't
# importable, and a bare in-closure import would ModuleNotFoundError.
REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))


def decode_real(payload: bytes, kind: str) -> dict:
    """Real decode for the formats the pure-python codecs cover (PNG,
    WAV), dispatched on magic bytes; other formats still need external
    codecs that are not in this container."""
    from pyp_etl_pipeline_spark.multimodal import codecs  # noqa: PLC0415

    fmt = codecs.sniff_kind(payload or b"")
    if fmt == "png":
        return {"format": "png", **codecs.png_decode(payload)}
    if fmt == "wav":
        return {"format": "wav", **codecs.wav_decode(payload)}
    if fmt == "jpeg":
        # marker walk gives dims/components/progressive for ANY jpeg;
        # mean_val additionally for single-component baseline scans
        return {"format": "jpeg", **codecs.jpeg_decode(payload)}
    if fmt == "mp4":
        # ISO-BMFF box walk: brand, mvhd duration, tkhd dims from real
        # container bytes; the compressed codec payloads inside still
        # need libav for pixel/audio decode
        return {"format": "mp4", **codecs.mp4_decode(payload)}
    if fmt == "avi":
        # RIFF walk: vids stream header (fps), strf dims, movi frame
        # chunks. MJPEG frames are independent JPEGs, so this is a FULL
        # video decode path (see sample_frames_decoded) — no libav.
        meta = codecs.avi_mjpeg_decode(payload)
        return {"format": "avi", **{k: v for k, v in meta.items() if k != "frames"}}
    from pyp_etl_pipeline_spark.multimodal import plugins  # noqa: PLC0415

    decoder = plugins.get_video_decoder(fmt) if fmt else None
    if decoder is not None:
        # a registered backend (see multimodal/plugins.py — e.g. PyAV on
        # a libav-equipped cluster image) claims this container format:
        # real frame decode, real stats, still no fake path
        n = 0
        w = h = None
        last_pts = 0.0
        for _idx, pts_ms, frame in decoder.decode_frames(payload):
            if w is None:
                h, w = int(frame.shape[0]), int(frame.shape[1])
            last_pts = pts_ms
            n += 1
        return {"format": fmt, "width": w, "height": h, "n_frames": n, "duration_ms": last_pts}
    raise NotImplementedError(
        f"no pure-python codec for this {kind} payload (PNG, WAV, JPEG, "
        "MJPEG-AVI and MP4-container metadata decode natively; only "
        "INTER-FRAME video codecs — H.264/VP9/AV1 payloads — still need "
        "libav on the cluster image: see multimodal/plugins.py for the "
        "decoder registration seam)"
    )


DECODE_SCHEMA = (
    "media_id long, format string, width int, height int, "
    "duration_ms double, mean_val double, rms double, zcr double, peak int"
)


def decode_features(df: DataFrame) -> DataFrame:
    """Real media decode as a DataFrame operator: PNG/JPEG dimensions +
    mean pixel, WAV duration + RMS, MP4-container dims + duration, from
    actual payload bytes (no metadata trust). Rows whose payload matches
    no codec — or matches a magic but has a malformed body — yield nulls
    rather than failing the batch (a 100 TB corpus always contains
    strays)."""

    repo_root = REPO_ROOT

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct  # noqa: PLC0415
        import sys  # noqa: PLC0415
        import zlib  # noqa: PLC0415

        if repo_root not in sys.path:
            sys.path.insert(0, repo_root)
        from pyp_etl_pipeline_spark.multimodal import codecs  # noqa: PLC0415

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                p = bytes(payload) if payload is not None else b""
                fmt = codecs.sniff_kind(p)
                row = {
                    "media_id": mid,
                    "format": fmt,
                    "width": None,
                    "height": None,
                    "duration_ms": None,
                    "mean_val": None,
                    "rms": None,
                    "zcr": None,
                    "peak": None,
                }
                # magic bytes don't guarantee a well-formed body: a
                # truncated/desynced payload raises from the codec, and
                # the contract is null features per stray row, never a
                # failed Arrow batch
                try:
                    if fmt == "png":
                        d = codecs.png_decode(p)
                        row.update(width=d["width"], height=d["height"], mean_val=d["mean_val"])
                    elif fmt == "wav":
                        d = codecs.wav_decode(p)
                        row.update(
                            duration_ms=d["duration_ms"], rms=d["rms"],
                            zcr=d["zcr"], peak=d["peak"],
                        )
                    elif fmt == "jpeg":
                        d = codecs.jpeg_decode(p)
                        row.update(width=d["width"], height=d["height"], mean_val=d["mean_val"])
                    elif fmt == "mp4":
                        d = codecs.mp4_decode(p)
                        row.update(width=d["width"], height=d["height"], duration_ms=d["duration_ms"])
                    elif fmt == "avi":
                        d = codecs.avi_mjpeg_decode(p)
                        row.update(width=d["width"], height=d["height"], duration_ms=d["duration_ms"])
                    elif fmt == "gif":
                        d = codecs.gif_decode(p)
                        row.update(width=d["width"], height=d["height"], mean_val=d["mean_val"])
                except (ValueError, IndexError, KeyError, EOFError, struct.error, zlib.error):
                    pass
                rows.append(row)
            yield pd.DataFrame(rows)

    return df.mapInPandas(op, schema=DECODE_SCHEMA)


def gif_pixel_stats(df: DataFrame) -> DataFrame:
    """Exact integer pixel statistics from REAL GIF bytes — container
    walk + full LZW decompression per payload (``codecs.gif_decode_pixels``),
    Arrow-batched ``mapInPandas``. Output per row: width/height from the
    image descriptor, ``sum_pixels`` (exact int64 over decoded gray
    values), and a position-weighted ``checksum`` =
    sum((y*w + x + 1) * p(x, y)) mod 1e9+7 — the weighting catches a
    decoder that produces the right multiset of pixels in the wrong
    places (transposed rows, shifted scanlines). NULL payloads and
    malformed bodies yield NULL stats (tolerant reader)."""
    repo_root = REPO_ROOT

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct  # noqa: PLC0415
        import sys  # noqa: PLC0415

        if repo_root not in sys.path:
            sys.path.insert(0, repo_root)
        import numpy as np  # noqa: PLC0415

        from pyp_etl_pipeline_spark.multimodal import codecs  # noqa: PLC0415

        mod = 1_000_000_007
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                row = {
                    "media_id": mid,
                    "width": None,
                    "height": None,
                    "sum_pixels": None,
                    "checksum": None,
                }
                try:
                    px, w, h = codecs.gif_decode_pixels(bytes(payload))
                    flat = px.astype(np.int64).reshape(-1)
                    weights = np.arange(1, flat.size + 1, dtype=np.int64)
                    row.update(
                        width=w,
                        height=h,
                        sum_pixels=int(flat.sum()),
                        checksum=int((weights * flat).sum() % mod),
                    )
                except (TypeError, ValueError, IndexError, struct.error):
                    pass
                rows.append(row)
            yield pd.DataFrame(rows).astype(
                {
                    "width": "Int32",
                    "height": "Int32",
                    "sum_pixels": "Int64",
                    "checksum": "Int64",
                }
            )

    return df.mapInPandas(
        op,
        schema="media_id long, width int, height int, sum_pixels long, checksum long",
    )


def gif_frame_stats(df: DataFrame) -> DataFrame:
    """Animated-GIF frame extraction from REAL bytes: the container walk
    reads every graphics-control extension + image descriptor and
    LZW-decompresses each frame (``codecs.gif_decode_frames``). One
    output row per frame: (media_id, frame_idx, delay_cs, sum_pixels,
    checksum) with the same position-weighted checksum contract as
    ``gif_pixel_stats`` — the GIF sibling of mm07's MJPEG-AVI frame
    sampling. Malformed payloads contribute zero rows (tolerant
    reader); partition-preserving Arrow batches."""
    repo_root = REPO_ROOT

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct  # noqa: PLC0415
        import sys  # noqa: PLC0415

        if repo_root not in sys.path:
            sys.path.insert(0, repo_root)
        import numpy as np  # noqa: PLC0415

        from pyp_etl_pipeline_spark.multimodal import codecs  # noqa: PLC0415

        mod = 1_000_000_007
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    frames = codecs.gif_decode_frames(bytes(payload))
                except (TypeError, ValueError, IndexError, struct.error):
                    continue
                for fi, f in enumerate(frames):
                    flat = f["pixels"].astype(np.int64).reshape(-1)
                    weights = np.arange(1, flat.size + 1, dtype=np.int64)
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_idx": fi,
                            "delay_cs": f["delay_cs"],
                            "sum_pixels": int(flat.sum()),
                            "checksum": int((weights * flat).sum() % mod),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "delay_cs", "sum_pixels", "checksum"],
            )

    return df.mapInPandas(
        op,
        schema="media_id long, frame_idx int, delay_cs int, sum_pixels long, checksum long",
    )


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched PAYLOAD-PLUMBING stats over binary columns: byte
    length, md5 checksum, and two deterministic byte-level statistics
    (``byte_stat0`` = byte-sum mod 997, ``byte_stat1`` = length mod 31).
    These are transport/integrity features of the raw bytes — NOT image
    or audio features; real decodes live in ``decode_features`` /
    ``gif_pixel_stats`` / ``sample_frames_decoded`` (mm02–mm14).

    ``mapInPandas`` keeps partitioning; each batch is a pandas DataFrame so
    the stats vectorize over the batch, not per row.
    """
    # nested helper: a closure reference to a module-level function
    # pickles as an import the executor worker may not be able to
    # resolve (see REPO_ROOT note); nested functions pickle by value
    def byte_stats(payload: bytes) -> tuple[float, float]:
        if not payload:
            return 0.0, 0.0
        s = sum(payload)
        return (s % 997) / 997.0, (len(payload) % 31) / 31.0

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib  # noqa: PLC0415

        for pdf in batches:
            payloads = pdf["payload"]
            # a MISSING payload is not an EMPTY payload: NULL in -> NULL
            # features out (md5('') for a null blob was a lie the null-
            # injection sweep caught, r8)
            feats = [byte_stats(p) if p is not None else (None, None) for p in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pd.array(
                        [len(p) if p is not None else None for p in payloads], dtype="Int64"
                    ),
                    "checksum": [
                        hashlib.md5(p).hexdigest() if p is not None else None for p in payloads
                    ],
                    "byte_stat0": [f[0] for f in feats],
                    "byte_stat1": [f[1] for f in feats],
                }
            )

    return df.mapInPandas(op, schema=FEATURE_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """REAL thumbnail resize for PNG payloads (stub upgraded in round 8):
    decode pixels (the repo's own inflate+unfilter codec), collapse to
    integer luminance ((r + 2g + b) DIV 4 — the dhash_features
    convention), NEAREST-NEIGHBOR resample on the all-integer lattice
    ``src = out * src_dim DIV out_dim``, and re-encode as a grayscale
    PNG. Everything integer, so the resized pixels are exactly
    reproducible on any engine — mm14's oracle twin recomputes the
    output pixels in closed form. Non-PNG / corrupt payloads drop out
    (the stray-tolerant contract of the whole decode path). Map-only
    Arrow batches, partition-preserving; per-frame resize of compressed
    video would compose this after ``sample_frames_decoded``.

    Output: (media_id, payload = resized grayscale PNG, width, height).
    """
    repo_root = REPO_ROOT

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct  # noqa: PLC0415
        import sys  # noqa: PLC0415
        import zlib  # noqa: PLC0415

        if repo_root not in sys.path:
            sys.path.insert(0, repo_root)
        from pyp_etl_pipeline_spark.multimodal import codecs  # noqa: PLC0415

        for pdf in batches:
            out_rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                p = bytes(payload) if payload is not None else b""
                try:
                    px, w, h, bpp = codecs.png_decode_pixels(p)
                except (ValueError, IndexError, struct.error, zlib.error):
                    continue

                def lum(x: int, y: int) -> int:
                    if bpp == 1:
                        return int(px[y, x])
                    r, g, b = (int(px[y, x * 3 + c]) for c in range(3))
                    return (r + 2 * g + b) // 4

                rows = [
                    [lum(x * w // width, y * h // height) for x in range(width)]
                    for y in range(height)
                ]
                out_rows.append(
                    {
                        "media_id": mid,
                        "payload": codecs.png_encode_gray_pixels(rows),
                        "width": width,
                        "height": height,
                    }
                )
            yield pd.DataFrame(
                out_rows, columns=["media_id", "payload", "width", "height"]
            )

    return df.select("media_id", "payload").mapInPandas(
        op, schema="media_id long, payload binary, width int, height int"
    )


def png_pixel_stats(df: DataFrame) -> DataFrame:
    """Decode PNG payloads and emit exact integer pixel statistics —
    the certification tail of a decode/resize pipeline: dimensions,
    pixel count, plain sum and the position-weighted checksum
    ``sum(v * (y*width + x + 1))`` (the mm12 GIF convention), which
    pins every pixel VALUE at every POSITION. Luminance for multi-
    channel images follows the dhash convention. Map-only; corrupt
    payloads drop."""
    repo_root = REPO_ROOT

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct  # noqa: PLC0415
        import sys  # noqa: PLC0415
        import zlib  # noqa: PLC0415

        if repo_root not in sys.path:
            sys.path.insert(0, repo_root)
        from pyp_etl_pipeline_spark.multimodal import codecs  # noqa: PLC0415

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                p = bytes(payload) if payload is not None else b""
                try:
                    px, w, h, bpp = codecs.png_decode_pixels(p)
                except (ValueError, IndexError, struct.error, zlib.error):
                    continue

                def lum(x: int, y: int) -> int:
                    if bpp == 1:
                        return int(px[y, x])
                    r, g, b = (int(px[y, x * 3 + c]) for c in range(3))
                    return (r + 2 * g + b) // 4

                total = checksum = 0
                for y in range(h):
                    for x in range(w):
                        v = lum(x, y)
                        total += v
                        checksum += v * (y * w + x + 1)
                rows.append(
                    {
                        "media_id": mid,
                        "width": w,
                        "height": h,
                        "n_px": w * h,
                        "pix_sum": total,
                        "pix_checksum": checksum,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "n_px", "pix_sum", "pix_checksum"],
            )

    return df.select("media_id", "payload").mapInPandas(
        op,
        schema="media_id long, width int, height int, n_px long, pix_sum long, pix_checksum long",
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per planned frame timestamp
    (pure column algebra over the metadata struct; see
    ``frame_sample_decoded`` for the payload-driven variant)."""
    n_frames = F.greatest(F.floor(F.col("meta.duration_ms") / every_ms), F.lit(1)).cast("int")
    return df.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(F.transform(F.sequence(F.lit(0), n_frames - 1), lambda i: i * every_ms)).alias("frame_ts_ms"),
    )


def frame_sample_decoded(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan whose duration comes from the PAYLOAD
    BYTES, not a metadata struct: ``decode_features`` walks each MP4
    container (mvhd timescale/duration) and the frame grid explodes from
    the decoded duration. Rows that fail the container parse (or aren't
    MP4 at all) decode to null duration and are skipped — same stray-
    tolerant contract as the rest of the decode path. The per-frame
    pixel decode of compressed video remains the one genuinely external
    dependency (libav)."""
    decoded = decode_features(df.filter(F.col("kind") == "video"))
    n_frames = F.greatest(F.floor(F.col("duration_ms") / every_ms), F.lit(1)).cast("int")
    return decoded.filter(F.col("format").isin("mp4", "avi")).filter(
        F.col("duration_ms").isNotNull()
    ).select(
        "media_id",
        F.explode(
            F.transform(F.sequence(F.lit(0), n_frames - 1), lambda i: (i * every_ms).cast("long"))
        ).alias("frame_ts_ms"),
    )


SAMPLED_FRAME_SCHEMA = (
    "media_id long, frame_idx int, frame_ts_ms long, width int, height int, mean_val double"
)


def sample_frames_decoded(df: DataFrame, every_ms: int = 1000, decoder=None) -> DataFrame:
    """Sampled-frame PIXEL decode for MJPEG-AVI video: the container's
    frame chunks are independent baseline JPEGs, so the frame at each
    grid timestamp really decodes (marker walk + DC entropy decode) —
    no libav, no stub. One output row per sampled frame with the frame's
    true dimensions and mean pixel value.

    Grid semantics match ``frame_sample_plan``: timestamps 0, every_ms,
    ... with max(1, floor(duration/every_ms)) samples; the frame index
    at ts is floor(ts * fps) clamped to the last frame. Non-AVI video
    payloads (inter-frame codecs: the one genuinely external decode)
    and malformed payloads are SKIPPED, stray-tolerant like the rest of
    the decode path.

    Shape: Arrow-batched mapInPandas, partition-preserving map-only —
    each task decodes only its partition's payloads and only the
    SAMPLED frames, which is the property that matters when a 100 TB
    corpus carries hour-long clips sampled at 1 fps.

    ``decoder``: an explicit :class:`multimodal.plugins.VideoFrameDecoder`
    for inter-frame containers, pickled by value into the worker closure
    (dependency injection — registry state does not travel driver ->
    worker). When None, workers consult their own plugin registry, which
    a cluster image arms via ``PYP_VIDEO_PLUGIN`` (see plugins.py)."""
    repo_root = REPO_ROOT
    injected = decoder

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct  # noqa: PLC0415
        import sys  # noqa: PLC0415
        import zlib  # noqa: PLC0415

        if repo_root not in sys.path:
            sys.path.insert(0, repo_root)
        from pyp_etl_pipeline_spark.multimodal import codecs  # noqa: PLC0415

        from pyp_etl_pipeline_spark.multimodal import plugins  # noqa: PLC0415

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                p = bytes(payload) if payload is not None else b""
                fmt = codecs.sniff_kind(p)
                if fmt != "avi":
                    # inter-frame containers (mp4/mkv/webm) decode only
                    # through a registered or injected backend
                    # (plugins.py seam) — without one they are skipped,
                    # stray-tolerant
                    if injected is not None and fmt in getattr(
                        injected, "container_formats", ()
                    ):
                        dec = injected
                    else:
                        dec = plugins.get_video_decoder(fmt) if fmt else None
                    if dec is not None:
                        try:
                            frames = list(dec.decode_frames(p))
                        except Exception:  # noqa: BLE001 — stray payload
                            continue
                        if not frames:
                            continue
                        duration_ms = frames[-1][1]
                        n_samples = max(1, int(duration_ms // every_ms))
                        for k in range(n_samples):
                            ts = k * every_ms
                            idx = max(
                                (i for i, (_, pts, _f) in enumerate(frames) if pts <= ts),
                                default=0,
                            )
                            _, _, fr = frames[idx]
                            rows.append(
                                {
                                    "media_id": mid,
                                    "frame_idx": int(frames[idx][0]),
                                    "frame_ts_ms": int(ts),
                                    "width": int(fr.shape[1]),
                                    "height": int(fr.shape[0]),
                                    "mean_val": float(fr.mean()),
                                }
                            )
                    continue
                try:
                    meta = codecs.avi_mjpeg_decode(p)
                    frames = meta["frames"]
                    if not frames:
                        continue
                    n_samples = max(1, int(meta["duration_ms"] // every_ms))
                    for k in range(n_samples):
                        ts = k * every_ms
                        idx = min(
                            len(frames) - 1,
                            ts * meta["fps_num"] // (1000 * meta["fps_den"]),
                        )
                        d = codecs.jpeg_decode(frames[idx])
                        rows.append(
                            {
                                "media_id": mid,
                                "frame_idx": int(idx),
                                "frame_ts_ms": int(ts),
                                "width": d["width"],
                                "height": d["height"],
                                "mean_val": d["mean_val"],
                            }
                        )
                except (ValueError, IndexError, KeyError, EOFError, struct.error, zlib.error):
                    continue
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "frame_ts_ms", "width", "height", "mean_val"],
            )

    return df.filter(F.col("kind") == "video").mapInPandas(op, SAMPLED_FRAME_SCHEMA)


def hadamard_spectrum(
    df: DataFrame, n_fft: int = 64, n_bands: int = 8
) -> DataFrame:
    """Sequency-band energies of each audio clip: a Walsh-Hadamard
    transform over the first ``n_fft`` decoded PCM samples, coefficient
    energies summed into ``n_bands`` equal sequency bands. Real spectral
    analysis (the WHT is the ±1-basis Fourier cousin; band 0 = DC /
    low-sequency energy, top band = fastest alternation) that stays in
    EXACT int64 — no trig, no floats — so energies are bit-identical on
    any engine/partitioning and the DuckDB twin can recompute them from
    the closed-form synth signal (mm08 certifies the whole
    bytes -> RIFF walk -> samples -> transform path by hash).

    Shape: Arrow-batched mapInPandas, map-only; per clip cost is
    n_fft^2 integer ops (n_fft is a constant) — embarrassingly parallel
    over a 100 TB media corpus. Clips shorter than ``n_fft`` zero-pad
    (energy then concentrates in low bands, as expected)."""
    repo_root = REPO_ROOT
    band_w = n_fft // n_bands

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct  # noqa: PLC0415
        import sys  # noqa: PLC0415

        if repo_root not in sys.path:
            sys.path.insert(0, repo_root)
        import numpy as np  # noqa: PLC0415

        from pyp_etl_pipeline_spark.multimodal import codecs  # noqa: PLC0415

        # rows of the order-n_fft Hadamard matrix: H[f, j] = (-1)^popcount(f & j)
        f_idx = np.arange(n_fft, dtype=np.int64)
        popc = np.array(
            [[bin(f & j).count("1") & 1 for j in range(n_fft)] for f in f_idx],
            dtype=np.int64,
        )
        hmat = 1 - 2 * popc  # +1 / -1

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                p = bytes(payload) if payload is not None else b""
                try:
                    samples, _, _ = codecs.wav_pcm_samples(p)
                except (ValueError, IndexError, struct.error):
                    continue  # non-WAV strays drop out (null-free long format)
                x = np.zeros(n_fft, dtype=np.int64)
                take = min(n_fft, samples.size)
                x[:take] = samples[:take].astype(np.int64)
                coeff = hmat @ x  # exact int64 WHT
                energy = coeff * coeff
                for b in range(n_bands):
                    rows.append(
                        {
                            "media_id": mid,
                            "band": b,
                            "energy": int(energy[b * band_w : (b + 1) * band_w].sum()),
                        }
                    )
            yield pd.DataFrame(rows, columns=["media_id", "band", "energy"])

    return df.mapInPandas(op, schema="media_id long, band int, energy long")


def dhash_features(df: DataFrame, grid: int = 8) -> DataFrame:
    """Perceptual difference-hash (dHash) per image from REAL decoded
    PNG pixels: sample a (grid+1) x grid luminance lattice at
    ``(x*w DIV (grid+1), y*h DIV grid)`` (nearest-sample dHash — the
    fast-implementation variant; all-integer, so the hash is exactly
    reproducible on any engine) and set bit (y*grid + x) when the
    right sample is brighter than the left. Near-duplicate images then
    pair by Hamming distance over these 64 bits — the image-side
    analog of SimHash text dedup. Hash ships as two 32-bit halves
    (lo = rows 0..grid/2-1) so no engine touches the signed bit-63
    shift edge. Map-only Arrow batches; non-PNG strays drop out."""
    repo_root = REPO_ROOT

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct  # noqa: PLC0415
        import sys  # noqa: PLC0415
        import zlib  # noqa: PLC0415

        if repo_root not in sys.path:
            sys.path.insert(0, repo_root)
        from pyp_etl_pipeline_spark.multimodal import codecs  # noqa: PLC0415

        half = grid // 2
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                p = bytes(payload) if payload is not None else b""
                try:
                    px, w, h, bpp = codecs.png_decode_pixels(p)
                except (ValueError, IndexError, struct.error, zlib.error):
                    continue

                def lum(x: int, y: int) -> int:
                    if bpp == 1:
                        return int(px[y, x])
                    r, g, b = (int(px[y, x * 3 + c]) for c in range(3))
                    return (r + 2 * g + b) // 4

                sx = [x * w // (grid + 1) for x in range(grid + 1)]
                sy = [y * h // grid for y in range(grid)]
                lo = hi = 0
                n_bits = 0
                for yi in range(grid):
                    for x in range(grid):
                        bit = 1 if lum(sx[x + 1], sy[yi]) > lum(sx[x], sy[yi]) else 0
                        n_bits += bit
                        if yi < half:
                            lo |= bit << (yi * grid + x)
                        else:
                            hi |= bit << ((yi - half) * grid + x)
                rows.append(
                    {
                        "media_id": mid,
                        "width": w,
                        "height": h,
                        "dhash_lo": lo,
                        "dhash_hi": hi,
                        "n_gradient_bits": n_bits,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "dhash_lo", "dhash_hi", "n_gradient_bits"],
            )

    return df.mapInPandas(
        op,
        schema="media_id long, width int, height int, dhash_lo long, dhash_hi long, n_gradient_bits int",
    )
