"""Inter-frame video decode plugin seam (libav / PyAV).

The pure-python codecs (``multimodal/codecs.py``) cover PNG, WAV, JPEG,
GIF (incl. animation), MJPEG-in-AVI per-frame pixel decode, and
MP4/ISO-BMFF container metadata. INTER-frame codecs (H.264, VP9, AV1)
require an external codec library by nature — motion-compensated
bitstreams are not reimplementable in the pure-python guarantee this
package keeps. This module is the documented seam for that one gap:

- a cluster image that ships PyAV calls :func:`try_register_pyav` once
  per worker (e.g. from a ``mapInPandas`` closure's first batch, or a
  site-packages ``.pth`` bootstrap) and the decode paths pick it up;
- without a registered decoder, ``decode_real`` keeps raising its
  honest ``NotImplementedError`` — no fake decode ever ships through
  this path.

The contract is deliberately tiny so any backend (PyAV, a GStreamer
shim, a vendor SDK) fits:

``decoder.container_formats`` — tuple of ``codecs.sniff_kind`` format
tags the backend claims (e.g. ``("mp4", "mkv", "webm")``).

``decoder.decode_frames(payload)`` — yields ``(frame_idx, pts_ms,
frame)`` with ``frame`` an HxWx3 uint8 numpy array in presentation
order. Implementations should honor partition-locality: decode only
the payload they are handed, never spool the corpus.

Design note (SCALE.md "Inter-frame video: the libav seam"): dispatch is
worker-local state keyed by container format, so executors on an image
WITH libav decode while a mixed fleet's bare executors keep raising —
the stray-tolerant mapInPandas wrappers already treat per-row decode
failure as a skipped row, which is the correct behavior for a 100 TB
corpus with occasional exotic codecs either way.
"""

from __future__ import annotations

import importlib
import os
from collections.abc import Iterator
from typing import Protocol, runtime_checkable


@runtime_checkable
class VideoFrameDecoder(Protocol):
    """Backend contract for inter-frame video pixel decode."""

    container_formats: tuple[str, ...]

    def decode_frames(self, payload: bytes) -> Iterator[tuple[int, float, "object"]]:
        """Yield (frame_idx, pts_ms, HxWx3 uint8 ndarray) in order."""
        ...  # pragma: no cover — protocol


# Worker-local registry: format tag -> decoder. Populated explicitly by
# the cluster image's bootstrap; never implicitly.
_VIDEO_DECODERS: dict[str, VideoFrameDecoder] = {}


def register_video_decoder(decoder: VideoFrameDecoder) -> None:
    """Register a backend for every container format it claims.
    Idempotent per format (last registration wins, mirroring how a
    bootstrap re-import behaves)."""
    for fmt in decoder.container_formats:
        _VIDEO_DECODERS[fmt] = decoder


_ENV_BOOTSTRAPPED = False


def get_video_decoder(fmt: str) -> VideoFrameDecoder | None:
    """Look up the backend claiming ``fmt``. On first miss, runs the
    env bootstrap once: ``PYP_VIDEO_PLUGIN=module:callable`` names a
    registration hook the cluster image ships (workers inherit the
    driver's env, so one ``spark.executorEnv.PYP_VIDEO_PLUGIN`` conf
    arms every executor — registry state itself is per-process and
    does NOT travel driver -> worker)."""
    global _ENV_BOOTSTRAPPED
    dec = _VIDEO_DECODERS.get(fmt)
    if dec is None and not _ENV_BOOTSTRAPPED:
        _ENV_BOOTSTRAPPED = True
        spec = os.environ.get("PYP_VIDEO_PLUGIN", "")
        if spec:
            mod_name, _, attr = spec.partition(":")
            try:
                module = importlib.import_module(mod_name)
                getattr(module, attr or "register")()
            except Exception:  # noqa: BLE001 — a broken bootstrap must not fail the query
                pass
        dec = _VIDEO_DECODERS.get(fmt)
    return dec


def clear_video_decoders() -> None:
    """Test hook: reset the worker-local registry."""
    global _ENV_BOOTSTRAPPED
    _ENV_BOOTSTRAPPED = False
    _VIDEO_DECODERS.clear()


def try_register_pyav() -> bool:
    """Register a PyAV-backed decoder if the library is importable.
    Returns False (and registers nothing) when libav isn't on the image
    — callers fall through to the honest ``NotImplementedError``."""
    try:
        import av  # noqa: PLC0415, F401
    except ImportError:
        return False

    import io  # noqa: PLC0415

    class _PyAVDecoder:
        container_formats = ("mp4", "mkv", "webm", "avi")

        def decode_frames(self, payload: bytes):  # pragma: no cover — needs libav
            import av as _av  # noqa: PLC0415

            with _av.open(io.BytesIO(payload)) as container:
                stream = container.streams.video[0]
                tb = float(stream.time_base) if stream.time_base else 0.0
                for i, frame in enumerate(container.decode(stream)):
                    pts_ms = (frame.pts or 0) * tb * 1000.0
                    yield i, pts_ms, frame.to_ndarray(format="rgb24")

    register_video_decoder(_PyAVDecoder())
    return True
