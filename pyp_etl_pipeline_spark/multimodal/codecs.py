"""Pure-python media codecs: PNG (gray8/rgb8) and WAV (PCM16) — real
byte-level decode with no external libraries.

The reference treats media as opaque attachments; at 100 TB a training
-data pipeline needs at least dimension/duration extraction and basic
signal features from real bytes. PIL/libav are not in this container,
but PNG is zlib (stdlib) + per-scanline filters and WAV is a RIFF header
+ PCM samples — both fully decodable in numpy:

- ``png_decode``: signature + IHDR (width/height/bit depth/color type),
  IDAT concatenation, zlib inflate, scanline unfilter (all five filter
  types), mean pixel value. Supports 8-bit grayscale and RGB, the
  dominant training-corpus cases; everything else raises with the exact
  unsupported field named.
- ``wav_decode``: RIFF/WAVE chunk walk, fmt (PCM16 only) + data chunk,
  sample count / duration, RMS amplitude over the int16 samples.
- ``png_encode_gray`` / ``wav_encode_pcm16``: minimal writers used by
  tests and the mm02 oracle query to round-trip ground-truth payloads
  (encode from known values -> decode -> features the DuckDB twin can
  compute analytically).

These run inside Arrow-batched ``mapInPandas`` (see ``binary_ops``) — a
batch of payloads decodes in one worker call, numpy-vectorized per image
/ clip, which is the same shape a PIL-based decoder would use.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
WAV_MAGIC = b"RIFF"


def sniff_kind(payload: bytes) -> str | None:
    """'png' / 'wav' when the magic bytes match, else None."""
    if payload.startswith(PNG_MAGIC):
        return "png"
    if payload[:4] == WAV_MAGIC and payload[8:12] == b"WAVE":
        return "wav"
    return None


# ------------------------------------------------------------------- PNG

def png_encode_gray(width: int, height: int, value: int) -> bytes:
    """Minimal valid 8-bit grayscale PNG: every pixel = ``value``."""

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)  # bit8, gray
    raw = b"".join(b"\x00" + bytes([value]) * width for _ in range(height))
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _unfilter(raw: np.ndarray, height: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filters (types 0-4). Returns (height, stride)."""
    rows = raw.reshape(height, stride + 1)
    ftypes = rows[:, 0]
    data = rows[:, 1:].astype(np.int64)
    out = np.zeros((height, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(height):
        line = data[y].copy()
        ft = int(ftypes[y])
        if ft == 0:  # None
            cur = line
        elif ft == 1:  # Sub
            cur = line
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif ft == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ft == 3:  # Average
            cur = line
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + (left + prev[x]) // 2) & 0xFF
        elif ft == 4:  # Paeth
            cur = line
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"unsupported PNG filter type {ft}")
        out[y] = cur
        prev = cur
    return out


def png_decode(payload: bytes) -> dict:
    """Real PNG decode: IHDR fields + unfiltered pixels -> mean value.

    Returns {width, height, bit_depth, color_type, mean_val}. Supports
    bit depth 8, color types 0 (gray) and 2 (rgb), no interlace.
    """
    if not payload.startswith(PNG_MAGIC):
        raise ValueError("not a PNG (signature mismatch)")
    pos = 8
    width = height = bit_depth = color_type = interlace = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif tag == b"IDAT":
            idat.extend(data)
        elif tag == b"IEND":
            break
        pos += 12 + length  # len + tag + data + crc
    if width is None:
        raise ValueError("PNG has no IHDR chunk")
    if bit_depth != 8:
        raise ValueError(f"unsupported PNG bit depth {bit_depth} (only 8)")
    if color_type not in (0, 2):
        raise ValueError(f"unsupported PNG color type {color_type} (only gray/rgb)")
    if interlace:
        raise ValueError("interlaced PNG not supported")
    bpp = 1 if color_type == 0 else 3
    stride = width * bpp
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if raw.size != height * (stride + 1):
        raise ValueError("PNG pixel data size mismatch")
    pixels = _unfilter(raw, height, stride, bpp)
    return {
        "width": int(width),
        "height": int(height),
        "bit_depth": int(bit_depth),
        "color_type": int(color_type),
        "mean_val": float(pixels.mean()),
    }


# ------------------------------------------------------------------- WAV

def wav_encode_pcm16(samples: list[int] | np.ndarray, rate: int = 8000) -> bytes:
    """Minimal mono PCM16 WAV from int16-range samples."""
    data = np.asarray(samples, dtype=np.int16).tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(payload: bytes) -> dict:
    """Real WAV decode: RIFF chunk walk -> PCM16 samples -> RMS.

    Returns {n_channels, sample_rate, n_samples, duration_ms, rms}.
    """
    if payload[:4] != WAV_MAGIC or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV (RIFF/WAVE header mismatch)")
    pos = 12
    n_channels = rate = bits = None
    data = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            audio_fmt, n_channels, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if audio_fmt != 1:
                raise ValueError(f"unsupported WAV audio format {audio_fmt} (only PCM)")
        elif tag == b"data":
            data = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    if bits != 16:
        raise ValueError(f"unsupported WAV bit depth {bits} (only 16)")
    samples = np.frombuffer(data, dtype="<i2")
    n_frames = samples.size // n_channels
    rms = float(np.sqrt(np.mean(samples.astype(np.float64) ** 2))) if samples.size else 0.0
    return {
        "n_channels": int(n_channels),
        "sample_rate": int(rate),
        "n_samples": int(n_frames),
        "duration_ms": 1000.0 * n_frames / rate,
        "rms": rms,
    }
