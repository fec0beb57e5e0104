"""Corrupt-media injection family (VERDICT r12 item 2).

The ten check_nulls families stress the RELATIONAL columns; this one
stresses the BINARY payloads — the one injection axis a real 100 TB web
corpus exercises hardest. Media payloads are not stored in the driver
parquet (every multimodal query synthesizes them per doc_id), so this
family corrupts at the same seam: it loads the sf dir's doc_ids,
synthesizes the same valid payload families the registry queries use,
deterministically corrupts ~5% of them (truncation / bit-flip / magic
clobber, selected by md5 of the id so reruns agree), and certifies the
corpus-scale contract on every multimodal operator surface:

- the 8 permissive-mode metadata operators (H.264/HEVC/AV1/VP9 ×
  stream/container) QUARANTINE per row — NULL fields + error column —
  and the stage never fails;
- ``decode_features`` (PNG/JPEG/WAV/MP4/AVI/GIF) yields null feature
  rows for strays by contract — and the stage never fails;
- TEETH: the same corpus plus a guaranteed-poison row (3-byte truncated
  payload) must make the STRICT (non-permissive) mode fail the stage —
  proving the corruption is real and the permissive path is what saves
  the run, not accidental parse tolerance.

Operators without a permissive mode (gif_pixel_stats, dhash, MJPEG
frame decode, …) follow the filter-by-contract pattern: corpora route
through decode_features/sniff first; that routing surface is what this
family certifies.

Usage: python tools/check_badmedia.py [sf_dir]   (default sf0.001)
Prints the check_correctness-style tail line so run_battery.py parses
it: "N pass, 0 weak (rows-only), K fail".
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CORRUPT_RESIDUE = 3  # media_id % 20 == 3 -> ~5%
POISON_ID = -1  # guaranteed-unparseable row for the strict-mode teeth


def _h(i: int) -> int:
    return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)


def corrupt_payload(payload: bytes, i: int) -> bytes:
    """Deterministic per-id corruption: truncate / bit-flip / clobber
    the magic. md5-seeded so both the build and the assertions agree."""
    h = _h(i)
    kind = h % 3
    if kind == 0:  # truncate somewhere strictly inside
        cut = 1 + h % max(1, len(payload) - 1)
        return payload[:cut]
    if kind == 1:  # flip one bit
        pos = h % len(payload)
        b = bytearray(payload)
        b[pos] ^= 1 << (h >> 8) % 8
        return bytes(b)
    return b"\x00\x01\x02\x03" + payload[4:]  # break the magic/marker


def synth_stream(kind: str, i: int) -> bytes:
    """One valid payload per (operator family, id) — the same encoder
    surface the registry queries synthesize through."""
    from pyp_etl_pipeline_spark.multimodal import av1, codecs, h264, h265, vp9

    ew, eh = 2 * (8 + i % 952), 2 * (8 + i % 532)  # even dims for NAL codecs
    if kind == "h264_sps":
        return h264.sps_encode(ew, eh, fps=24 + i % 30)
    if kind == "h264_mp4":
        return h264.mp4_avc_encode(ew, eh, 1 + i % 60000, fps=24 + i % 30)
    if kind == "hevc_sps":
        return h265.hevc_sps_encode(ew, eh, fps=24 + i % 30)
    if kind == "hevc_mp4":
        return h265.mp4_hevc_encode(ew, eh, 1 + i % 60000, fps=24 + i % 30)
    if kind == "av1_seq":
        return av1.av1_sequence_header_encode(
            1 + i % 1903, 1 + i % 1063, seq_profile=i % 3, seq_level_idx=8 + i % 24,
            fps=24 + i % 37,
        )
    if kind == "av1_mp4":
        return av1.mp4_av1_encode(ew, eh, 1 + i % 60000, seq_profile=i % 3)
    if kind == "vp9_frame":
        return vp9.vp9_frame_header_encode(1 + i % 1903, 1 + i % 1063, profile=i % 2)
    if kind == "vp9_mp4":
        return vp9.mp4_vp9_encode(ew, eh, 1 + i % 60000, level=10 + 10 * (i % 5))
    if kind == "mixed":  # decode_features corpus
        j = i % 6
        if j == 0:
            return codecs.png_encode_gray(4 + i % 32, 4 + i % 24, i % 256)
        if j == 1:
            return codecs.wav_encode_pcm16([(k * 37 + i) % 4096 - 2048 for k in range(64)])
        if j == 2:
            return codecs.jpeg_encode_gray(8 * (1 + i % 20), 8 * (1 + i % 12), i % 256)
        if j == 3:
            return codecs.mp4_encode(16 + i % 640, 16 + i % 360, 1 + i % 60000)
        if j == 4:
            return codecs.avi_mjpeg_encode(16, 16, [(i + k) % 256 for k in range(1 + i % 3)])
        return codecs.gif_encode_gray_pixels([[(x * y + i) % 256 for x in range(6)] for y in range(4)])
    raise ValueError(kind)


def build_df(spark, doc_ids, kind, with_poison=False):
    import pandas as pd  # noqa: PLC0415

    repo_root = REPO

    def op(batches):
        import sys as _sys  # noqa: PLC0415

        if repo_root not in _sys.path:
            _sys.path.insert(0, repo_root)
        from tools.check_badmedia import CORRUPT_RESIDUE, corrupt_payload, synth_stream  # noqa: PLC0415

        for pdf in batches:
            payloads = []
            for i in pdf["media_id"]:
                i = int(i)
                if i == POISON_ID:
                    payloads.append(synth_stream(kind, 7)[:3])
                    continue
                p = synth_stream(kind, i)
                payloads.append(corrupt_payload(p, i) if i % 20 == CORRUPT_RESIDUE else p)
            yield pd.DataFrame({"media_id": pdf["media_id"], "payload": payloads})

    ids = list(doc_ids) + ([POISON_ID] if with_poison else [])
    base = spark.createDataFrame([(int(i),) for i in ids], "media_id long").repartition(16)
    return base.mapInPandas(op, "media_id long, payload binary")


# expected coded width per family — clean rows must parse back EXACTLY
# (catches silent value drift in a parser, not just stage failures)
EXPECT_WIDTH = {
    "h264_sps": lambda i: 2 * (8 + i % 952),
    "h264_mp4": lambda i: 2 * (8 + i % 952),
    "hevc_sps": lambda i: 2 * (8 + i % 952),
    "hevc_mp4": lambda i: 2 * (8 + i % 952),
    "av1_seq": lambda i: 1 + i % 1903,
    "av1_mp4": lambda i: 2 * (8 + i % 952),
    "vp9_frame": lambda i: 1 + i % 1903,
    "vp9_mp4": lambda i: 2 * (8 + i % 952),
}


def certify_permissive(spark, doc_ids, name, kind, operator) -> tuple[bool, str]:
    """The full contract: permissive stage completes with per-row
    quarantine, clean rows parse back to the exact synthesized width;
    strict stage on the same corpus + poison row FAILS."""
    rows = operator(build_df(spark, doc_ids, kind), permissive=True).collect()
    if len(rows) != len(doc_ids):
        return False, f"row count {len(rows)} != {len(doc_ids)}"
    quarantined = 0
    for r in rows:
        i = r["media_id"]
        corrupt = i % 20 == CORRUPT_RESIDUE
        if r["error"] is not None:
            if not corrupt:
                return False, f"clean row {i} quarantined: {r['error']}"
            if r["width"] is not None:
                return False, f"row {i} has error AND fields"
            quarantined += 1
        elif r["width"] is None:
            return False, f"row {i} silently null without error"
        elif not corrupt and r["width"] != EXPECT_WIDTH[kind](i):
            return False, f"clean row {i} width drift: {r['width']} != {EXPECT_WIDTH[kind](i)}"
    if quarantined == 0:
        return False, "corruption had no teeth (nothing quarantined)"
    # strict mode must FAIL the stage on the same corpus + poison row
    try:
        operator(build_df(spark, doc_ids, kind, with_poison=True), permissive=False).collect()
        return False, "strict mode survived corrupt corpus (teeth missing)"
    except Exception:  # noqa: BLE001 — the expected stage failure
        pass
    return True, f"{len(rows)} rows, {quarantined} quarantined"


def certify_decode_features(spark, doc_ids) -> tuple[bool, str]:
    from pyp_etl_pipeline_spark.multimodal.binary_ops import decode_features

    rows = decode_features(build_df(spark, doc_ids, "mixed")).collect()
    if len(rows) != len(doc_ids):
        return False, f"row count {len(rows)} != {len(doc_ids)}"
    fmts = ["png", "wav", "jpeg", "mp4", "avi", "gif"]
    nulled = 0
    for r in rows:
        i = r["media_id"]
        corrupt = i % 20 == CORRUPT_RESIDUE
        has_features = any(
            r[k] is not None for k in ("width", "duration_ms", "mean_val", "rms")
        )
        if not corrupt:
            if r["format"] != fmts[i % 6] or not has_features:
                return False, f"clean row {i} mis-decoded: {r}"
        elif not has_features:
            nulled += 1
    if nulled == 0:
        return False, "corruption had no teeth (no null feature rows)"
    return True, f"{len(rows)} rows, {nulled} nulled strays"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import duckdb  # noqa: PLC0415

    from pyp_etl_pipeline_spark.multimodal import av1, h264, h265, vp9  # noqa: PLC0415
    from pyp_etl_pipeline_spark.session import get_spark  # noqa: PLC0415

    doc_ids = [
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
        ).fetchall()
    ]
    spark = get_spark()
    cases = [
        ("badmedia_h264_sps", "h264_sps", h264.sps_features),
        ("badmedia_h264_mp4", "h264_mp4", h264.avc_container_features),
        ("badmedia_hevc_sps", "hevc_sps", h265.hevc_sps_features),
        ("badmedia_hevc_mp4", "hevc_mp4", h265.hevc_container_features),
        ("badmedia_av1_seq", "av1_seq", av1.av1_seq_features),
        ("badmedia_av1_mp4", "av1_mp4", av1.av1_container_features),
        ("badmedia_vp9_frame", "vp9_frame", vp9.vp9_frame_features),
        ("badmedia_vp9_mp4", "vp9_mp4", vp9.vp9_container_features),
    ]
    n_pass = n_fail = 0
    for name, kind, operator in cases:
        t0 = time.time()
        try:
            ok, note = certify_permissive(spark, doc_ids, name, kind, operator)
        except Exception as exc:  # noqa: BLE001 — a stage failure IS the finding
            ok, note = False, f"stage failed: {type(exc).__name__}: {exc}"
        status = "PASS" if ok else "FAIL"
        print(f"{status} {name}: {note} ({time.time() - t0:.1f}s)", flush=True)
        n_pass += ok
        n_fail += not ok
    t0 = time.time()
    try:
        ok, note = certify_decode_features(spark, doc_ids)
    except Exception as exc:  # noqa: BLE001
        ok, note = False, f"stage failed: {type(exc).__name__}: {exc}"
    print(f"{'PASS' if ok else 'FAIL'} badmedia_decode_features: {note} ({time.time() - t0:.1f}s)", flush=True)
    n_pass += ok
    n_fail += not ok
    print(f"\n{n_pass} pass, 0 weak (rows-only), {n_fail} fail")
    return 0 if n_fail == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
