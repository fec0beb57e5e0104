"""10x scale probe (VERDICT r8 item 4): measure how the heaviest
registry queries scale from sf0.1 to a synthetic 10x upscale of it.

The driver ships no sf1.0, so the probe builds one: each fact table is
replicated 10x with key offsets; documents get a per-copy suffix token
(so near-dup structure scales linearly instead of exploding
combinatorially), embeddings get a per-copy array rotation (norms
preserved, geometry varied), lineitem/orders keep their dimension keys
(so the interaction graph densifies, the realistic direction).

Per query: min-of-2 warm runs at both scales; the scaling exponent is
log10(t_10x / t_1x) — 1.0 = linear, <1 = sublinear (fixed overheads
amortizing), >1 = superlinear (a scale problem worth a look).

Usage: python tools/scale_probe.py [query ...]   (default: the heavy set)
Writes BENCH_SF1.json at the repo root and prints one JSON line.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"
DST = "/tmp/spark_graft_sf1_probe"
COPIES = 10
HEAVY = [
    "dd09_containment_pairs",
    "dd10_exact_substring_spans",
    "pp01_pretraining_pipeline",
    "ann05_pq_topk",
    "ann06_ivfpq_topk",
    "ann07_ivfpq_refine_topk",
    "ev02_ann_recall",
    "ev03_rank_agreement",
    "sd01_semantic_dedup",
    "gr02_star_components",
    "bfs01_reach_levels",
    # round-10 extension (VERDICT r9 item 5): the expensive non-ANN
    # headliners, so every >1 s bench query has a measured 10x exponent
    "j02_fuzzy_topk",
    "j13_reject_payload",
    "dd02_ngram_jaccard_pairs",
    "dd03_minhash_lsh_pairs",
    "a01_band_summary",
    "w03_sessionize_30m",
    "aj01_asof_purchase_view",
]

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def build_upscale() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    copies = ", ".join(str(k) for k in range(COPIES))
    specs = {
        "documents": f"""
            SELECT doc_id + k * 10000000 AS doc_id,
                   CASE WHEN k = 0 THEN text ELSE text || ' copytag' || k END AS text,
                   lang, source, n_chars
            FROM read_parquet('{SRC}/documents.parquet'), (SELECT unnest([{copies}]) AS k)""",
        "embeddings": f"""
            SELECT vec_id + k * 10000000 AS vec_id,
                   CASE WHEN k = 0 THEN embedding
                        ELSE embedding[(k + 1):] || embedding[:k] END AS embedding,
                   label
            FROM read_parquet('{SRC}/embeddings.parquet'), (SELECT unnest([{copies}]) AS k)""",
        "events": f"""
            SELECT event_id + k * 100000000 AS event_id,
                   user_id + k * 10000000 AS user_id,
                   * EXCLUDE (event_id, user_id)
            FROM read_parquet('{SRC}/events.parquet'), (SELECT unnest([{copies}]) AS k)""",
        "lineitem": f"""
            SELECT l_orderkey + k * 100000000 AS l_orderkey,
                   * EXCLUDE (l_orderkey)
            FROM read_parquet('{SRC}/lineitem.parquet'), (SELECT unnest([{copies}]) AS k)""",
        "orders": f"""
            SELECT o_orderkey + k * 100000000 AS o_orderkey,
                   * EXCLUDE (o_orderkey)
            FROM read_parquet('{SRC}/orders.parquet'), (SELECT unnest([{copies}]) AS k)""",
    }
    for t in TABLES:
        dst_file = f"{DST}/{t}.parquet"
        if os.path.exists(dst_file):
            continue
        sel = specs.get(t, f"SELECT * FROM read_parquet('{SRC}/{t}.parquet')")
        con.execute(f"COPY ({sel}) TO '{dst_file}' (FORMAT PARQUET)")


def main() -> int:
    names = sys.argv[1:] or HEAVY
    build_upscale()
    from pyp_etl_pipeline_spark.driver_queries_ext import REGISTRY  # noqa: PLC0415
    from pyp_etl_pipeline_spark.session import get_spark  # noqa: PLC0415

    spark = get_spark("scale_probe", extra_conf={"spark.ui.showConsoleProgress": "false"})
    import __spark_entry__ as em  # noqa: PLC0415

    em._ensure_workers_can_import(spark)

    def run(name: str, sf_dir: str) -> float:
        fn, _ = REGISTRY[name]
        best = math.inf
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return best

    out = {}
    for name in names:
        fn, _ = REGISTRY[name]
        try:
            fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
            t1 = run(name, SRC)
            t10 = run(name, DST)
            out[name] = {
                "sf0.1_sec": round(t1, 2),
                "x10_sec": round(t10, 2),
                "exponent": round(math.log10(t10 / t1), 2) if t1 > 0 else None,
            }
        except Exception as exc:  # noqa: BLE001
            out[name] = {"error": f"{type(exc).__name__}: {exc}"[:300]}
        print(name, out[name], flush=True)

    # MERGE into the existing file (same contract as refresh_anchor's
    # partial refresh): a filtered run must not clobber rows it did not
    # re-measure — the r11 full run silently dropped the dd02 strategy-
    # calibration rows before this landed.
    path = os.path.join(REPO, "BENCH_SF1.json")
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
        prev.update(out)
        out = prev
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({"metric": "scale_probe_10x", "queries": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
