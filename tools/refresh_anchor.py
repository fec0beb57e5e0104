"""Refresh the quiet-host min-of-N anchors (BENCH_ANCHOR_R<N>.json).

Run ONLY on a quiet host (load < ~1): records min-of-ITERS warm timings
for the bench HEADLINE set and min-of-EXT_ITERS for the extended set.
Usage: python tools/refresh_anchor.py <round> [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import EXTENDED, HEADLINE  # noqa: E402
from pyp_etl_pipeline_spark.driver_queries_ext import REGISTRY  # noqa: E402
from pyp_etl_pipeline_spark.session import get_spark  # noqa: E402

ITERS, EXT_ITERS = 7, 3


def main() -> int:
    rnd = sys.argv[1]
    only = set(sys.argv[2:])
    load0 = os.getloadavg()[0]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("anchor", extra_conf={"spark.ui.showConsoleProgress": "false"})
    import __spark_entry__ as em  # noqa: PLC0415

    em._ensure_workers_can_import(spark)

    def run(name: str, iters: int) -> float:
        fn, _ = REGISTRY[name]
        fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
        best = min(
            (lambda t0: (fn(spark, sf_dir).write.format("noop").mode("overwrite").save(), time.perf_counter() - t0)[1])(time.perf_counter())
            for _ in range(iters)
        )
        return round(best, 3)

    out = {
        "round": int(rnd),
        "sf": 0.1,
        "iters": ITERS,
        "ext_iters": EXT_ITERS,
        "host_note": f"min-of-{ITERS} warm headline / min-of-{EXT_ITERS} extended on the "
        f"shared microVM, started at load avg {load0:.2f}. Single runs swing 2-3x — "
        "only min-of-N is comparable.",
        "queries": {},
        "extended": {},
    }
    for name in HEADLINE:
        if only and name not in only:
            continue
        out["queries"][name] = run(name, ITERS)
        print("headline", name, out["queries"][name], flush=True)
    for name in EXTENDED:
        if only and name not in only:
            continue
        out["extended"][name] = run(name, EXT_ITERS)
        print("extended", name, out["extended"][name], flush=True)
    out["total"] = round(sum(out["queries"].values()), 3)
    path = os.path.join(REPO, f"BENCH_ANCHOR_R{rnd}.json")
    if only and os.path.exists(path):  # partial refresh: merge
        with open(path) as f:
            prev = json.load(f)
        prev["queries"].update(out["queries"])
        prev["extended"].update(out["extended"])
        prev["total"] = round(sum(prev["queries"].values()), 3)
        out = prev
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print("wrote", path, "total", out["total"])
    return 0


if __name__ == "__main__":
    sys.exit(main())
