"""Propose the next round's _DRIVER_PRIORITY window from the evidence
ledger (CORRECTNESS_r*.json) — the per-round rotation that used to be
hand-edited (and grew the duplicate rows ADVICE r10 flagged).

Policy (the one VERDICT r9-r11 converged on):
1. changed-code / zero-evidence queries first (pass their names as
   --changed a,b,c — anything whose engine or twin changed since the
   last driver gate, plus brand-new queries, which are auto-detected);
2. then stalest-first backfill by each query's LATEST evidence round,
   ties broken by name;
3. the window is the first 50; everything after is recorded backfill
   order so the NEXT rotation stays deterministic.

Prints the proposed python list body; paste it into
driver_queries_ext._DRIVER_PRIORITY (the uniqueness/resolvability test
pins the invariants). Read-only: this tool never edits source.

Usage: python tools/rotate_window.py [--changed name1,name2,...]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WINDOW = 50


def latest_evidence() -> dict[str, int]:
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for name in json.load(open(f)):
            latest[name] = rnd
    return latest


def main() -> int:
    changed: list[str] = []
    args = sys.argv[1:]
    if "--changed" in args:
        changed = [
            n.strip()
            for n in args[args.index("--changed") + 1].split(",")
            if n.strip()
        ]

    from pyp_etl_pipeline_spark.driver_queries_ext import REGISTRY  # noqa: PLC0415

    latest = latest_evidence()
    names = list(REGISTRY)
    unknown = [n for n in changed if n not in REGISTRY]
    if unknown:
        print(f"ERROR: --changed names not in REGISTRY: {unknown}", file=sys.stderr)
        return 2

    new_queries = sorted(n for n in names if n not in latest and n not in changed)
    head = changed + new_queries
    backfill = sorted(
        (n for n in names if n not in head and n in latest),
        key=lambda n: (latest[n], n),
    )
    order = head + backfill
    window, tail = order[:WINDOW], order[WINDOW:]

    print(f"# proposed window ({len(window)} slots): "
          f"{len(changed)} changed + {len(new_queries)} new + "
          f"{WINDOW - len(head)} stalest-first backfill")
    for n in window:
        print(f'    "{n}",  # evidence r{latest.get(n, 0) or "—"}')
    print("    # ---- end of the 50-slot driver window ----")
    for n in tail:
        print(f'    "{n}",')
    stale = {}
    for n in tail:
        stale.setdefault(latest[n], []).append(n)
    oldest = min(stale) if stale else None
    print(f"# tail: {len(tail)} queries; oldest deferred evidence tier: "
          f"r{oldest} ({len(stale.get(oldest, []))} queries)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
