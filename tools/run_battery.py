"""Run the standing verification battery and record BATTERY_r<N>.json.

The battery CLAUDE.md documents, mechanized (the rotate_window lesson:
hand-driven per-round rituals drift — encode them):

1. stock oracle gate at sf0.1 (scale-dependent divergences),
2. all ten relational injection families at sf0.1 (collision-sensitive
   families need the bigger base; ordered most-catching-first), plus
   the corrupt-media family (check_badmedia.py — binary-payload axis),
3. the same eleven at sf0.001 (fast; catches anything size-independent).

Each run's tail line (N pass, M weak, K fail) is parsed and recorded;
any FAIL stops the battery immediately (fix, then re-run) unless
--keep-going. Evidence lands in BATTERY_r<N>.json for the round ledger.

Usage: python tools/run_battery.py <round> [--quick] [--keep-going]
       --quick: sf0.001 families only (pre-commit smoke, ~40 min)
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FAMILIES = [
    "--dupes", "--scramble", "--tsextremes", "--negatives", "--empty",
    "--skewhot", "", "--unicode", "--longdocs", "--badjson",
]
TAIL = re.compile(r"(\d+) pass, (\d+) weak[^,]*, (\d+) fail")


def run_one(args: list[str]) -> dict:
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, *args], capture_output=True, text=True, cwd=REPO
    )
    m = None
    for line in (proc.stdout + proc.stderr).splitlines():
        mm = TAIL.search(line)
        if mm:
            m = mm
    out = {
        "elapsed_s": round(time.time() - t0, 1),
        "returncode": proc.returncode,
    }
    if m:
        out.update({"pass": int(m.group(1)), "weak": int(m.group(2)), "fail": int(m.group(3))})
    else:
        out["error"] = (proc.stdout + proc.stderr)[-500:]
    return out


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__, file=sys.stderr)
        return 2
    rnd = int(sys.argv[1])
    quick = "--quick" in sys.argv
    keep_going = "--keep-going" in sys.argv
    gate = os.path.join("tools", "check_correctness.py")
    nulls = os.path.join("tools", "check_nulls.py")
    badmedia = os.path.join("tools", "check_badmedia.py")

    plan: list[tuple[str, list[str]]] = []
    if not quick:
        plan.append(("stock sf0.1", [gate, "/root/testdata/sf0.1"]))
        for fam in FAMILIES:
            name = fam.lstrip("-") or "null"
            plan.append((f"sf0.1 {name}", [nulls, "/root/testdata/sf0.1", *([fam] if fam else [])]))
        plan.append(("sf0.1 badmedia", [badmedia, "/root/testdata/sf0.1"]))
    for fam in FAMILIES:
        name = fam.lstrip("-") or "null"
        plan.append((f"sf0.001 {name}", [nulls, *([fam] if fam else [])]))
    plan.append(("sf0.001 badmedia", [badmedia, "/root/testdata/sf0.001"]))

    results: dict[str, dict] = {}
    ok = True
    for desc, args in plan:
        print(f"=== {desc} ===", flush=True)
        r = run_one(args)
        results[desc] = r
        print(f"    {r}", flush=True)
        if r.get("fail", 1) != 0 or r["returncode"] != 0:
            ok = False
            if not keep_going:
                break

    out_path = os.path.join(REPO, f"BATTERY_r{rnd:02d}.json")
    json.dump(
        {"round": rnd, "quick": quick, "green": ok, "runs": results},
        open(out_path, "w"),
        indent=1,
        sort_keys=True,
    )
    print(f"wrote {out_path}; green={ok}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
