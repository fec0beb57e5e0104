"""tools/rotate_window.py: the evidence policy (ADVICE r11 lows).

Only GREEN rows (rows+schema+hash all true, no err) count as evidence;
a query whose most recent driver row failed must lead the next window,
not be deferred as "freshest"; zero-evidence tail entries must not
crash the stale-tier summary.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys


def _load_tool():
    path = os.path.join(os.path.dirname(__file__), "..", "tools", "rotate_window.py")
    spec = importlib.util.spec_from_file_location("rotate_window", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["rotate_window"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_latest_evidence_counts_only_green_rows(tmp_path, monkeypatch):
    green = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
    red_hash = {"rows_match": True, "schema_match": True, "hash_match": False, "err": None}
    red_err = {"rows_match": False, "schema_match": False, "hash_match": False, "err": "boom"}

    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"q_a": green, "q_b": green, "q_c": green})
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({"q_a": green, "q_b": red_hash, "q_d": red_err})
    )

    mod = _load_tool()
    monkeypatch.setattr(mod, "REPO", str(tmp_path))
    latest, red = mod.latest_evidence()

    # green evidence: q_b's LATEST green is r1 (the r2 hash fail is not
    # evidence); q_d has no green row at all
    assert latest == {"q_a": 2, "q_b": 1, "q_c": 1}
    # red-latest set: most recent row failed -> must lead the window
    assert red == {"q_b", "q_d"}


def test_red_latest_recovers_when_later_row_is_green(tmp_path, monkeypatch):
    green = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
    red = {"rows_match": True, "schema_match": True, "hash_match": False, "err": None}
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({"q_a": red}))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({"q_a": green}))
    mod = _load_tool()
    monkeypatch.setattr(mod, "REPO", str(tmp_path))
    latest, red_set = mod.latest_evidence()
    assert latest == {"q_a": 2}
    assert red_set == set()
