"""Pure-python ground-truth implementation of the reference's fuzzy
scoring flow (app/etl.py:713-755, :1270-1374) using EXACT rapidfuzz
semantics — indel ratio, optimal-alignment partial_ratio,
token_set_ratio with the joined-sect special case, default_process —
reimplemented from the published algorithm definitions (rapidfuzz docs /
fuzzywuzzy lineage; no rapidfuzz import needed).

Used by test_scorer_fidelity.py to derive the expected BAND for a few
hundred item/title pairs; the engine's native-Spark scorers are a
documented deviation, so the tests compare band decisions, not raw
scores, and list every known divergence explicitly.
"""

from __future__ import annotations

import re

# reference constants (app/etl.py:40-51)
AUTO_RESOLVE_THRESHOLD = 97.0
AUTO_REJECT_THRESHOLD = 50.0
LENGTH_PENALTY_MULTIPLIER = 30.0
WORD_COUNT_PENALTY_MULTIPLIER = 10.0
DIETARY_TERMS_PENALTY = 20.0
SPECIAL_CHARS_PENALTY = 15.0
NUMBERS_PENALTY = 15.0
ALGORITHM_DISAGREEMENT_THRESHOLD = 20.0
ALGORITHM_DISAGREEMENT_PENALTY = 15.0
DIETARY_TERMS = ["gluten-free", "organic", "natural", "raw", "extra virgin", "whole grain"]


def default_process(s: str) -> str:
    """rapidfuzz utils.default_process: lowercase, non-alphanumeric ->
    space, strip."""
    return re.sub(r"[^a-z0-9]", " ", s.lower()).strip()


def _lcs_len(a: str, b: str) -> int:
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for ca in a:
        cur = [0] * (len(b) + 1)
        for j, cb in enumerate(b, 1):
            cur[j] = prev[j - 1] + 1 if ca == cb else max(prev[j], cur[j - 1])
        prev = cur
    return prev[-1]


def ratio(a: str, b: str) -> float:
    """rapidfuzz fuzz.ratio: normalized InDel similarity,
    100 * (1 - indel_dist / (len(a) + len(b)))."""
    if not a and not b:
        return 100.0
    total = len(a) + len(b)
    indel = total - 2 * _lcs_len(a, b)
    return 100.0 * (1.0 - indel / total)


def partial_ratio(a: str, b: str) -> float:
    """rapidfuzz fuzz.partial_ratio: best fuzz.ratio of the shorter
    string against every same-length window of the longer (exact
    maximum, brute force — strings here are short)."""
    short, long_ = (a, b) if len(a) <= len(b) else (b, a)
    if not short:
        return 100.0 if not long_ else 0.0
    if len(short) == len(long_):
        return ratio(short, long_)
    return max(ratio(short, long_[i : i + len(short)]) for i in range(len(long_) - len(short) + 1))


def token_set_ratio(a: str, b: str) -> float:
    """rapidfuzz fuzz.token_set_ratio over default_process'd inputs."""
    ta = set(default_process(a).split())
    tb = set(default_process(b).split())
    inter = ta & tb
    diff_ab = ta - tb
    diff_ba = tb - ta
    # rapidfuzz: non-empty intersection with either diff empty -> exact 100
    if inter and (not diff_ab or not diff_ba):
        return 100.0
    sect = " ".join(sorted(inter))
    s1 = (sect + " " + " ".join(sorted(diff_ab))).strip()
    s2 = (sect + " " + " ".join(sorted(diff_ba))).strip()
    return max(ratio(sect, s1), ratio(sect, s2), ratio(s1, s2))


def apply_match_penalties(text: str, match: str, raw_score: float) -> float:
    """Reference app/etl.py:713-755 verbatim (on the UNprocessed strings)."""
    adjusted = raw_score
    max_len = max(len(text), len(match))
    if max_len:
        adjusted -= (abs(len(text) - len(match)) / max_len) * LENGTH_PENALTY_MULTIPLIER
    word_diff = abs(len(text.split()) - len(match.split()))
    adjusted -= min(word_diff * WORD_COUNT_PENALTY_MULTIPLIER, 25)
    t_diet = any(t in text.lower() for t in DIETARY_TERMS)
    m_diet = any(t in match.lower() for t in DIETARY_TERMS)
    if t_diet != m_diet:
        adjusted -= DIETARY_TERMS_PENALTY
    t_spec = sum(1 for c in text if c in "!@#$%^&*()")
    m_spec = sum(1 for c in match if c in "!@#$%^&*()")
    if t_spec != m_spec:
        adjusted -= SPECIAL_CHARS_PENALTY
    t_num = any(c.isdigit() for c in text)
    m_num = any(c.isdigit() for c in match)
    if t_num != m_num:
        adjusted -= NUMBERS_PENALTY
    return max(0.0, adjusted)


def reference_band(item: str, title: str) -> tuple[str, float]:
    """Reference flow for a single-candidate pool (app/etl.py:1262-1374):
    exact lower match -> auto_resolve/100; else token_set raw, the
    ratio/partial cross-check on the (only = best) candidate, penalties,
    three-band routing. Returns (band, final_score)."""
    if item.lower() == title.lower():
        return "auto_resolve", 100.0
    raw = token_set_ratio(item, title)
    pa, pb = default_process(item), default_process(title)
    r = ratio(pa, pb)
    p = partial_ratio(pa, pb)
    adjusted = apply_match_penalties(item, title, raw)
    if max(abs(raw - r), abs(raw - p)) > ALGORITHM_DISAGREEMENT_THRESHOLD:
        adjusted -= ALGORITHM_DISAGREEMENT_PENALTY
    adjusted = max(0.0, adjusted)
    if adjusted >= AUTO_RESOLVE_THRESHOLD:
        return "auto_resolve", adjusted
    if adjusted >= AUTO_REJECT_THRESHOLD:
        return "review", adjusted
    return "reject", adjusted
