"""Fuzzy header -> canonical-schema mapping (P1/P2) — plan-time operator.

Reference semantics (``app/etl.py:448-531``): for each incoming header,
exact match against the canonical field's aliases first; otherwise the
best fuzz.ratio >= 60 match wins. User-supplied overrides (P2,
``app/routes.py:326-431``) replace the auto-map with confidence 100.

This is schema-level work on ``df.columns`` (tens of strings), so it runs
on the driver and compiles to a single ``select`` of aliased columns — the
data plane never sees the fuzzy matching. ``ratio`` here is the same
normalized-Levenshtein similarity the data-plane scorer uses.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyp_etl_pipeline_spark.schema import HEADER_MATCH_THRESHOLD, MEMBER_SCHEMA_FIELDS


def levenshtein(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def ratio(a: str, b: str) -> float:
    """MAX-normalized Levenshtein similarity in [0, 100].

    Deliberately different from the data plane's sum-normalized
    ``functions/scoring.ratio``: the reference's header matcher uses
    fuzz.ratio at the loose threshold 60 (app/etl.py:494-510), where the
    failure mode is junk headers sneaking past. For substitution-heavy
    equal-length junk ("mystery" vs "status"), max-normalization EQUALS
    the true indel ratio (indel = 2*lev there), while sum-normalizing
    plain Levenshtein over-scores it past 60; for the insertion-only
    shapes of genuine header variants, max-norm under-scores but stays
    comfortably above 60. Pinned by tests/test_plans_explode.py
    (Mystery column must stay unmapped)."""
    if not a and not b:
        return 100.0
    m = max(len(a), len(b))
    return 100.0 * (1.0 - levenshtein(a, b) / m) if m else 100.0


@dataclass
class HeaderMapping:
    mapping: dict[str, tuple[str, float]]  # header -> (canonical field, confidence)
    unmapped: list[str]

    def rename_dict(self) -> dict[str, str]:
        return {h: f for h, (f, _) in self.mapping.items()}


def map_headers_to_schema(
    headers: list[str],
    schema_fields: dict[str, list[str]] | None = None,
    threshold: float = HEADER_MATCH_THRESHOLD,
    overrides: dict[str, str] | None = None,
) -> HeaderMapping:
    """P1 (+P2 overrides). Each canonical field is assigned at most once;
    headers are processed in order, exact alias matches before fuzzy."""
    schema_fields = schema_fields or MEMBER_SCHEMA_FIELDS
    overrides = overrides or {}
    mapping: dict[str, tuple[str, float]] = {}
    taken: set[str] = set()
    unmapped: list[str] = []

    norm = {h: h.strip().lower() for h in headers}

    # user overrides first (P2): forced confidence 100
    for h in headers:
        if h in overrides and overrides[h] in schema_fields:
            mapping[h] = (overrides[h], 100.0)
            taken.add(overrides[h])

    # pass 1: exact alias / field-name match
    for h in headers:
        if h in mapping:
            continue
        nh = norm[h]
        for field, aliases in schema_fields.items():
            if field in taken:
                continue
            if nh == field.lower() or nh in aliases:
                mapping[h] = (field, 100.0)
                taken.add(field)
                break

    # pass 2: best fuzzy match >= threshold
    for h in headers:
        if h in mapping:
            continue
        nh = norm[h]
        best_field, best_score = None, threshold
        for field, aliases in schema_fields.items():
            if field in taken:
                continue
            score = max(ratio(nh, field.lower()), *(ratio(nh, a) for a in aliases))
            if score > best_score or (score == best_score and best_field is None and score >= threshold):
                best_field, best_score = field, score
        if best_field is not None:
            mapping[h] = (best_field, best_score)
            taken.add(best_field)
        else:
            unmapped.append(h)

    return HeaderMapping(mapping=mapping, unmapped=unmapped)


def apply_header_mapping(df: DataFrame, hm: HeaderMapping, keep_unmapped: bool = True) -> DataFrame:
    """P3 select: rename mapped headers to canonical fields; unmapped
    columns survive under ``unmapped_<header>`` (reference app/etl.py:666)."""
    cols = []
    for h in df.columns:
        if h in hm.mapping:
            cols.append(F.col(f"`{h}`").alias(hm.mapping[h][0]))
        elif keep_unmapped:
            cols.append(F.col(f"`{h}`").alias(f"unmapped_{h}"))
    return df.select(*cols)
