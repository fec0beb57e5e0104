"""Semantic-category guard for match validation (J8).

Reference semantics (``app/routes.py:117-194``): a suggested match is
rejected when (a) exactly one side mentions a keyword category (with the
omega/probiotic-prebiotic carve-outs), (b) the pair hits a problematic
keyword pattern in either direction, or (c) the shorter name is less than
half the length of the longer. Keyword hit = substring containment on the
lowercased names, exactly like the reference.

Pure boolean column algebra — applied batch-wide, not per row in Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from pyp_etl_pipeline_spark.schema import CATEGORY_KEYWORDS, GUARD_MIN_LENGTH_RATIO, PROBLEMATIC_PAIRS


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _has_any(c: Column, keywords: list[str]) -> Column:
    out = F.lit(False)
    for kw in keywords:
        out = out | c.contains(kw)
    return out


def semantically_valid_match(original: Column | str, suggested: Column | str) -> Column:
    """True iff the (original, suggested) pair passes the semantic guard."""
    o = F.lower(F.trim(_col(original)))
    s = F.lower(F.trim(_col(suggested)))

    valid = o.isNotNull() & s.isNotNull() & (F.length(o) > 0) & (F.length(s) > 0)

    for category, keywords in CATEGORY_KEYWORDS.items():
        o_has = _has_any(o, keywords)
        s_has = _has_any(s, keywords)
        mismatch = o_has != s_has
        if category == "omega":
            # allow omega-3 vs omega-6 style matches when either mentions omega
            mismatch = mismatch & ~(o.contains("omega") | s.contains("omega"))
        valid = valid & ~mismatch

    for p1, p2 in PROBLEMATIC_PAIRS:
        valid = valid & ~(o.contains(p1) & s.contains(p2)) & ~(o.contains(p2) & s.contains(p1))

    length_ratio = F.least(F.length(o), F.length(s)) / F.greatest(F.length(o), F.length(s))
    valid = valid & (length_ratio >= GUARD_MIN_LENGTH_RATIO)
    return valid
