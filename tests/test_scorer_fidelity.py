"""Scorer-fidelity sweep: ~200 generated item/title pairs run through the
engine's fuzzy scoring chain (score_candidates: token_set raw ->
cross-check on best -> penalties -> band), compared against the exact
rapidfuzz-semantics reference implementation in reference_scoring.py.

The engine's scorers are a documented deviation (native Spark
levenshtein-based ratio instead of rapidfuzz's indel ratio; containment
check instead of optimal-alignment partial_ratio), so the contract
pinned here is the BAND DECISION. Every known band divergence is listed
in KNOWN_DIVERGENCES with its cause; the test fails if a new divergence
appears OR a listed one silently disappears (fixed divergences must be
removed from the list)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyp_etl_pipeline_spark.functions import scoring
from pyp_etl_pipeline_spark.operators import resolve
from tests.reference_scoring import reference_band

BASES = [
    "vitamin c",
    "vitamin d3",
    "omega 3 fish oil",
    "magnesium citrate",
    "whey protein isolate",
    "zinc picolinate",
    "calcium carbonate",
    "iron supplement",
    "folic acid",
    "ascorbic acid powder",
    "green tea extract",
    "milk thistle",
    "turmeric curcumin",
    "probiotic blend",
    "collagen peptides",
    "melatonin",
    "biotin",
    "creatine monohydrate",
]


def _typo(tok: str) -> str:
    """Drop the 2nd character of the first token."""
    return tok[:1] + tok[2:] if len(tok) > 3 else tok + "x"


def _pairs() -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    for b in BASES:
        toks = b.split()
        out.append((b.title(), b.title()[:-1] + b[-1].upper()))  # case variant, not exact-equal
        out.append((" ".join(reversed(toks)), b))                # token reorder
        out.append((b + " capsules", b))                         # one extra word
        out.append((b + " capsules 90 count value pack", b))     # many extra words + digits
        if len(toks) > 1:
            out.append((" ".join(toks[:-1]), b))                 # dropped word
        out.append((" ".join([_typo(toks[0])] + toks[1:]), b))   # first-token typo
        out.append(("organic " + b, b))                          # dietary mismatch
        out.append(("natural " + b, "organic " + b))             # dietary both sides
        out.append((b + " 500", b))                              # digit one side
        out.append((b + " 500", b + " 1000"))                    # digits both sides
        out.append((b + " (new)", b))                            # special chars one side
        out.append((b, "premium ultra " + b))                    # containment in longer title
        out.append((b + "!", b))                                 # trailing special char
        if " " in b:
            out.append((b.replace(" ", "-", 1), b))              # hyphenated first gap
    # token-disjoint + garbage
    out += [
        ("gelatne", "gelatin"),
        ("mangesium citrte", "magnesium citrate"),
        ("zzz qqq xxx", "vitamin c"),
        ("completely unrelated words here", "whey protein isolate"),
        ("omega-3 fish oil", "omega 3 fish oil"),
        ("gluten-free oat flour", "oat flour"),
        ("extra virgin olive oil", "olive oil"),
        ("whole grain brown rice", "brown rice"),
    ]
    # dedupe by item (score_candidates partitions per item); drop exact-equal
    seen: set[str] = set()
    uniq = []
    for item, title in out:
        if item.lower() == title.lower() or item in seen:
            continue
        seen.add(item)
        uniq.append((item, title))
    return uniq


PAIRS = _pairs()

# (item, title) -> reason. Divergences are band-level only and all stem
# from the two documented scorer deviations; each entry was verified by
# hand against both implementations.
KNOWN_DIVERGENCES: dict[tuple[str, str], str] = {}


@pytest.fixture(scope="module")
def engine_bands(spark):
    df = spark.createDataFrame(PAIRS, "item string, title string")
    pairs = df.select(
        F.col("item").alias("__item"),
        F.col("title").alias("__title"),
        F.lit("X").alias("__cand_id"),
        scoring.tokens("item").alias("__q_tokens"),
        scoring.tokens("title").alias("__d_tokens"),
    )
    scored = resolve.score_candidates(pairs).withColumn("band", scoring.band("adjusted_score"))
    return {
        (r["__item"], r["__title"]): (r["band"], r["adjusted_score"])
        for r in scored.collect()
    }


def test_fixture_size():
    assert len(PAIRS) >= 200, len(PAIRS)


def test_band_fidelity_sweep(engine_bands):
    new_div = {}
    fixed_div = []
    for item, title in PAIRS:
        expected_band, expected_score = reference_band(item, title)
        got_band, got_score = engine_bands[(item, title)]
        key = (item, title)
        if got_band != expected_band:
            if key not in KNOWN_DIVERGENCES:
                new_div[key] = (expected_band, expected_score, got_band, got_score)
        elif key in KNOWN_DIVERGENCES:
            fixed_div.append(key)
    assert not new_div, f"new band divergences vs reference: {new_div}"
    assert not fixed_div, f"divergences now fixed — remove from KNOWN_DIVERGENCES: {fixed_div}"
