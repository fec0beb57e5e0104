"""Golden fuzzy-band table (FIXTURES.md: one case per band x penalty x
guard combination, hand-derived from the reference's semantics at
app/etl.py:40-51, :713-755, :1280-1374 and app/routes.py:117-194).

These pin the BAND DECISION (the externally visible contract), not raw
scorer values — the engine's native token_set/levenshtein scorers are a
documented deviation from rapidfuzz, but the three-band routing must
stay faithful for the workflow to behave identically.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyp_etl_pipeline_spark.functions import scoring
from pyp_etl_pipeline_spark.operators import resolve
from pyp_etl_pipeline_spark.operators.guard import semantically_valid_match

# (case_id, item, dim_title, expected_band)
# dim contains ONLY the paired title for each case, so banding is isolated.
# Items run through the pipeline's normalize chain first (the reference
# normalizes each fragment via normalize_offering_text + sanitize_string
# before resolution, app/etl.py:1228-1231).
BAND_CASES = [
    # --- auto_resolve band (>= 97)
    ("exact", "Vitamin C", "Vitamin C", "auto_resolve"),
    ("exact_case", "vitamin c", "Vitamin C", "auto_resolve"),
    ("exact_ws", "  Vitamin   C  ", "Vitamin C", "auto_resolve"),  # T2 collapse pre-resolve
    # --- review band [50, 97)
    # token reorder: token_set=100 but plain ratio disagrees -> J3 penalty -> 85
    ("token_reorder", "Oil Fish Omega", "Omega Fish Oil", "review"),
    ("extra_word", "Magnesium Citrate Capsules", "Magnesium Citrate", "review"),
    # digit on one side only: numbers penalty 15 (+ small length penalty)
    ("digit_mismatch", "Vitamin B", "Vitamin B6", "review"),
    # single-token typo shares NO whole token with its target — the
    # reference's full-pool scan still surfaces it (app/etl.py:1270-1272);
    # engine reaches it via the char-3-gram fallback blocking
    ("token_typo", "Gelatne", "Gelatin", "review"),
    ("token_typo_multi", "Mangesium Citrte", "Magnesium Citrate", "review"),
    # --- reject band (< 50)
    ("no_overlap", "zzz qqq xxx", "Vitamin C", "reject"),
    # subset names score 100 raw, then disagreement 15 + length 15 +
    # word-count 25 + dietary ('natural') 20 stack up -> 25
    ("subset_long", "Pure Natural Whey Protein Isolate Powder", "Whey Protein Isolate", "reject"),
    # dietary term on one side + big length/word gap -> 36.5
    ("dietary_mismatch", "Organic Honey", "Honey", "reject"),
    ("wordcount_gap", "Salt", "Salt Pepper Cumin Thyme Basil", "reject"),
]


def _normalize_items(df):
    from pyp_etl_pipeline_spark.functions.text import normalize_offering_text, sanitize_string

    return df.withColumn("item", sanitize_string(normalize_offering_text("item")))


@pytest.mark.parametrize(("case_id", "item", "title", "expected"), BAND_CASES)
def test_band_decision(spark, case_id, item, title, expected):
    items = _normalize_items(spark.createDataFrame([(item,)], "item string"))
    dim = spark.createDataFrame([(title, "D1")], "title string, ext_id string")
    row = resolve.similarity_resolve(items, dim).collect()[0]
    assert row["band"] == expected, f"{case_id}: got {row['band']} score={row['score']}"


# --- J3 disagreement penalty golden: token-reordered strings score 100 on
# token_set but low on plain ratio -> spread > 20 -> penalty fires
def test_disagreement_penalty_fires_on_reorder(spark):
    df = spark.createDataFrame([("alpha beta gamma", "gamma beta alpha")], "a string, b string")
    tsr = scoring.token_set_ratio("a", "b")
    plain = scoring.ratio(F.lower(F.trim(F.col("a"))), F.lower(F.trim(F.col("b"))))
    out = df.select(
        tsr.alias("tsr"),
        plain.alias("plain"),
        scoring.algorithm_disagreement_penalty(tsr, plain, plain).alias("pen"),
    ).collect()[0]
    assert out["tsr"] == 100.0 and out["plain"] < 80.0 and out["pen"] == 15.0


def test_disagreement_penalty_silent_on_agreement(spark):
    df = spark.createDataFrame([("vitamin c", "vitamin c")], "a string, b string")
    out = df.select(
        scoring.algorithm_disagreement_penalty(
            scoring.token_set_ratio("a", "b"),
            scoring.ratio("a", "b"),
            scoring.containment_ratio("a", "b"),
        ).alias("pen")
    ).collect()[0]
    assert out["pen"] == 0.0


# --- J8 guard goldens: every category trap from app/routes.py:129-191
GUARD_CASES = [
    ("same_category_ok", "Vitamin C Powder", "Vitamin C", True),
    ("vitamin_vs_amino", "Vitamin D", "Amino Acid Blend", False),
    ("additive_vs_adhesive", "Food Additive", "Industrial Adhesive", False),
    ("omega_carveout", "Omega 3 Fish Oil", "Omega-6 Blend Oil", True),
    ("length_ratio_fail", "Salt", "Himalayan Pink Sea Salt Crystals", False),
    # guard also rejects on length ratio < 0.5 alone: "Honey" (5) vs
    # "Honey Powder" (12) fails even though categories agree
    ("short_vs_long", "Honey", "Honey Powder", False),
    ("plain_ok", "Honey Jar", "Honey Powder", True),
]


@pytest.mark.parametrize(("case_id", "orig", "sugg", "expected"), GUARD_CASES)
def test_semantic_guard_golden(spark, case_id, orig, sugg, expected):
    df = spark.createDataFrame([(orig, sugg)], "o string, s string")
    out = df.select(semantically_valid_match("o", "s").alias("v")).collect()[0]["v"]
    assert out is expected, case_id


# --- partition totality over a mixed batch: every input item lands in
# exactly one band and nothing is lost or duplicated
def test_band_partition_totality(spark):
    items = spark.createDataFrame([(i,) for _, i, _, _ in BAND_CASES], "item string").distinct()
    dim = spark.createDataFrame([(t, f"D{n}") for n, (_, _, t, _) in enumerate(BAND_CASES)], "title string, ext_id string")
    out = resolve.similarity_resolve(items, dim)
    n_in = items.count()
    assert out.count() == n_in
    assert out.select("item").distinct().count() == n_in
    assert out.filter(~F.col("band").isin("auto_resolve", "review", "reject")).count() == 0
