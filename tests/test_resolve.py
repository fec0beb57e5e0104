"""Entity-resolution operator tests (J1-J7): exact join, blocked fuzzy
join, penalties, band routing, alternatives.

Band thresholds (reference app/etl.py:40-42): >=97 auto_resolve,
[50, 97) review, <50 reject.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyp_etl_pipeline_spark.functions import scoring
from pyp_etl_pipeline_spark.operators import resolve


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame(
        [
            ("Vitamin C", "P1"),
            ("Vitamin D3", "P2"),
            ("Omega-3 Fish Oil", "P3"),
            ("Magnesium Citrate", "P4"),
            ("Whey Protein Isolate", "P5"),
        ],
        "title string, ext_id string",
    )


def test_exact_resolve_case_insensitive(spark, dim):
    items = spark.createDataFrame([("  vitamin c ",), ("unknown thing",)], "item string")
    out = resolve.exact_resolve(items, dim).collect()
    by_item = {r["item"].strip(): r for r in out}
    hit = by_item["vitamin c"]
    assert hit["matched_id"] == "P1" and hit["resolved"] and hit["score"] == 100.0
    miss = by_item["unknown thing"]
    assert miss["matched_id"] is None and not miss["resolved"] and miss["score"] is None


def test_exact_resolve_plan_is_broadcast_join(spark, dim):
    items = spark.createDataFrame([("vitamin c",)], "item string")
    plan = resolve.exact_resolve(items, dim)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_similarity_resolve_bands(spark, dim):
    items = spark.createDataFrame(
        [
            ("Vitamin C",),            # exact -> auto_resolve, 100
            ("vitamin c.",),           # near-exact -> high score
            ("magnesium citrate caps",),  # extra word -> review band
            ("zzz qqq xxx",),          # no shared token -> reject
        ],
        "item string",
    )
    out = {r["item"]: r for r in resolve.similarity_resolve(items, dim).collect()}
    assert len(out) == 4

    assert out["Vitamin C"]["band"] == "auto_resolve"
    assert out["Vitamin C"]["score"] == 100.0 and out["Vitamin C"]["resolved"]

    assert out["zzz qqq xxx"]["band"] == "reject"
    assert out["zzz qqq xxx"]["score"] == 0.0 and not out["zzz qqq xxx"]["resolved"]

    mc = out["magnesium citrate caps"]
    assert mc["band"] in ("review", "auto_resolve")
    assert mc["matched_title"] == "Magnesium Citrate"

    # every item lands in exactly one band (partition totality)
    assert all(r["band"] in ("auto_resolve", "review", "reject") for r in out.values())


def test_similarity_resolve_only_resolves_auto_band(spark, dim):
    items = spark.createDataFrame([("magnesium citrate capsules extra",)], "item string")
    row = resolve.similarity_resolve(items, dim).collect()[0]
    if row["band"] != "auto_resolve":
        assert row["matched_id"] is None and not row["resolved"]


def test_fuzzy_candidates_blocking_excludes_no_shared_token(spark, dim):
    items = spark.createDataFrame([("vitamin powder",), ("nothing shared",)], "item string")
    pairs = resolve.fuzzy_candidates(items, dim).collect()
    cand_items = {r["__item"] for r in pairs}
    assert "vitamin powder" in cand_items
    assert "nothing shared" not in cand_items
    # vitamin powder blocks only onto the two Vitamin* rows
    titles = {r["__title"] for r in pairs if r["__item"] == "vitamin powder"}
    assert titles == {"Vitamin C", "Vitamin D3"}


def test_max_token_df_drops_frequent_tokens(spark):
    dim = spark.createDataFrame(
        [(f"acme widget {i}", f"D{i}") for i in range(20)] + [("rare gem", "D99")],
        "title string, ext_id string",
    )
    items = spark.createDataFrame([("acme thing",), ("rare stone",)], "item string")
    pairs = resolve.fuzzy_candidates(items, dim, max_token_df=5, ngram_fallback=False).collect()
    # 'acme'/'widget' appear 20x in dim > cap -> dropped as blocking tokens
    assert all(r["__item"] != "acme thing" for r in pairs)
    assert any(r["__item"] == "rare stone" for r in pairs)
    # with the fallback on, the df-capped item is rescued through char-gram
    # blocking instead of silently losing all candidates
    pairs_fb = resolve.fuzzy_candidates(items, dim, max_token_df=5).collect()
    assert any(r["__item"] == "acme thing" for r in pairs_fb)


def test_ngram_fallback_reaches_token_disjoint_typo(spark):
    dim = spark.createDataFrame(
        [("gelatin", "D1"), ("vitamin c", "D2")], "title string, ext_id string"
    )
    items = spark.createDataFrame([("gelatne",), ("zzz qqq",)], "item string")
    pairs = resolve.fuzzy_candidates(items, dim).collect()
    # typo shares no whole token but most 3-grams -> candidate surfaced
    assert any(r["__item"] == "gelatne" and r["__title"] == "gelatin" for r in pairs)
    # gram-disjoint garbage still gets nothing
    assert all(r["__item"] != "zzz qqq" for r in pairs)


# ------------------------------------------------------------- J4 penalties

def _penalty_score(spark, raw, text_v, match_v):
    df = spark.createDataFrame([(raw, text_v, match_v)], "raw double, t string, m string")
    return df.select(
        scoring.apply_match_penalties(F.col("raw"), F.col("t"), F.col("m")).alias("s")
    ).collect()[0]["s"]


def test_penalty_identical_strings_no_penalty(spark):
    assert _penalty_score(spark, 90.0, "fish oil", "fish oil") == 90.0


def test_penalty_word_count_capped_at_25(spark):
    s = _penalty_score(spark, 100.0, "a", "a " + " ".join(["b"] * 9))
    # word diff 9 * 10 capped at 25; length penalty also applies
    assert s <= 75.0


def test_penalty_digit_mismatch(spark):
    with_d = _penalty_score(spark, 100.0, "vitamin b", "vitamin b6")
    assert with_d < 100.0 - 14.0  # numbers penalty 15 (+ small length penalty)


def test_penalty_floor_zero(spark):
    assert _penalty_score(spark, 5.0, "a", "completely different thing 123!!") == 0.0


def test_band_thresholds(spark):
    df = spark.createDataFrame([(97.0,), (96.99,), (50.0,), (49.99,)], "s double")
    out = [r[0] for r in df.select(scoring.band("s")).collect()]
    assert out == ["auto_resolve", "review", "review", "reject"]


def test_confidence_class(spark):
    df = spark.createDataFrame([(90.0,), (89.9,), (70.0,), (69.9,)], "s double")
    out = [r[0] for r in df.select(scoring.confidence_class("s")).collect()]
    assert out == ["high", "medium", "medium", "low"]


def test_token_set_ratio_reordering_invariant(spark):
    df = spark.createDataFrame([("fish oil omega", "omega fish oil")], "a string, b string")
    s = df.select(scoring.token_set_ratio("a", "b").alias("s")).collect()[0]["s"]
    assert s == 100.0
