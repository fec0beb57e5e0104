"""Review state machine (F7/F8, batch decisions, J8 guard, J12 backfill)
and MERGE-upsert operator tests (J9/J10)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyp_etl_pipeline_spark.operators import review, upsert

REVIEW_SCHEMA = (
    "item string, score double, suggested_name string, suggested_ext_id string, "
    "approved boolean, resolved boolean, ignored boolean, matched_canonical_id string"
)


@pytest.fixture()
def reviews(spark):
    return spark.createDataFrame(
        [
            ("vitamin c tablets", 95.0, "Vitamin C", "P1", None, False, False, None),
            ("amino blend", 92.0, "Vitamin B12", "P2", None, False, False, None),  # guard should block
            ("obscure item", 55.0, "Something", "P3", None, False, False, None),
            ("already done", 98.0, "Done", "P4", True, True, False, "P4"),
            ("ignored item", 60.0, "X", "P5", None, False, True, None),
        ],
        REVIEW_SCHEMA,
    )


def test_pending_reviews(reviews):
    pend = {r["item"] for r in review.pending_reviews(reviews).collect()}
    assert pend == {"vitamin c tablets", "amino blend", "obscure item"}


def test_high_confidence_band(reviews):
    hc = {r["item"] for r in review.high_confidence_band(reviews).collect()}
    assert hc == {"vitamin c tablets", "amino blend"}  # >=90, <97, has suggestion


def test_batch_approve_high_confidence_with_guard(reviews):
    out = {r["item"]: r for r in review.apply_batch_approve_high_confidence(reviews).collect()}
    ok = out["vitamin c tablets"]
    assert ok["approved"] is True and ok["resolved"] is True and ok["matched_canonical_id"] == "P1"
    # J8 semantic guard: vitamin<->amino category mismatch stays pending
    blocked = out["amino blend"]
    assert blocked["approved"] is None and blocked["matched_canonical_id"] is None
    # below-band untouched
    assert out["obscure item"]["approved"] is None


def test_batch_ignore_only_pending(reviews):
    out = {r["item"]: r for r in review.apply_batch_ignore(reviews).collect()}
    assert out["vitamin c tablets"]["ignored"] is True
    assert out["already done"]["ignored"] is False  # decided rows untouched


def test_apply_decisions(spark, reviews):
    decisions = spark.createDataFrame(
        [
            ("vitamin c tablets", "approve_match", None),
            ("amino blend", "create_new", None),
            ("obscure item", "ignore", None),
        ],
        "item string, action string, chosen_ext_id string",
    )
    out = {r["item"]: r for r in review.apply_decisions(reviews, decisions).collect()}
    assert out["vitamin c tablets"]["approved"] and out["vitamin c tablets"]["matched_canonical_id"] == "P1"
    assert out["amino blend"]["approved"] and out["amino blend"]["matched_canonical_id"] is None
    assert out["obscure item"]["approved"] is False and out["obscure item"]["ignored"] is True
    assert out["already done"]["approved"] is True  # untouched


def test_backfill_canonical_names(spark, reviews):
    dim = spark.createDataFrame([("P1", "Vitamin C (canonical)")], "ext_id string, title string")
    approved = review.apply_batch_approve_high_confidence(reviews)
    out = {r["item"]: r for r in review.backfill_canonical_names(approved, dim).collect()}
    assert out["vitamin c tablets"]["display_name"] == "Vitamin C (canonical)"
    assert out["amino blend"]["display_name"] == "Vitamin B12"  # fallback to suggestion


# ----------------------------------------------------------------- upsert

def test_dim_lookup_or_create(spark):
    dim = spark.createDataFrame([("Vitamin C", "P1")], "title string, ext_id string")
    incoming = spark.createDataFrame(
        [("vitamin c",), ("Brand New Thing",)], "title string"
    )
    lookup = upsert.dim_lookup_or_create(incoming, dim)
    res = {r["title"].lower(): r for r in lookup.collect()}
    assert res["vitamin c"]["final_id"] == "P1" and not res["vitamin c"]["is_new"]
    new = res["brand new thing"]
    assert new["is_new"] and new["final_id"].startswith("gen:")
    # deterministic generated IDs: same input -> same ID on rerun
    lookup2 = {r["title"].lower(): r["final_id"] for r in upsert.dim_lookup_or_create(incoming, dim).collect()}
    assert lookup2["brand new thing"] == new["final_id"]
    # insert half: only the genuinely-new row
    assert [r["title"] for r in upsert.new_dim_rows(lookup).collect()] == ["Brand New Thing"]


def test_merge_classify(spark):
    sink = spark.createDataFrame(
        [("Acme",), ("Beta",)], "businessName string"
    )
    staged = spark.createDataFrame(
        [("acme",), ("Gamma",)], "businessName string"
    )
    ops = {r["merge_key"]: r["action"] for r in upsert.merge_classify(staged, sink).collect()}
    assert ops == {"acme": "update", "beta": "sink_only", "gamma": "insert"}


def test_apply_merge_replaces_and_preserves(spark):
    sink = spark.createDataFrame(
        [("Acme", "old@acme.com"), ("Beta", "b@beta.io")],
        "businessName string, contactEmail string",
    )
    staged = spark.createDataFrame(
        [("Acme", "new@acme.com"), ("Gamma", "g@gamma.io")],
        "businessName string, contactEmail string",
    )
    merged = {r["businessName"]: r for r in upsert.apply_merge(staged, sink, ["businessName"]).collect()}
    assert len(merged) == 3
    assert merged["Acme"]["contactEmail"] == "new@acme.com"   # updated
    assert merged["Beta"]["contactEmail"] == "b@beta.io"      # survivor
    assert merged["Gamma"]["contactEmail"] == "g@gamma.io"    # inserted


def test_processed_files_gate(spark):
    ledger = spark.createDataFrame([("a.csv",)], "source_file string")
    incoming = spark.createDataFrame([("a.csv", 1), ("b.csv", 2)], "source_file string, v int")
    fresh = upsert.processed_files_gate(incoming, ledger)
    assert [r["source_file"] for r in fresh.collect()] == ["b.csv"]


def test_scd2_history_collapses_runs(spark):
    from datetime import date

    from pyp_etl_pipeline_spark.operators.scd import scd2_history

    rows = [
        (1, date(2024, 1, 1), "A"),
        (1, date(2024, 1, 5), "A"),   # unchanged -> same run
        (1, date(2024, 2, 1), "B"),
        (1, date(2024, 3, 1), None),  # transition TO null is a real state
        (1, date(2024, 4, 1), "B"),
        (2, date(2024, 1, 2), "X"),
    ]
    df = spark.createDataFrame(rows, "k long, ts date, v string")
    out = sorted(
        ((r["k"], r["v"], r["valid_from"], r["valid_to"], r["is_current"])
         for r in scd2_history(df, "k", "ts", "v").collect()),
        key=lambda t: (t[0], t[2]),
    )
    assert out == [
        (1, "A", date(2024, 1, 1), date(2024, 2, 1), False),
        (1, "B", date(2024, 2, 1), date(2024, 3, 1), False),
        (1, None, date(2024, 3, 1), date(2024, 4, 1), False),
        (1, "B", date(2024, 4, 1), None, True),
        (2, "X", date(2024, 1, 2), None, True),
    ]
