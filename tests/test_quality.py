"""Data-quality expectations + snapshot diff (operators/quality)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyp_etl_pipeline_spark.operators import quality


def test_expectation_report_rules(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, None, 50.0), (3, "c", -3.0), (3, "d", 2.0)],
        "id long, name string, val double",
    )
    rep = {r["rule"]: r for r in quality.expectation_report(
        df,
        not_null={"name": 0.3, "id": 0.0},
        unique=("id",),
        ranges={"val": (0.0, 10.0)},
    ).collect()}
    assert rep["not_null:name"]["ok"] and rep["not_null:name"]["metric"] == 0.25
    assert rep["not_null:id"]["ok"]
    # id=3 duplicated -> unique fails with duplicate fraction 1/4
    assert not rep["unique:id"]["ok"] and rep["unique:id"]["metric"] == 0.25
    # 50.0 and -3.0 out of range -> in-range fraction 0.5, fails
    assert not rep["range:val"]["ok"] and rep["range:val"]["metric"] == 0.5


def test_referential_report_orphans(spark):
    child = spark.createDataFrame([(1,), (2,), (9,)], "fk long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    r = quality.referential_report(child, parent, "fk", "pk").collect()[0]
    assert not r["ok"] and abs(r["metric"] - 2 / 3) < 1e-12


def test_diff_snapshots_all_change_kinds(spark):
    old = spark.createDataFrame(
        [(1, "A", 10.0), (2, "B", 20.0), (3, "C", 30.0), (4, None, 40.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(2, "B", 20.0), (3, "C", 31.0), (4, "D", 40.0), (5, "E", 50.0)],
        "k long, s string, v double",
    )
    out = {r["k"]: r for r in quality.diff_snapshots(old, new, ("k",)).collect()}
    # 1 deleted, 5 inserted, 3 value-updated, 4 null->value updated, 2 unchanged (absent)
    assert set(out) == {1, 3, 4, 5}
    assert out[1]["change"] == "delete" and out[5]["change"] == "insert"
    assert out[3]["change"] == "update" and out[3]["old_v"] == 30.0 and out[3]["new_v"] == 31.0
    assert out[4]["change"] == "update" and out[4]["old_s"] is None and out[4]["new_s"] == "D"


def test_expectation_report_nulls_not_duplicates_and_empty_table(spark):
    """SQL-UNIQUE semantics: nulls are not duplicates — a distinct column
    plus nulls passes uniqueness. An empty table passes every rule with
    defined (non-NULL) metrics and booleans."""
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None)], "id long, name string"
    )
    rep = {r["rule"]: r for r in quality.expectation_report(
        df, unique=("id", "name")
    ).collect()}
    assert rep["unique:id"]["ok"] and rep["unique:id"]["metric"] == 0.0
    # 'a' distinct, two nulls ignored
    assert rep["unique:name"]["ok"] and rep["unique:name"]["metric"] == 0.0

    empty = df.filter(F.lit(False))
    rep0 = quality.expectation_report(
        empty,
        not_null={"name": 0.0},
        unique=("id",),
        ranges={"id": (0.0, 10.0)},
    ).collect()
    assert len(rep0) == 3
    for r in rep0:
        assert r["ok"] is True, r
        assert r["metric"] is not None


def test_linkage_eval_metrics(spark):
    from pyp_etl_pipeline_spark.operators.quality import linkage_eval

    pred = spark.createDataFrame([(1, 2), (1, 3), (4, 5), (4, 5)], "id_a long, id_b long")
    truth = spark.createDataFrame([(1, 2), (4, 5), (6, 7)], "id_a long, id_b long")
    r = linkage_eval(pred, truth).collect()[0]
    # pred distinct = {12,13,45}, truth = {12,45,67}: tp=2 fp=1 fn=1
    assert (r["n_pred"], r["n_truth"], r["tp"], r["fp"], r["fn"]) == (3, 3, 2, 1, 1)
    assert r["precision_micro"] == 666666 and r["recall_micro"] == 666666
    assert r["f1_micro"] == 666666


def test_linkage_eval_empty_pred(spark):
    from pyp_etl_pipeline_spark.operators.quality import linkage_eval

    pred = spark.createDataFrame([], "id_a long, id_b long")
    truth = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    r = linkage_eval(pred, truth).collect()[0]
    assert r["n_pred"] == 0 and r["tp"] == 0 and r["fp"] == 0 and r["fn"] == 1
    assert r["precision_micro"] is None and r["f1_micro"] is None


def test_profile_table_one_pass(spark):
    from pyp_etl_pipeline_spark.operators.quality import profile_table

    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 1.5), (3, "b", -2.0), (4, None, 1.5)],
        "k long, s string, v double",
    )
    out = {r["column"]: r for r in profile_table(df, ("k", "s", "v")).collect()}
    assert out["k"]["n_rows"] == 4 and out["k"]["n_null"] == 0 and out["k"]["n_distinct"] == 4
    assert out["s"]["n_null"] == 1 and out["s"]["n_distinct"] == 2
    assert out["s"]["min_str"] == "a" and out["s"]["max_str"] == "b"
    assert out["v"]["n_null"] == 1 and out["v"]["n_distinct"] == 2
    assert out["v"]["min_str"] == "-2.0" and out["v"]["max_str"] == "1.5"
    # ONE job: the profile is a single aggregate + stack, not a per-column scan
    plan = profile_table(df, ("k", "s", "v"))._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") <= 1
