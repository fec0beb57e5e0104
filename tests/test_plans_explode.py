"""Plan-time header mapping (P1/P2/P4), multi-value explode (E1/E2/U1),
offerings derivation (J11), and ingest helpers."""

from __future__ import annotations

from pyp_etl_pipeline_spark.operators.explode import explode_items, split_multi_value
from pyp_etl_pipeline_spark.operators.offerings import derive_offerings
from pyp_etl_pipeline_spark.plans.header_map import apply_header_mapping, map_headers_to_schema
from pyp_etl_pipeline_spark.plans.schema_check import validate_required_columns
from pyspark.sql import functions as F


# ------------------------------------------------------------- P1 header map

def test_header_map_exact_alias():
    # 'business_name' is a listed alias -> exact, confidence 100;
    # 'Business Name' (space) is fuzzy like in the reference (app/etl.py:457)
    hm = map_headers_to_schema(["business_name", "Contact Email", "Weird Column Xyz"])
    assert hm.mapping["business_name"] == ("businessName", 100.0)
    assert hm.mapping["Contact Email"][0] == "contactEmail"
    assert 60.0 <= hm.mapping["Contact Email"][1] < 100.0
    assert "Weird Column Xyz" in hm.unmapped


def test_header_map_fuzzy():
    hm = map_headers_to_schema(["Busines Nam"])  # typo -> fuzzy >= 60
    assert hm.mapping["Busines Nam"][0] == "businessName"
    assert hm.mapping["Busines Nam"][1] < 100.0


def test_header_map_overrides_win():
    hm = map_headers_to_schema(["colA"], overrides={"colA": "businessName"})
    assert hm.mapping["colA"] == ("businessName", 100.0)


def test_header_map_field_assigned_once():
    hm = map_headers_to_schema(["Business Name", "business_name"])
    fields = [f for f, _ in hm.mapping.values()]
    assert fields.count("businessName") == 1


def test_apply_header_mapping_keeps_unmapped(spark):
    df = spark.createDataFrame([("Acme", "x")], ["Business Name", "Mystery"])
    hm = map_headers_to_schema(df.columns)
    out = apply_header_mapping(df, hm)
    assert "businessName" in out.columns
    assert "unmapped_Mystery" in out.columns


def test_validate_required_columns():
    ok = validate_required_columns(
        ["businessName", "contactEmail", "streetAddress1", "city1", "country1", "companyBio"]
    )
    assert ok.is_valid and not ok.missing_required
    bad = validate_required_columns(["businessName"])
    assert not bad.is_valid and "contactEmail" in bad.missing_required


# ------------------------------------------------------------ E1/E2 explode

def test_split_multi_value(spark):
    df = spark.createDataFrame([("a; b,c ;; ,d",)], "v string")
    out = df.select(split_multi_value("v").alias("a")).collect()[0]["a"]
    assert out == ["a", "b", "c", "d"]


def test_explode_items_kinds_and_dedup(spark):
    df = spark.createDataFrame(
        [(1, "Vitamin C; vitamin c, Zinc", "Water", None, "n/a")],
        "member_id long, products string, ingredients string, certifications string, allergens string",
    )
    out = explode_items(df, ["member_id"]).collect()
    got = {(r["kind"], r["item"].lower()) for r in out}
    assert got == {("product", "vitamin c"), ("product", "zinc"), ("ingredient", "water")}
    # sentinel 'n/a' cell and NULL cell produce no rows; dedup is case-insensitive
    assert len(out) == 3


# -------------------------------------------------------------- J11 offerings

def test_derive_offerings_presence(spark):
    df = spark.createDataFrame(
        [("m1", "Vitamin C", None), ("m2", None, None)],
        "member_id string, products string, contractManufacturing string",
    )
    out = {r["member_id"]: r["offerings"] for r in derive_offerings(df).collect()}
    titles_m1 = [o["title"] for o in out["m1"]]
    assert "Manufacturing" in titles_m1  # products non-empty triggers Manufacturing
    assert out["m2"] == []


def test_derive_offerings_title_once(spark):
    # two source fields for the same title -> emitted once (first field wins)
    rules = [("f1", "Spaces", "u1"), ("f2", "Spaces", "u1")]
    df = spark.createDataFrame([("a", "b")], "f1 string, f2 string")
    out = derive_offerings(df, rules=rules, manufacturing_from_products=False).collect()[0]["offerings"]
    assert len(out) == 1 and out[0]["source_field"] == "f1"


def test_derive_offerings_full_rule_table(spark):
    """All 18 reference rules on one full-width row: 13 distinct offering
    titles, multi-source titles (Spaces x4, Packaging x2, Equipment x2)
    emitted once via their first present source field."""
    from pyp_etl_pipeline_spark.schema import OFFERING_RULES

    fields = [f for f, _, _ in OFFERING_RULES]
    df = spark.createDataFrame([tuple("x" for _ in fields)], ", ".join(f"{f} string" for f in fields))
    out = derive_offerings(df).collect()[0]["offerings"]
    titles = [o["title"] for o in out]
    assert len(titles) == len(set(titles)) == 13
    by_title = {o["title"]: o["source_field"] for o in out}
    assert by_title["Spaces"] == "facilityDetails"       # first of 4 sources
    assert by_title["Packaging"] == "deliveredIn"        # first of 2
    assert by_title["Equipment"] == "suppliedEquipment"  # first of 2
    # every emitted uid matches the rule table
    uid_of = {t: u for _, t, u in OFFERING_RULES}
    assert all(o["uid"] == uid_of[o["title"]] for o in out)


def test_resolve_uids_live_wins_fallback_stands(spark):
    from pyp_etl_pipeline_spark.operators.offerings import resolve_uids

    derived = spark.createDataFrame(
        [(1, "Design", "0xfb1"), (2, "Legal", "0xfb2"), (3, "Design", "0xfb1")],
        "member_id long, title string, uid string",
    )
    live = spark.createDataFrame([("Design", "0xlive")], "title string, offering_id string")
    out = {(r["member_id"], r["title"]): r["uid"] for r in resolve_uids(derived, live).collect()}
    # live title re-keyed, un-listed title keeps its production fallback
    assert out[(1, "Design")] == "0xlive" and out[(3, "Design")] == "0xlive"
    assert out[(2, "Legal")] == "0xfb2"


def test_resolve_uids_none_dim_is_identity(spark):
    from pyp_etl_pipeline_spark.operators.offerings import resolve_uids

    derived = spark.createDataFrame([(1, "Design", "0xfb1")], "member_id long, title string, uid string")
    assert resolve_uids(derived, None) is derived
