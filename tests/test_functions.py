"""Golden tests for the scalar function library (F1-F4, T1-T8).

Expected values are hand-derived from the reference semantics
(app/etl.py:141-158 sentinel nulls, :757-765 sanitize, :789-834 variants,
:841-883 Capital-Case, :885-902 validators) — not from running the
reference code.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pyp_etl_pipeline_spark.functions import nulls, text, validation
from tests.conftest import rows


def one_col(spark, values, fn, dtype="string"):
    df = spark.createDataFrame([(v,) for v in values], f"v {dtype}")
    return [r[0] for r in df.select(fn(F.col("v")).alias("out")).collect()]


# ------------------------------------------------------------------ F1 nulls

def test_sentinel_null_normalize(spark):
    vals = ["  hi  ", "null", "N/A", "NaN", "", "  ", None, "ok", "none", "na"]
    out = one_col(spark, vals, nulls.null_normalize)
    assert out == ["hi", None, None, None, None, None, None, "ok", None, None]


def test_is_valid_value(spark):
    vals = ["x", "NULL", " n/a ", "0", None]
    out = one_col(spark, vals, nulls.is_valid_value)
    assert out == [True, False, False, True, False]


# ------------------------------------------------------------- T1/T2 text

def test_sanitize_string_strips_tags_and_escapes(spark):
    vals = ["  <b>Acme</b> & Co  ", 'say "hi" <i>now</i>', "plain"]
    out = one_col(spark, vals, text.sanitize_string)
    assert out == ["Acme &amp; Co", "say &quot;hi&quot; now", "plain"]


def test_collapse_whitespace(spark):
    out = one_col(spark, ["a   b\t\tc", " x  y "], text.collapse_whitespace)
    assert out == ["a b c", " x y "]


# ---------------------------------------------------------------- T3 variants

def test_variant_normalize_domain_rewrites(spark):
    vals = ["vit c", "omega 3 oil", "gelatine", "Vitamin D"]
    out = one_col(spark, vals, text.variant_normalize)
    assert out[0].lower().startswith("vitamin c")
    assert "omega-3" in out[1].lower()
    assert "gelatin" in out[2].lower() and "gelatine" not in out[2].lower()


# -------------------------------------------------------------- T4 punct

def test_strip_punctuation_preserves_hyphen_dot_parens_digits(spark):
    out = one_col(spark, ["omega-3, fish oil (500 mg)!?"], text.strip_punctuation)
    assert out == ["omega-3 fish oil (500 mg)"]


# ------------------------------------------------------------ T5 CapitalCase

def test_capital_case_stopwords_and_segments(spark):
    vals = ["oil of oregano", "alpha-lipoic acid", "st. johns wort", "the best thing"]
    out = one_col(spark, vals, text.capital_case)
    assert out[0] == "Oil of Oregano"          # stopword lowercased mid-phrase
    assert out[1] == "Alpha-Lipoic Acid"       # hyphen segments capitalized
    assert out[2] == "St. Johns Wort"          # dot segments capitalized
    assert out[3].startswith("The ")           # stopword capitalized when first


def test_capital_case_idempotent(spark):
    vals = ["oil of oregano", "alpha-lipoic acid", "vitamin b-12"]
    once = one_col(spark, vals, text.capital_case)
    twice = one_col(spark, once, text.capital_case)
    assert once == twice


# ------------------------------------------------------------ F3/F4 validate

def test_valid_business_name(spark):
    vals = ["Acme Corp", "A", "x" * 201, 'Bad<script>', "O'Brien Ltd", "  ok  "]
    out = one_col(spark, vals, validation.valid_business_name)
    assert out == [True, False, False, False, False, True]


def test_valid_email_optional(spark):
    vals = ["a@b.co", "bad@", "no-at.com", None, "x@y.io"]
    out = one_col(spark, vals, validation.valid_email)
    assert out == [True, False, False, True, True]


def test_extract_html_text(spark):
    from pyp_etl_pipeline_spark.functions import text as T
    from pyspark.sql import functions as F

    rows = [
        (1, "<p>hello   <b>world</b></p>"),
        (2, "x &amp;lt; y"),          # &amp;lt; -> literal "&lt;", NOT "<"
        (3, "a &lt;tag&gt; &quot;q&quot; &#39;s&#39; &amp; done"),
        (4, "<a href='u'>link</a>text<br/>"),
    ]
    df = spark.createDataFrame(rows, "id long, h string")
    got = {r["id"]: r["out"] for r in df.select("id", T.extract_html_text("h").alias("out")).collect()}
    assert got[1] == "hello world"
    assert got[2] == "x &lt; y"
    assert got[3] == "a <tag> \"q\" 's' & done"
    assert got[4] == "linktext"
