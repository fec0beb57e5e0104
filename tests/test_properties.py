"""Property-based tests (hypothesis): normalization idempotence and
band-partition totality, per SURVEY.md §5(d)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pyp_etl_pipeline_spark.functions import nulls, scoring, text

# Latin ranges only: JVM upper/lower on exotic scripts (e.g. Greek U+1F80)
# or one-to-many case mappings (ß -> SS, ŉ, ǰ) expand one char into two,
# which is out of domain for the reference's business/product-name
# normalization.
TEXTISH = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd", "Zs"),
        whitelist_characters="-.,;()",
        max_codepoint=0x02FF,
        blacklist_characters="ßŉǰ",
    ),
    min_size=0,
    max_size=40,
)


def run_fn(spark, values, fn):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return [r[0] for r in df.select(fn(F.col("v")).alias("o")).collect()]


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(TEXTISH, min_size=1, max_size=8))
def test_normalize_offering_idempotent(spark, vals):
    once = run_fn(spark, vals, text.normalize_offering_text)
    twice = run_fn(spark, once, text.normalize_offering_text)
    assert once == twice


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(TEXTISH, min_size=1, max_size=8))
def test_null_normalize_idempotent(spark, vals):
    once = run_fn(spark, vals, nulls.null_normalize)
    twice = run_fn(spark, [v if v is not None else None for v in once], nulls.null_normalize)
    assert once == twice


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.floats(min_value=-10.0, max_value=110.0, allow_nan=False), min_size=1, max_size=16))
def test_band_totality(spark, scores):
    df = spark.createDataFrame([(s,) for s in scores], "s double")
    out = [r[0] for r in df.select(scoring.band("s").alias("b")).collect()]
    assert all(b in ("auto_resolve", "review", "reject") for b in out)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    n_tokens=st.integers(min_value=0, max_value=200),
    chunk=st.integers(min_value=2, max_value=40),
    overlap_frac=st.floats(min_value=0.0, max_value=0.9),
)
def test_chunk_documents_reconstructs_token_stream(spark, n_tokens, chunk, overlap_frac):
    """Dropping the first `overlap` tokens of every chunk after the first
    and concatenating reconstructs the original token stream exactly."""
    from pyp_etl_pipeline_spark.operators.packing import chunk_documents

    overlap = min(int(chunk * overlap_frac), chunk - 1)
    words = [f"t{i}" for i in range(n_tokens)]
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    rows = sorted(
        chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect(),
        key=lambda r: r["chunk_idx"],
    )
    if not words:
        assert rows == []
        return
    rebuilt = []
    for r in rows:
        toks = r["chunk_text"].split()
        assert len(toks) == r["n_tokens"] <= chunk
        rebuilt.extend(toks if r["chunk_idx"] == 0 else toks[overlap:])
    assert rebuilt == words
