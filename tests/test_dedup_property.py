"""Property test: exact_substring_spans equals the brute-force per-doc
definition (every gram position whose substring occurs in another doc,
intervals merged) on random small-alphabet corpora."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyp_etl_pipeline_spark.operators.dedup import exact_substring_spans

GRAM = 4
# tiny alphabet so cross-doc duplicated substrings actually occur
DOC = st.text(alphabet="ab ", min_size=0, max_size=30)


def brute_force(rows: list[tuple[int, str]], gram: int) -> dict[int, tuple[int, int, int]]:
    texts = dict(rows)
    out = {}
    for doc_id, txt in rows:
        if len(txt) < gram:
            continue
        hits = []
        for p in range(len(txt) - gram + 1):
            g = txt[p : p + gram]
            if any(
                g in other
                for oid, other in texts.items()
                if oid != doc_id and len(other) >= gram
            ):
                hits.append(p)
        if not hits:
            continue
        covered = 0
        spans = 0
        prev = None
        for p in hits:
            if prev is None or p - prev > gram:
                spans += 1
            if prev is not None:
                covered += min(p - prev, gram)
            prev = p
        covered += gram
        out[doc_id] = (len(hits), covered, spans)
    return out


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(DOC, min_size=2, max_size=5))
def test_exact_substring_spans_matches_brute_force(spark, docs):
    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_dup_grams"], r["dup_chars"], r["n_spans"])
        for r in exact_substring_spans(df, gram=GRAM).collect()
    }
    assert got == brute_force(rows, GRAM)
