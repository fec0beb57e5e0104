"""Unit tests for the round-8 ext4 batch: int8 quantization, label
centroid cosine, feature hashing, padding efficiency, vocab coverage."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyp_etl_pipeline_spark.operators import embedding_ops, packing, textan


def _edf(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_int8_quantize_exactness(spark):
    df = _edf(
        spark,
        [
            (1, [1.0, -1.0, 0.5], 0),
            (2, [0.0, 0.0, 0.0], 0),  # all-zero: guarded division
            (3, None, 0),  # dropped
        ],
    )
    out = {r["vec_id"]: r for r in embedding_ops.int8_quantize_stats(df).collect()}
    assert set(out) == {1, 2}
    r1 = out[1]
    # max_abs = 1.0; q = [127, -127, 63] (floor(0.5*127)=63)
    assert r1["max_abs_micro"] == 1_000_000
    assert r1["q_l1"] == 127 + 127 + 63
    # err terms: 0, 0, floor(|0.5 - 63/127| * 1e6) = floor(0.003937... * 1e6)
    assert r1["recon_err_micro"] == int((0.5 - 63.0 / 127.0) * 1e6)
    r2 = out[2]
    assert r2["q_l1"] == 0 and r2["recon_err_micro"] == 0 and r2["max_abs_micro"] == 0


def test_label_centroid_cosine_identical_and_orthogonal(spark):
    df = _edf(
        spark,
        [
            (1, [1.0, 0.0], 0),
            (2, [1.0, 0.0], 0),
            (3, [1.0, 0.0], 1),  # same direction as label 0
            (4, [0.0, 1.0], 2),  # orthogonal to labels 0/1
        ],
    )
    out = {(r["label_a"], r["label_b"]): r for r in embedding_ops.label_centroid_cosine(df).collect()}
    assert out[(0, 1)]["cos_micro"] == 1_000_000
    assert out[(0, 2)]["cos_micro"] == 0
    assert out[(1, 2)]["cos_micro"] == 0
    assert out[(0, 1)]["n_a"] == 2 and out[(0, 1)]["n_b"] == 1


def test_padding_efficiency_integer_economics(spark):
    # 3 docs: 10, 40, 64 tokens -> buckets 32, 64, 64; global max 64
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in [(1, 10), (2, 40), (3, 64)]],
        "doc_id long, text string",
    )
    rows = {r["bucket_len"]: r for r in packing.padding_efficiency(docs).collect()}
    assert rows[32]["waste_bucketed"] == 22 and rows[32]["waste_global"] == 54
    assert rows[64]["n_docs"] == 2
    assert rows[64]["waste_bucketed"] == (64 - 40) + (64 - 64)
    assert rows[64]["waste_global"] == rows[64]["waste_bucketed"]  # bucket IS the max
    assert rows[64]["savings_micro"] == 0
    assert rows[32]["savings_micro"] == (54 - 22) * 1_000_000 // 54


def test_feature_hash_counts_conserves_tokens(spark):
    docs = spark.createDataFrame(
        [(1, "a b c a"), (2, "B c d"), (3, None)], "doc_id long, text string"
    )
    out = textan.feature_hash_counts(docs, n_buckets=8, top_k=8).collect()
    assert sum(r["n_tokens"] for r in out) == 7  # null doc dropped, B lowercased
    assert sum(r["n_distinct_tokens"] for r in out) >= 4  # a b c d (collisions may merge)
    assert all(0 <= r["bucket"] < 8 for r in out)
    # sorted by count desc then bucket asc
    counts = [r["n_tokens"] for r in out]
    assert counts == sorted(counts, reverse=True)


def test_vocab_coverage_curve_monotone_and_complete(spark):
    docs = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "a d")], "doc_id long, text string"
    )
    out = {r["k"]: r for r in textan.vocab_coverage_curve(docs, ks=(1, 2, 500)).collect()}
    assert out[1]["covered_tokens"] == 4  # 'a' x4
    assert out[2]["covered_tokens"] == 6  # + 'b' x2
    assert out[500]["covered_tokens"] == out[500]["total_tokens"] == 8
    assert out[500]["coverage_micro"] == 1_000_000
    assert out[1]["vocab_size"] == 4
    assert out[1]["coverage_micro"] <= out[2]["coverage_micro"] <= out[500]["coverage_micro"]


def test_boolean_retrieval_equals_maponly_conjunction(spark, sf_dir):
    """Posting-list intersection must equal the map-only array_contains
    conjunction — the soundness property of br01's distributed shape."""
    from pyp_etl_pipeline_spark.driver_queries_ext4 import _BR01_TERMS, br01_boolean_retrieval
    from pyp_etl_pipeline_spark.tables import load_table

    got = {r["doc_id"] for r in br01_boolean_retrieval(spark, sf_dir).collect()}
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = textan.whitespace_tokens(F.lower(F.col("text")))
    cond = None
    for t in _BR01_TERMS:
        c = F.array_contains(toks, t)
        cond = c if cond is None else (cond & c)
    want = {r["doc_id"] for r in d.filter(cond).select("doc_id").collect()}
    assert got == want and len(got) > 0


def test_corpus_datacard_invariants(spark, sf_dir):
    from pyp_etl_pipeline_spark.driver_queries_ext4 import rp01_corpus_datacard
    from pyp_etl_pipeline_spark.tables import load_table

    rows = rp01_corpus_datacard(spark, sf_dir).collect()
    n_total = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_total
    for r in rows:
        assert 0 <= r["n_en"] <= r["n_docs"]
        assert 0 <= r["n_exact_dup"] <= r["n_docs"]
        assert 0 <= r["en_share_micro"] <= 1_000_000
        assert r["mean_doc_tokens_micro"] * r["n_docs"] <= r["total_tokens"] * 1_000_000


def test_group_safe_split_no_leakage_and_partition(spark, sf_dir):
    from pyp_etl_pipeline_spark.driver_queries_ext4 import sp03_group_safe_split
    from pyp_etl_pipeline_spark.tables import load_table

    rows = {r["split"]: r for r in sp03_group_safe_split(spark, sf_dir).collect()}
    assert set(rows) == {"train", "test"}
    n_docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull()).count()
    assert rows["train"]["n_docs"] + rows["test"]["n_docs"] == n_docs
    assert rows["train"]["n_leaked_fingerprints"] == 0
    assert rows["train"]["n_docs"] > rows["test"]["n_docs"]  # ~90/10


def test_class_weight_plan_balanced_inverse_frequency(spark, sf_dir):
    from pyp_etl_pipeline_spark.driver_queries_ext4 import im01_class_weight_plan

    rows = im01_class_weight_plan(spark, sf_dir).collect()
    n_total = sum(r["n_vecs"] for r in rows)
    k = len(rows)
    for r in rows:
        # exact sklearn-'balanced' convention in integer micro
        assert r["weight_micro"] == n_total * 1_000_000 // (k * r["n_vecs"])
        assert r["share_micro"] == r["n_vecs"] * 1_000_000 // n_total
    # heavier classes get strictly smaller weights
    by_n = sorted(rows, key=lambda r: r["n_vecs"])
    ws = [r["weight_micro"] for r in by_n]
    assert ws == sorted(ws, reverse=True)


def test_psi_drift_properties(spark, sf_dir):
    """PSI terms are >= 0 by construction, identical halves give ~0, and
    totals partition the filtered stream."""
    from pyp_etl_pipeline_spark.driver_queries_ext4 import dr01_psi_drift
    from pyp_etl_pipeline_spark.tables import load_table

    rows = dr01_psi_drift(spark, sf_dir).collect()
    assert len(rows) > 0
    n_all = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isNotNull() & F.col("value").isNotNull() & F.col("ts").isNotNull())
        .count()
    )
    assert sum(r["n_ref"] + r["n_cur"] for r in rows) == n_all
    for r in rows:
        assert r["psi_micro"] >= 0
        # sanity ceiling: PSI of half-vs-half of one synthetic stream
        # stays far below a full distribution swap (~ln-scale blowup)
        assert r["psi_micro"] < 2_000_000


def test_l_diversity_bounds(spark, sf_dir):
    from pyp_etl_pipeline_spark.driver_queries_ext4 import ka02_l_diversity

    rows = ka02_l_diversity(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert 1 <= r["l_distinct"] <= 5  # five fixed bands
        assert r["l_distinct"] <= r["n"]
        assert r["l_ok"] == (r["l_distinct"] >= 3)


def test_semi_join_never_multiplies(spark, sf_dir):
    """q09's semi join must count each order once no matter how many
    returned lineitems it has."""
    from pyp_etl_pipeline_spark.driver_queries_ext4 import q09_priority_with_returns
    from pyp_etl_pipeline_spark.tables import load_table

    total = sum(r["order_count"] for r in q09_priority_with_returns(spark, sf_dir).collect())
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    n_quarter = o.count()
    assert 0 < total <= n_quarter


def test_changefeed_last_op_wins(spark):
    from pyp_etl_pipeline_spark.driver_queries_ext4 import cd02_apply_changefeed
    import tempfile, os
    from datetime import datetime

    rows = [
        (1, datetime(2024, 1, 1, 0, 0, 0), 100, "signup", 1.0, "{}"),
        (2, datetime(2024, 1, 2, 0, 0, 0), 100, "purchase", 25.5, "{}"),
        (3, datetime(2024, 1, 3, 0, 0, 0), 100, "error", None, "{}"),
        (4, datetime(2024, 1, 1, 0, 0, 0), 200, "signup", 2.0, "{}"),
        (5, datetime(2024, 1, 1, 0, 0, 0), 200, "view", 3.0, "{}"),  # same ts: event_id wins
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        out = {r["user_id"]: r for r in cd02_apply_changefeed(df.sparkSession, d).collect()}
    assert out[100]["last_op"] == "error" and out[100]["is_deleted"]
    assert out[100]["n_changes"] == 3
    assert out[200]["last_op"] == "view" and not out[200]["is_deleted"]
    assert out[200]["value_micro"] == 3_000_000


def test_dupes_injection_builder(tmp_path):
    """--dupes appends exact copies: every duplicated row appears at
    least twice, non-DUP tables pass through byte-identical."""
    import duckdb
    import importlib.util, os
    spec = importlib.util.spec_from_file_location(
        "check_nulls", os.path.join(os.path.dirname(__file__), "..", "tools", "check_nulls.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    src = "/root/testdata/sf0.001"
    dst = str(tmp_path / "dupes")
    mod.build_nulled_dir(src, dst, mode="dupes")
    con = duckdb.connect()
    n0 = con.execute(f"SELECT count(*) FROM '{src}/documents.parquet'").fetchone()[0]
    n1 = con.execute(f"SELECT count(*) FROM '{dst}/documents.parquet'").fetchone()[0]
    assert n1 > n0  # duplicates appended
    # every row still present; added rows are exact copies
    extra = con.execute(
        f"SELECT count(*) FROM (SELECT * FROM '{dst}/documents.parquet' "
        f"EXCEPT SELECT * FROM '{src}/documents.parquet')"
    ).fetchone()[0]
    assert extra == 0
    n_region0 = con.execute(f"SELECT count(*) FROM '{src}/region.parquet'").fetchone()[0]
    n_region1 = con.execute(f"SELECT count(*) FROM '{dst}/region.parquet'").fetchone()[0]
    assert n_region0 == n_region1  # dim tables untouched


def test_streaming_psi_equals_batch(spark, sf_dir):
    """st11's streamed counts must reproduce dr01's batch scan exactly."""
    from pyp_etl_pipeline_spark.driver_queries_ext4 import dr01_psi_drift, st11_streaming_psi_drift

    batch = {r["event_type"]: tuple(r) for r in dr01_psi_drift(spark, sf_dir).collect()}
    stream = {r["event_type"]: tuple(r) for r in st11_streaming_psi_drift(spark, sf_dir).collect()}
    assert batch == stream and len(batch) > 0


def test_zipf_fit_is_negative_slope(spark, sf_dir):
    from pyp_etl_pipeline_spark.driver_queries_ext4 import tx18_zipf_fit

    r = tx18_zipf_fit(spark, sf_dir).collect()[0]
    assert r["n_points"] > 10
    assert r["zipf_slope_micro"] < 0  # frequency decreases with rank
    assert 0 <= r["r2_micro"] <= 1_000_000


def test_q10_topk_bounded_and_ordered(spark, sf_dir):
    from pyp_etl_pipeline_spark.driver_queries_ext4 import q10_returned_revenue_topk

    rows = q10_returned_revenue_topk(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    revs = [r["revenue_micro"] for r in rows]
    assert revs == sorted(revs, reverse=True)
    assert all(r["n_items"] >= 1 for r in rows)


def test_int8_topk_recall_vs_exact(spark, sf_dir):
    """ann08's quantized ranking must recover most of the exact float
    top-5 — the int8 retrieval quality contract."""
    from pyp_etl_pipeline_spark.driver_queries_ext import ann01_cosine_topk
    from pyp_etl_pipeline_spark.driver_queries_ext4 import ann08_int8_topk

    exact = {}
    for r in ann01_cosine_topk(spark, sf_dir).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    quant = {}
    for r in ann08_int8_topk(spark, sf_dir).collect():
        quant.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert set(quant) == set(exact)
    hits = sum(len(exact[q] & quant[q]) for q in exact)
    total = sum(len(v) for v in exact.values())
    # int8 with per-vector scales: expect high (not perfect) agreement.
    # NOTE: ann01 ranks by COSINE (normalized) while ann08 ranks by
    # dequantized DOT — on this corpus norms are similar so overlap is
    # high, but the floor is deliberately loose.
    assert hits / total >= 0.5, f"recall {hits}/{total}"


def test_containment_catches_subset_jaccard_misses(spark):
    """A short doc quoted inside a long one: containment ~1.0 from the
    short side even though Jaccard is small."""
    from pyp_etl_pipeline_spark.driver_queries_ext4 import dd09_containment_pairs
    import tempfile, os

    short = "alpha beta gamma delta epsilon zeta"
    long = short + " " + " ".join(f"word{i}" for i in range(60))
    df = spark.createDataFrame(
        [(1, short, "en", "src0", len(short)), (2, long, "en", "src0", len(long))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        rows = {(r["src_id"], r["ref_id"]): r for r in dd09_containment_pairs(df.sparkSession, d).collect()}
    assert (1, 2) in rows  # short contained in long
    assert rows[(1, 2)]["containment_micro"] >= 900_000
    assert (2, 1) not in rows  # asymmetric: long not contained in short


def test_ab_readout_exact_counts(spark, sf_dir):
    from pyp_etl_pipeline_spark.driver_queries_ext4 import ab01_ab_test_readout
    from pyp_etl_pipeline_spark.tables import load_table

    r = ab01_ab_test_readout(spark, sf_dir).collect()[0]
    e = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    n_users = e.select("user_id").distinct().count()
    assert r["n_c"] + r["n_t"] == n_users
    assert 0 <= r["x_c"] <= r["n_c"] and 0 <= r["x_t"] <= r["n_t"]
    # lift is the exact micro-floored difference of the two proportions
    lift = r["x_t"] / r["n_t"] - r["x_c"] / r["n_c"]
    import math
    assert r["lift_micro"] == math.floor(lift * 1e6)
    all_or_none = (r["x_c"] + r["x_t"]) in (0, n_users)
    if all_or_none:
        assert r["z2_milli"] is None  # zero pooled variance is guarded
    else:
        assert r["z2_milli"] >= 0


def test_label_centroid_cosine_large_group_no_overflow(spark):
    # ADVICE r8: the old DIV-1000 downshift overflowed sum(s*s) once a
    # label held ~1e5-1e7 rows. The mean-based rescale (sum DIV n) makes
    # the accumulator bound independent of group size: 4200 rows/label
    # of magnitude-500 elements overflowed the old formula
    # (dim * (n*5e5)^2 > 2^63) and must now yield exact cosine 1e6/-1e6.
    rows = [(i, [500.0, -500.0], 0) for i in range(4200)]
    rows += [(10_000 + i, [-500.0, 500.0], 1) for i in range(4200)]
    df = _edf(spark, rows)
    out = {
        (r["label_a"], r["label_b"]): r
        for r in embedding_ops.label_centroid_cosine(df).collect()
    }
    assert out[(0, 1)]["cos_micro"] == -1_000_000
    assert out[(0, 1)]["n_a"] == 4200 and out[(0, 1)]["n_b"] == 4200
