"""Deduplication operator tests: exact, n-gram Jaccard, MinHash-LSH,
SimHash — tiny corpora with hand-checkable expected pairs."""

from __future__ import annotations

import pytest

from pyp_etl_pipeline_spark.operators import dedup

CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),     # exact dup of 1
    (3, "The  Quick   Brown Fox jumps over the lazy dog"),  # whitespace/case dup of 1
    (4, "the quick brown fox jumps over a lazy cat"),       # near dup
    (5, "completely unrelated text about spark engines"),
    (6, "spark engines are completely unrelated text about"),  # same tokens, reordered
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_exact_duplicates_normalized(docs):
    clusters = dedup.exact_duplicates(docs).collect()
    assert len(clusters) == 1
    assert clusters[0]["dup_count"] == 3 and clusters[0]["keep_id"] == 1


def test_dedup_exact_keeps_lowest_id(docs):
    kept = sorted(r["doc_id"] for r in dedup.dedup_exact(docs).collect())
    assert kept == [1, 4, 5, 6]


def test_shingle_jaccard_pairs(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.shingle_pairs_jaccard(docs, threshold=0.2).collect()
    }
    assert pairs[(1, 2)] == 1.0 and pairs[(1, 3)] == 1.0 and pairs[(2, 3)] == 1.0
    assert (1, 4) in pairs and pairs[(1, 4)] < 1.0
    # rotation preserves some 3-grams: (5,6) share 2 of 7 distinct shingles
    assert pairs[(5, 6)] == round(2 / 7, 6)
    # fox-docs never pair with the spark-docs (no shared shingle)
    assert all(not (a <= 4 < b) for a, b in pairs)


def test_minhash_lsh_finds_exact_and_near_dups(docs):
    pairs = {(r["id_a"], r["id_b"]) for r in dedup.minhash_lsh_pairs(docs, threshold=0.2).collect()}
    assert {(1, 2), (1, 3), (2, 3)} <= pairs
    # LSH is a candidate filter + exact verify: no false positives above threshold
    assert all(a in (1, 2, 3, 4) and b in (1, 2, 3, 4) or (a, b) == (5, 6) for a, b in pairs)


def test_simhash_identical_fingerprints(spark, docs):
    fps = {r["id"]: r["simhash"] for r in dedup.simhash_fingerprints(docs).collect()}
    assert fps[1] == fps[2] == fps[3]   # identical normalized text
    # token-order-insensitive: same multiset of tokens -> same fingerprint
    reordered = spark.createDataFrame(
        [(7, "dog lazy the over jumps fox brown quick the")], "doc_id long, text string"
    )
    fp7 = dedup.simhash_fingerprints(reordered).collect()[0]["simhash"]
    assert fp7 == fps[1]
    # near-identical token sets -> small hamming distance
    assert bin(fps[5] ^ fps[6]).count("1") <= 16


def test_simhash_pairs_hamming(docs):
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in dedup.simhash_pairs(docs, max_hamming=6).collect()}
    assert pairs[(1, 2)] == 0 and pairs[(1, 3)] == 0
    assert all((a, b) not in pairs for a in (1, 2, 3, 4) for b in (5, 6))


def test_prefix_filter_variant_identical(docs):
    base = sorted(tuple(r) for r in dedup.shingle_pairs_jaccard(docs, threshold=0.2).collect())
    pref = sorted(
        tuple(r) for r in dedup.shingle_pairs_jaccard(docs, threshold=0.2, prefix_filter=True).collect()
    )
    assert base == pref


def test_strategy_auto_select(spark, docs, monkeypatch):
    """prefix_filter=None picks the strategy from the plan-time size
    statistic: a small PARQUET input (known stats) stays on the count
    path, shrinking the threshold to zero flips the same call to the
    prefix path, and a memory-table input (stats unknown = MaxValue)
    now resolves via a bounded row probe (VERDICT r11 item 5): a small
    memory table lands on the count path instead of silently paying the
    4x-slower prefix path, while a probe-capped relation still takes
    the scale-safe prefix path. Results are identical either way
    (test_prefix_filter_variant_identical)."""
    def plan_of(df):
        return df._jdf.queryExecution().optimizedPlan().toString()

    pq = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    small = dedup.shingle_pairs_jaccard(pq, threshold=0.2)  # auto
    assert "array_intersect" not in plan_of(small)  # count path chosen
    assert not dedup._prefix_auto(pq)

    monkeypatch.setattr(dedup, "PREFIX_AUTO_BYTES", 0)
    flipped = dedup.shingle_pairs_jaccard(pq, threshold=0.2)  # auto
    assert "array_intersect" in plan_of(flipped)  # prefix verify stage
    monkeypatch.undo()

    # memory-table (LogicalRDD) stats are unknown = MaxValue; the row
    # probe proves `docs` small -> count path (the r11 footgun fixed)
    assert not dedup._prefix_auto(docs)
    assert "array_intersect" not in plan_of(dedup.shingle_pairs_jaccard(docs, threshold=0.2))

    # a memory table AT the probe cap is not provably small -> prefix
    monkeypatch.setattr(dedup, "_PROBE_ROWS", 3)
    assert dedup._prefix_auto(docs)
    assert "array_intersect" in plan_of(dedup.shingle_pairs_jaccard(docs, threshold=0.2))
    monkeypatch.undo()


def test_incremental_minhash_matches_full_recompute(spark):
    """Batch-vs-index pairs must equal the full-corpus recompute
    restricted to pairs touching the batch — running incrementally loses
    nothing. Also exercises the pre-built corpus_signatures path."""
    from pyspark.sql import functions as F

    texts = [
        "the quick brown fox jumps over the lazy dog tonight",
        "the quick brown fox jumps over the lazy dog tonight again",
        "completely different text about spark physical plans",
        "completely different text about spark physical plans here",
        "unrelated third topic entirely on its own",
    ]
    rows = [(i, t) for i, t in enumerate(texts * 3)]  # duplicates across ids
    rows = [(i, texts[i % len(texts)]) for i in range(15)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    new = df.filter(F.col("doc_id") % 3 == 0)
    old = df.filter(F.col("doc_id") % 3 != 0)

    inc = dedup.minhash_lsh_pairs_incremental(new, old, threshold=0.5)
    got = {(r["id_a"], r["id_b"], r["source"]) for r in inc.collect()}

    full = dedup.minhash_lsh_pairs(df, threshold=0.5).collect()
    new_ids = {r["doc_id"] for r in new.collect()}
    want = set()
    for r in full:
        a, b = r["id_a"], r["id_b"]
        if a in new_ids and b in new_ids:
            want.add((a, b, "batch"))
        elif a in new_ids:
            want.add((a, b, "corpus"))
        elif b in new_ids:
            want.add((b, a, "corpus"))  # batch doc always reported as id_a
    assert got == want
    assert any(s == "corpus" for _, _, s in got) and any(s == "batch" for _, _, s in got)

    # supplying a persisted signature index skips corpus re-signing and
    # must give the identical result
    idx = dedup.minhash_signatures(old)
    inc2 = dedup.minhash_lsh_pairs_incremental(new, old, threshold=0.5, corpus_signatures=idx)
    assert {(r["id_a"], r["id_b"], r["source"]) for r in inc2.collect()} == got


def test_minhash_index_join_shuffles_batch_only(spark):
    """The persisted (band, sig)-bucketed signature index joins against a
    new batch's signatures with NO exchange on the index side — the
    write-once-shuffle layout that makes per-ingest incremental dedup
    O(batch). Results must match the unpersisted-signatures path."""
    from pyspark.sql import functions as F

    texts = [
        "the quick brown fox jumps over the lazy dog tonight",
        "the quick brown fox jumps over the lazy dog tonight again",
        "completely different text about spark physical plans",
        "unrelated third topic entirely on its own",
    ]
    df = spark.createDataFrame(
        [(i, texts[i % len(texts)]) for i in range(12)], "doc_id long, text string"
    )
    new = df.filter(F.col("doc_id") % 3 == 0)
    old = df.filter(F.col("doc_id") % 3 != 0)

    spark.sql("DROP TABLE IF EXISTS mh_index_test")
    try:
        dedup.save_minhash_index(old, "mh_index_test", n_buckets=4)
        idx = dedup.load_minhash_index(spark, "mh_index_test")

        sig_new = dedup.minhash_signatures(new).localCheckpoint(eager=True)
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = sig_new.join(idx.withColumnRenamed("id", "id_b"), ["band", "sig"])
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert plan.count("Exchange") == 1, plan  # batch side only
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

        inc_idx = dedup.minhash_lsh_pairs_incremental(new, old, threshold=0.5, corpus_signatures=idx)
        inc_raw = dedup.minhash_lsh_pairs_incremental(new, old, threshold=0.5)
        assert {tuple(r) for r in inc_idx.collect()} == {tuple(r) for r in inc_raw.collect()}
    finally:
        spark.sql("DROP TABLE IF EXISTS mh_index_test")


def test_span_dedup_removes_corpus_wide_spans(spark):
    # k=3 spans; doc 1 and doc 2 share an identical 6-word prefix (2 spans),
    # doc 3 is entirely a copy of doc 1, doc 4 is unique.
    rows = [
        (1, "alpha beta gamma delta epsilon zeta unique one tail"),
        (2, "alpha beta gamma delta epsilon zeta other two tail"),
        (3, "alpha beta gamma delta epsilon zeta unique one tail"),
        (4, "totally fresh words nobody else uses here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup.span_dedup(df, k=3).collect()}

    assert out[1]["n_spans"] == 3 and out[1]["n_kept"] == 3
    assert out[1]["text"] == rows[0][1]
    # doc 2 loses the two shared prefix spans, keeps its own suffix
    assert out[2]["n_spans"] == 3 and out[2]["n_kept"] == 1
    assert out[2]["text"] == "other two tail"
    # doc 3 is a full duplicate: nothing survives
    assert out[3]["n_kept"] == 0 and out[3]["text"] == ""
    # doc 4 untouched (short last span kept as-is)
    assert out[4]["n_spans"] == 3 and out[4]["n_kept"] == 3
    assert out[4]["text"] == rows[3][1]


def test_span_dedup_within_doc_repeat(spark):
    # the same 2-word span repeated inside ONE doc: only the first stays
    df = spark.createDataFrame(
        [(7, "ping pong ping pong ping pong")], "doc_id long, text string"
    )
    row = dedup.span_dedup(df, k=2).collect()[0]
    assert row["n_spans"] == 3 and row["n_kept"] == 1
    assert row["text"] == "ping pong"


def test_dup_clusters_composition_keeps_singletons_and_reps(spark):
    """dd07's composition invariants: with no qualifying pairs every doc
    survives with cluster_size 1; with one duplicate pair only the min
    id survives, carrying the cluster size."""
    from pyspark.sql import functions as F

    from pyp_etl_pipeline_spark.operators import dedup

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"), (3, "totally different words here")],
        "doc_id long, text string",
    )
    pairs = dedup.shingle_pairs_jaccard(docs, threshold=0.5)
    clusters = dedup.dup_clusters(pairs)
    sizes = clusters.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    reps = clusters.filter(F.col("doc_id") == F.col("cluster_id")).join(sizes, "cluster_id").select("doc_id", "cluster_size")
    singles = docs.join(clusters, "doc_id", "left_anti").select("doc_id", F.lit(1).cast("long").alias("cluster_size"))
    out = {r["doc_id"]: r["cluster_size"] for r in singles.unionByName(reps).collect()}
    # docs 1+2 are dups -> 1 survives with size 2; doc 3 is a singleton
    assert out == {1: 2, 3: 1}


def test_exact_substring_spans_extension_math(spark):
    # gram=10: docs 1 and 2 share " "+25 chars+" " = one 27-char span
    # (the flanking spaces are shared too) => per doc all 18 window
    # starts match (27 - 10 + 1), merged into ONE interval covering
    # exactly 27 chars. doc 3 repeats a gram WITHIN itself only (no
    # cross-doc) and must not appear. doc 4 is unique.
    shared = "ABCDEFGHIJKLMNOPQRSTUVWXY"  # 25 chars
    rows = [
        (1, "xx1 " + shared + " one tail text here"),
        (2, "yy22 " + shared + " two other suffix"),
        (3, "zz " + "qqqqqqqqqqqq" + " mid " + "qqqqqqqqqqqq" + " zz"),
        (4, "totally fresh words nobody else uses here at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup.exact_substring_spans(df, gram=10).collect()}
    assert set(out) == {1, 2}
    for d in (1, 2):
        assert out[d]["n_dup_grams"] == 18
        assert out[d]["dup_chars"] == 27
        assert out[d]["n_spans"] == 1


def test_exact_substring_spans_two_disjoint_spans(spark):
    # two separated shared spans of 12+1 chars each (one flanking
    # space shared per span; gram=10): per doc 4 hits per span,
    # 2 maximal spans, 26 covered chars
    a = "AAAABBBBCCCC"
    b = "DDDDEEEEFFFF"
    rows = [
        (1, a + " left filler words " + b),
        (2, "pre " + a + " totally different middle " + b + " post"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup.exact_substring_spans(df, gram=10).collect()}
    for d in (1, 2):
        assert out[d]["n_dup_grams"] == 8
        assert out[d]["dup_chars"] == 26
        assert out[d]["n_spans"] == 2


def test_exact_substring_spans_content_sampling_is_alignment_free(spark):
    # sample_mod > 1 selects grams by CONTENT, so the two occurrences of
    # a shared span (at different offsets!) keep the same grams: every
    # sampled hit set is a subset of the exact run's, detected docs are
    # a subset, and a long-enough span still surfaces in both docs.
    shared = "The quick brown fox jumps over the lazy dog repeatedly tonight"
    rows = [
        (1, "aa " + shared + " tail one"),
        (2, "bbbbbbb " + shared + " other end"),  # different offset
        (3, "nothing in common with anybody here at all whatsoever"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    exact = {r["doc_id"]: r for r in dedup.exact_substring_spans(df, gram=10).collect()}
    sampled = {
        r["doc_id"]: r
        for r in dedup.exact_substring_spans(df, gram=10, sample_mod=3).collect()
    }
    assert set(exact) == {1, 2}
    assert set(sampled) == {1, 2}  # both offsets sample identical grams
    for d in sampled:
        assert sampled[d]["n_dup_grams"] <= exact[d]["n_dup_grams"]
        assert sampled[d]["dup_chars"] <= exact[d]["dup_chars"]
    # sampled hit counts agree between the two occurrences (content-defined)
    assert sampled[1]["n_dup_grams"] == sampled[2]["n_dup_grams"]
