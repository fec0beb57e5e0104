"""Event-window operators (tumbling/sliding/sessionize) and text-analysis
operators (quality features, language scores, token counts)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from pyp_etl_pipeline_spark.operators import textan, windows


def ts(h, m=0, s=0):
    return dt.datetime(2024, 1, 1, h, m, s)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        (1, "u1", "click", 1.0, ts(10, 0)),
        (2, "u1", "click", 2.0, ts(10, 20)),
        (3, "u1", "click", 3.0, ts(11, 5)),    # >30m gap -> new session
        (4, "u2", "view", 10.0, ts(10, 59)),
        (5, "u2", "view", 20.0, ts(11, 1)),    # 2m gap -> same session, crosses hour
    ]
    return spark.createDataFrame(rows, "event_id long, user_id string, event_type string, value double, ts timestamp")


def test_tumbling_hourly(events):
    out = {(r["window_start"].hour, r["event_type"]): r for r in windows.tumbling_agg(events).collect()}
    assert out[(10, "click")]["n_events"] == 2 and out[(10, "click")]["sum_value"] == 3.0
    assert out[(11, "click")]["n_events"] == 1
    assert out[(10, "view")]["n_events"] == 1 and out[(11, "view")]["n_events"] == 1


def test_sliding_window_membership(events):
    # size 1h, slide 15m -> each event appears in exactly 4 windows
    out = windows.sliding_agg(events, size_s=3600, slide_s=900)
    total = out.agg(F.sum("n_events")).collect()[0][0]
    assert total == 5 * 4


def test_sessionize_gap_30m(events):
    sess = windows.sessionize(events, gap_s=1800).collect()
    by_user = {}
    for r in sess:
        by_user.setdefault(r["user_id"], []).append(r)
    assert len(by_user["u1"]) == 2      # 45m gap splits
    assert len(by_user["u2"]) == 1      # 2m gap does not
    u2 = by_user["u2"][0]
    assert u2["n_events"] == 2 and u2["duration_s"] == 120


# ------------------------------------------------------------------ textan

@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "The quick brown fox jumps over the lazy dog today."),
            (2, "el rapido zorro marron salta sobre el perro perezoso"),
            (3, "!!! ??? ... ;;;"),
            (4, ""),
        ],
        "doc_id long, text string",
    )


def test_quality_features_shape(docs):
    out = {r["doc_id"]: r for r in textan.quality_features(docs).collect()}
    en = out[1]
    assert en["n_tokens"] == 10
    assert 0.0 < en["stopword_ratio"] < 1.0   # the/over/the are stopwords
    assert en["punct_ratio"] < 0.1
    junk = out[3]
    assert junk["punct_ratio"] > 0.5
    assert out[4]["n_tokens"] == 0


def test_language_scores_pick_english(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog are in the house with them")], "doc_id long, text string"
    )
    row = textan.language_scores(df).collect()[0]
    assert row["lang_guess"] == "en"
    assert row["hits_en"] > row["hits_es"]


def test_token_counts(spark):
    df = spark.createDataFrame([("don't stop-me now, it's 2024!",)], "t string")
    ws = df.select(textan.token_count("t").alias("n")).collect()[0]["n"]
    bpe = df.select(textan.bpeish_token_count("t").alias("n")).collect()[0]["n"]
    assert ws == 5
    assert bpe >= ws  # sub-word regex splits punctuation/contractions apart


def test_document_fingerprints_deterministic(docs):
    a = {r["doc_id"]: r for r in textan.document_fingerprints(docs).collect()}
    b = {r["doc_id"]: r for r in textan.document_fingerprints(docs).collect()}
    assert all(a[k] == b[k] for k in a)


def test_sessionize_without_event_id(spark):
    import datetime as dtm

    rows = [("u1", dtm.datetime(2024, 1, 1, 10, 0)), ("u1", dtm.datetime(2024, 1, 1, 10, 10))]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    out = windows.sessionize(df, gap_s=1800).collect()
    assert len(out) == 1 and out[0]["n_events"] == 2


def test_repetition_features(spark):
    from pyp_etl_pipeline_spark.operators.textan import repetition_features

    rows = [
        (1, "a b c a b c a b c"),   # heavy 3-gram repetition
        (2, "one two three four"),  # no repeats
        (3, "tiny doc"),            # shorter than n -> single whole-doc gram
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in repetition_features(df).collect()}
    # doc 1: 9 tokens -> 7 grams, distinct = {abc, bca, cab} = 3
    assert out[1]["n_grams"] == 7 and out[1]["n_distinct_grams"] == 3
    assert out[1]["repetition_ratio"] == round(1 - 3 / 7, 6)
    assert out[2]["repetition_ratio"] == 0.0
    assert out[3]["n_grams"] == 1 and out[3]["repetition_ratio"] == 0.0


def test_unigram_logprob(spark):
    import math

    from pyp_etl_pipeline_spark.operators.textan import unigram_logprob

    # corpus of 6 tokens: a x3, b x2, c x1
    rows = [(1, "a a a"), (2, "b b c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in unigram_logprob(df).collect()}
    assert out[1]["mean_logprob"] == round(math.log(3 / 6), 4)
    expect2 = (2 * math.log(2 / 6) + math.log(1 / 6)) / 3
    assert out[2]["mean_logprob"] == round(expect2, 4)
    # common-token doc scores higher (closer to 0) than rare-token doc
    assert out[1]["mean_logprob"] > out[2]["mean_logprob"]


def test_pack_sequences_invariants(spark):
    """Packing invariants: every bin but the last is exactly full; doc
    segments tile each doc's tokens without gaps; results are identical
    whatever the input partitioning (the distributed prefix sum must not
    depend on physical layout)."""
    from pyspark.sql import functions as F

    from pyp_etl_pipeline_spark.operators import packing

    rows = [(i, " ".join(f"w{j}" for j in range((i * 37) % 90 + 1))) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = packing.pack_sequences(df, max_len=128).collect()

    total_tokens = sum((i * 37) % 90 + 1 for i in range(60))
    bins = {}
    for r in out:
        bins.setdefault(r["bin_id"], []).append(r)
    n_bins = len(bins)
    assert set(bins) == set(range(n_bins))
    for b, segs in bins.items():
        fill = sum(s["seg_len"] for s in segs)
        assert fill == 128 or (b == n_bins - 1 and fill == total_tokens - 128 * (n_bins - 1))
        # segments tile the bin contiguously
        spans = sorted((s["bin_offset"], s["bin_offset"] + s["seg_len"]) for s in segs)
        pos = 0
        for st, en in spans:
            assert st == pos
            pos = en
    # per-doc: segments cover 0..n_tokens contiguously
    per_doc = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append((r["doc_offset"], r["doc_offset"] + r["seg_len"]))
    for i, spans in per_doc.items():
        spans.sort()
        assert spans[0][0] == 0
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert e1 == s2
        assert spans[-1][1] == (i * 37) % 90 + 1

    # partition invariance
    for parts in (1, 7):
        again = packing.pack_sequences(df.repartition(parts), max_len=128).collect()
        assert {tuple(r) for r in again} == {tuple(r) for r in out}

    # invariance under shuffle-partition count and repeated execution
    # (fresh builds each time — the round-6 driver failure was a
    # nondeterministic spark_partition_id() bucket key that could
    # diverge between consumer branches on recompute)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for sp in ("2", "8", "200"):
            spark.conf.set("spark.sql.shuffle.partitions", sp)
            for _ in range(2):
                again = packing.pack_sequences(df, max_len=128).collect()
                assert {tuple(r) for r in again} == {tuple(r) for r in out}, sp
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_pack_sequences_rejects_bad_len(spark):
    import pytest as _pytest

    from pyp_etl_pipeline_spark.operators import packing

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="positive"):
        packing.pack_sequences(df, max_len=0)


def test_gopher_quality_flags_rules(spark):
    from pyp_etl_pipeline_spark.operators import textan

    long_good = " ".join(["the", "cat", "sat", "with", "that", "dog"] * 10)  # 60 words
    rows = [
        (1, long_good),                                   # passes everything
        (2, "short text only"),                           # fails word count + stopwords
        (3, " ".join(["ab"] * 60)),                       # mean word len 2 -> fails
        (4, " ".join(["the", "of", "####", "..."] * 20)), # symbol-heavy
        (5, " ".join(["123", "456"] * 40)),               # no alpha words
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in textan.gopher_quality_flags(df).collect()}

    assert out[1]["gopher_pass"] is True and out[1]["n_words"] == 60
    assert out[2]["ok_word_count"] is False and out[2]["gopher_pass"] is False
    assert out[3]["ok_word_len"] is False and out[3]["mean_word_len"] == 2.0
    assert out[4]["ok_symbol"] is False and out[4]["symbol_ratio"] > 0.1
    assert out[5]["ok_alpha"] is False and out[5]["alpha_word_ratio"] == 0.0
    # stopword rule: doc 3 has zero required stopwords
    assert out[3]["n_stop_hits"] == 0 and out[3]["ok_stopwords"] is False


def test_tfidf_topk_ranks_distinctive_terms_first(spark):
    from pyp_etl_pipeline_spark.operators import textan

    docs = spark.createDataFrame(
        [
            (1, "zebra zebra common common common"),
            (2, "common common apple"),
            (3, "common banana banana"),
        ],
        "doc_id long, text string",
    )
    out = textan.tfidf_topk(docs, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["id"], []).append(r)
    # 'common' appears in every doc -> idf = ln(1) = 0 -> never outranks
    # a distinctive term; rank 1 is each doc's unique term
    assert {r["rank"] for rs in by_doc.values() for r in rs} <= {1, 2}
    assert by_doc[1][0]["term"] == "zebra" and by_doc[1][0]["tf"] == 2
    assert by_doc[2][0]["term"] == "apple"
    assert by_doc[3][0]["term"] == "banana"
    # df of 'common' is 3 (all docs), score_micro exactly 0
    commons = [r for rs in by_doc.values() for r in rs if r["term"] == "common"]
    assert all(r["df_docs"] == 3 and r["score_micro"] == 0 for r in commons)


def test_tfidf_topk_tie_breaks_term_ascending(spark):
    from pyp_etl_pipeline_spark.operators import textan

    # two terms with identical tf and df in doc 1 -> identical score;
    # the tie must break alphabetically
    docs = spark.createDataFrame(
        [(1, "beta alpha"), (2, "gamma gamma")],
        "doc_id long, text string",
    )
    out = [r for r in textan.tfidf_topk(docs, k=2).collect() if r["id"] == 1]
    out.sort(key=lambda r: r["rank"])
    assert [r["term"] for r in out] == ["alpha", "beta"]


def test_chunk_documents_overlap_and_coverage(spark):
    from pyp_etl_pipeline_spark.operators import packing

    words = " ".join(f"w{i}" for i in range(65))  # chunk=64 -> 2 chunks
    docs = spark.createDataFrame(
        [(1, words), (2, "a b c"), (3, "   "), (4, None)],
        "doc_id long, text string",
    )
    out = packing.chunk_documents(docs, chunk_tokens=64, overlap=8)
    rows = sorted(out.collect(), key=lambda r: (r["id"], r["chunk_idx"]))
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["id"], []).append(r)

    # empty / null docs emit nothing
    assert set(by_doc) == {1, 2}
    # short doc: exactly one full-coverage chunk
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_text"] == "a b c"
    assert by_doc[2][0]["n_tokens"] == 3
    # 65 tokens: chunk0 = w0..w63, chunk1 starts at stride 56 = w56..w64
    c0, c1 = by_doc[1]
    assert c0["n_tokens"] == 64 and c0["chunk_text"].split()[0] == "w0"
    assert c0["chunk_text"].split()[-1] == "w63"
    assert c1["n_tokens"] == 9 and c1["chunk_text"].split() == [f"w{i}" for i in range(56, 65)]
    # consecutive chunks share exactly `overlap` tokens
    assert set(c0["chunk_text"].split()) & set(c1["chunk_text"].split()) == {
        f"w{i}" for i in range(56, 64)
    }


def test_chunk_documents_param_validation(spark):
    import pytest as _pytest

    from pyp_etl_pipeline_spark.operators import packing

    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        packing.chunk_documents(docs, chunk_tokens=0)
    with _pytest.raises(ValueError):
        packing.chunk_documents(docs, chunk_tokens=8, overlap=8)


def test_group_zscores_flags_outlier_and_zero_variance(spark):
    from pyp_etl_pipeline_spark.operators.windows import group_zscores

    rows = (
        [(i, "a", 10.0) for i in range(10)]
        + [(10, "a", 1000.0)]           # wild outlier in group a
        + [(i, "b", 5.0) for i in range(20, 24)]  # zero-variance group
    )
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    out = {r["id"]: r for r in group_zscores(df, "event_type", "value", "event_id").collect()}
    assert len(out) == 15
    assert out[10]["is_anomaly"] and out[10]["z"] > 3
    assert all(not out[i]["is_anomaly"] for i in range(10))
    # zero-variance group: z defined as 0, never anomalous
    assert all(out[i]["z"] == 0.0 and not out[i]["is_anomaly"] for i in range(20, 24))


def test_gate_operators_keep_input_cols_mode(spark):
    from pyp_etl_pipeline_spark.operators import textan

    docs = spark.createDataFrame(
        [(1, "the quick brown fox", "extra")], "doc_id long, text string, meta string"
    )
    lang = textan.language_scores(docs, keep_input_cols=True)
    # full input row survives, scores appended
    assert {"doc_id", "text", "meta", "lang_guess"} <= set(lang.columns)
    gop = textan.gopher_quality_flags(docs, keep_input_cols=True)
    assert {"doc_id", "text", "meta", "gopher_pass", "n_words"} <= set(gop.columns)
    r = gop.collect()[0]
    assert r["meta"] == "extra" and r["n_words"] == 4
    # default mode schema unchanged (the tx03/tx07 oracle contract)
    assert set(textan.gopher_quality_flags(docs).columns) == {
        "id", "n_words", "mean_word_len", "symbol_ratio", "alpha_word_ratio",
        "n_stop_hits", "ok_word_count", "ok_word_len", "ok_symbol", "ok_alpha",
        "ok_stopwords", "gopher_pass",
    }


def test_group_zscores_ignores_null_values(spark):
    from pyp_etl_pipeline_spark.operators.windows import group_zscores

    rows = [(1, "a", 10.0), (2, "a", 12.0), (3, "a", None), (4, "a", 11.0)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    out = group_zscores(df, "event_type", "value", "event_id").collect()
    # the null row is excluded entirely; the others score against the
    # 3-value moments, not a 4-row count
    assert len(out) == 3
    assert all(r["id"] != 3 for r in out)
    assert all(abs(r["z"]) < 3 for r in out)


def test_bigram_logprob_golden(spark):
    import math

    from pyp_etl_pipeline_spark.operators.textan import bigram_logprob

    # corpus bigrams: (a,b) x2 from docs 1,3; (b,a) x1; (b,c) x1
    rows = [(1, "a b"), (2, "b a"), (3, "a b c"), (4, "solo")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in bigram_logprob(df).collect()}
    assert 4 not in out  # single-token doc: no bigram
    # C(a,b)=2, C1(a)=2 -> ln(1); C(b,a)=1, C1(b)=2 -> ln(.5); C(b,c)=1
    assert out[1]["n_bigrams"] == 1 and out[1]["mean_logprob"] == 0.0
    assert out[2]["mean_logprob"] == round(math.log(0.5), 4)
    expect3 = (math.log(2 / 2) + math.log(1 / 2)) / 2
    assert out[3]["n_bigrams"] == 2 and out[3]["mean_logprob"] == round(expect3, 4)
    # common-order doc scores higher than the rare-order doc
    assert out[1]["mean_logprob"] > out[2]["mean_logprob"]


def test_bpe_fit_textbook_example(spark):
    """Sennrich et al.'s worked example: merges must come out in the
    canonical order and the left-to-right non-overlap rewrite must hold
    (including the 'a a a' -> 'aa a' scan-order case)."""
    from pyp_etl_pipeline_spark.operators import bpe

    w = spark.createDataFrame(
        [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)], "word string, cnt long"
    )
    merges, seqs = bpe.bpe_fit(w, n_merges=4)
    assert merges == [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]
    got = {r["word"]: r["t"] for r in seqs.collect()}
    assert got["low"] == ["low"]
    assert got["newest"] == ["n", "e", "w", "est"]
    assert got["widest"] == ["w", "i", "d", "est"]
    assert got["lower"] == ["low", "e", "r"]

    # scan order on identical-symbol runs: merge (a,a) over "aaa" -> aa,a
    runs = spark.createDataFrame([("aaa", 9), ("aaaa", 1)], "word string, cnt long")
    m2, s2 = bpe.bpe_fit(runs, n_merges=1)
    assert m2 == [("a", "a")]
    g2 = {r["word"]: r["t"] for r in s2.collect()}
    assert g2["aaa"] == ["aa", "a"]
    assert g2["aaaa"] == ["aa", "aa"]

    # applying the learned table to unseen words reuses the same fold
    new = spark.createDataFrame([("slowest",), ("toes",)], "word string")
    seg = {r["word"]: r["t"] for r in bpe.bpe_segment(new, merges).collect()}
    assert seg["slowest"] == ["s", "low", "est"]
    assert seg["toes"] == ["t", "o", "es"]


def test_ewma_by_key_exact_fold(spark):
    import datetime as dtm

    from pyp_etl_pipeline_spark.operators.windows import ewma_by_key

    t0 = dtm.datetime(2024, 1, 1, 10, 0)
    rows = [
        (1, t0, 1, 10.0),                                   # s=1000
        (2, t0.replace(minute=5), 1, 20.0),                 # (1000+2000)//2=1500
        (3, t0.replace(minute=10), 1, 1.0),                 # (1500+100)//2=800
        (4, t0, 2, 7.0),                                    # single event
        (5, t0, 3, None),                                   # null -> dropped key
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    out = {r["user_id"]: r for r in ewma_by_key(df).collect()}
    assert out[1]["ewma_centi"] == 800 and out[1]["n_events"] == 3
    assert out[2]["ewma_centi"] == 700
    assert 3 not in out
    # order comes from (ts, event_id), not arrival: shuffle input rows
    again = {r["user_id"]: r["ewma_centi"]
             for r in ewma_by_key(df.orderBy(F.desc("event_id")).repartition(4)).collect()}
    assert again == {k: v["ewma_centi"] for k, v in out.items()}


def test_gap_fill_spine_zero_fill_and_locf(spark):
    import datetime as dt

    rows = [
        # key "a": hours 00, 01, 04 observed -> 02, 03 filled
        ("a", dt.datetime(2024, 1, 1, 0, 10), 10.0),
        ("a", dt.datetime(2024, 1, 1, 0, 40), 2.5),
        ("a", dt.datetime(2024, 1, 1, 1, 5), 7.0),
        ("a", dt.datetime(2024, 1, 1, 4, 59), 1.0),
        # key "b": single bucket
        ("b", dt.datetime(2024, 1, 2, 12, 0), 5.0),
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    out = windows.gap_fill(df)
    got = {
        (r["event_type"], r["bucket"].hour if r["bucket"].day == 1 else "b12"): r
        for r in out.collect()
    }
    assert len(got) == 6  # a: hours 0..4 (5 buckets), b: 1 bucket
    assert got[("a", 0)]["n_events"] == 2 and got[("a", 0)]["sum_value"] == 12.5
    assert got[("a", 2)]["n_events"] == 0 and got[("a", 2)]["filled"] is True
    assert got[("a", 2)]["sum_value"] is None
    # LOCF carries hour-1's sum through the filled hours 2 and 3
    assert got[("a", 2)]["locf_sum"] == 7.0 and got[("a", 3)]["locf_sum"] == 7.0
    assert got[("a", 4)]["locf_sum"] == 1.0
    assert got[("b", "b12")]["n_events"] == 1 and got[("b", "b12")]["filled"] is False


def test_gap_fill_partition_invariance(spark):
    import datetime as dt

    rows = [
        ("t%d" % (i % 3), dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(minutes=37 * i), float(i % 7) - 2.0)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    base = sorted(map(tuple, windows.gap_fill(df).collect()))
    for n in (1, 7):
        again = sorted(map(tuple, windows.gap_fill(df.repartition(n)).collect()))
        assert again == base


def test_inverted_index_prunes_before_postings(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "banana dates"),
            (4, "banana edge apple"),
        ],
        "doc_id long, text string",
    )
    out = {r["token"]: r for r in textan.inverted_index(docs, max_df_ratio=0.8).collect()}
    # banana: df=4 > 0.8*4 -> pruned (stopword-grade); cherry/dates/edge: df=1 < 2 -> pruned
    assert set(out) == {"apple"}
    r = out["apple"]
    assert r["df"] == 2 and r["total_tf"] == 3
    # doc 2 has no apple; postings sorted by doc_id, tf per doc
    assert r["postings"] == "1:2 4:1"


def test_histogram_quantiles_accuracy_and_merge_shape(spark):
    from pyp_etl_pipeline_spark.operators import sketch

    # uniform 0..999 -> p50 ~ 500, p95 ~ 950 within one bin width (1000/32 ~ 31.25)
    rows = [("u", float(i)) for i in range(1000)] + [("c", 42.0)] * 5
    df = spark.createDataFrame(rows, "event_type string, value double")
    out = {(r["event_type"], r["q"]): r for r in sketch.histogram_quantiles(df).collect()}
    width = 1000.0 / 32
    assert abs(out[("u", "p50")]["est_micro"] / 1e6 - 499.5) <= width
    assert abs(out[("u", "p95")]["est_micro"] / 1e6 - 949.5) <= width
    assert out[("u", "p50")]["n"] == 1000
    # constant group: every quantile collapses to the single value
    for q in ("p50", "p95", "p99"):
        assert out[("c", q)]["est_micro"] == 42_000_000
    # partition invariance (integer arithmetic end to end)
    base = sorted(map(tuple, sketch.histogram_quantiles(df).collect()))
    assert sorted(map(tuple, sketch.histogram_quantiles(df.repartition(7)).collect())) == base


def test_wordpiece_segment_maximal_munch(spark):
    from pyp_etl_pipeline_spark.operators import bpe

    docs = spark.createDataFrame(
        [(1, "internet interne inter net work working"), (2, "inter network internet")],
        "doc_id long, text string",
    )
    w = bpe.word_counts(docs)
    vocab = bpe.wordpiece_vocab(w, top_k=3, max_len=6)
    out = {r["word"]: r for r in bpe.wordpiece_segment(w, vocab).collect()}
    # 'internet'/'inter' are top words -> prefixes up to len 6 in vocab;
    # greedy takes the LONGEST prefix at each cursor ('intern', not 'inter')
    assert out["internet"]["pieces"] == "intern e t"
    assert out["interne"]["pieces"] == "intern e"
    assert out["inter"]["pieces"] == "inter" and out["inter"]["n_pieces"] == 1
    # words with no multi-char vocab hits fall back to chars — full coverage
    assert out["network"]["pieces"] == "n e t w o r k"
    # every word reconstructs from its pieces
    for word, r in out.items():
        assert "".join(r["pieces"].split(" ")) == word
    # partition invariance
    a = sorted(map(tuple, bpe.wordpiece_segment(w, vocab).collect()))
    b = sorted(map(tuple, bpe.wordpiece_segment(w.repartition(5), vocab).collect()))
    assert a == b


def test_bm25_rank_semantics(spark):
    import math

    docs = spark.createDataFrame(
        [
            (1, "apple banana cherry apple"),
            (2, "apple banana"),
            (3, "banana dates eggs figs"),
            (4, "grape honey kiwi lemon mango"),
            (5, "apple cherry cherry"),
        ],
        "doc_id long, text string",
    )
    out = textan.bm25_rank(docs, n_query_terms=2, k=3)
    rows = out.collect()
    assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == [1, 2, 3]
    # query terms: df closest to n/2=2.5 -> cherry(df=2) and apple(df=3) tie dist 1 -> ties by token asc: apple, cherry
    # doc 5 matches both terms incl tf=2 cherry; docs ranked deterministically
    by_doc = {r["doc_id"]: r for r in rows}
    # df: apple=3 banana=3 cherry=2 -> |2df-n| ties at 1; token asc picks apple, banana
    assert by_doc[2]["n_terms_matched"] == 2 and by_doc[2]["rank"] == 1

    # reference BM25 (N=5, avgdl=3.6): per-term micro-floor then integer sum
    def term(tf, df, dl, N=5, avgdl=18 / 5):
        idf = math.log((N - df + 0.5) / (df + 0.5) + 1.0)
        return math.floor(idf * (tf * (1.2 + 1.0)) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl))) * 1e6 + 0.5)

    # doc 2 "apple banana": both terms tf=1, df=3, dl=2
    assert by_doc[2]["score_micro"] == 2 * term(1, 3, 2)
    # doc 1 "apple banana cherry apple": apple tf=2 + banana tf=1, dl=4
    assert by_doc[1]["score_micro"] == term(2, 3, 4) + term(1, 3, 4)
    # partition invariance
    a = sorted(map(tuple, textan.bm25_rank(docs, n_query_terms=2, k=3).collect()))
    bb = sorted(map(tuple, textan.bm25_rank(docs.repartition(4), n_query_terms=2, k=3).collect()))
    assert a == bb


def test_json_extract_tolerates_malformed(spark):
    from pyp_etl_pipeline_spark.driver_queries_ext3 import js01_json_extract_rollup  # noqa: F401
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            ("a", '{"k": 3}'),
            ("a", '{"k": 5}'),
            ("a", "not json"),
            ("a", None),
            ("b", '{"other": 1}'),
        ],
        "event_type string, props string",
    )
    k = F.from_json(F.col("props"), "k BIGINT")["k"]
    out = {
        r["event_type"]: r
        for r in df.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"), F.count("k").alias("n_parsed"), F.sum("k").alias("sum_k"))
        .collect()
    }
    assert out["a"]["n_events"] == 4 and out["a"]["n_parsed"] == 2 and out["a"]["sum_k"] == 8
    assert out["b"]["n_parsed"] == 0 and out["b"]["sum_k"] is None


def test_traffic_anomalies_flags_gap_bucket(spark):
    """A filled (zero-count) hour inside an otherwise-steady series must
    be flagged: densification is what makes outages visible."""
    import datetime as dt

    from pyp_etl_pipeline_spark.operators.windows import gap_fill, group_zscores

    rows = []
    for h in range(24):
        if h == 12:
            continue  # the outage hour: no events at all
        for m in range(6):
            rows.append(("click", dt.datetime(2024, 1, 1, h, m * 10), 1.0))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    filled = gap_fill(df)
    out = {
        r["id"].hour: r
        for r in group_zscores(
            filled, group_col="event_type", value_col="n_events", id_col="bucket", z_threshold=2.0
        ).collect()
    }
    assert len(out) == 24
    assert out[12]["value"] == 0 and out[12]["is_anomaly"] is True
    assert sum(1 for r in out.values() if r["is_anomaly"]) == 1


def test_winsorized_stats_clips_outliers(spark):
    from pyp_etl_pipeline_spark.operators import sketch

    # 98 values of 10.0 plus two extreme outliers
    rows = [("a", 10.0)] * 98 + [("a", 100000.0), ("a", -100000.0)]
    df = spark.createDataFrame(rows, "event_type string, value double")
    r = sketch.winsorized_stats(df).collect()[0]
    assert r["n"] == 100 and r["n_clipped_lo"] >= 1 and r["n_clipped_hi"] >= 1
    # raw mean is 10.0 exactly (outliers cancel) but winsorized must be
    # near 10 too — and the clip must bound its distance from the bulk
    assert abs(r["winsorized_mean_micro"] / 1e6 - 10.0) < 6500  # within a bin width of bulk
    assert abs(r["winsorized_mean_micro"]) < abs(100000 * 1e6)
    # partition invariance (all-integer path)
    a = sorted(map(tuple, sketch.winsorized_stats(df).collect()))
    b = sorted(map(tuple, sketch.winsorized_stats(df.repartition(6)).collect()))
    assert a == b


def test_readability_features(spark):
    docs = spark.createDataFrame(
        [
            (1, "The cat sat. The dog ran!"),
            (2, ""),
            (3, "word"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in textan.readability_features(docs).collect()}
    r = out[1]
    assert r["n_words"] == 6 and r["n_sentences"] == 2
    # syllables: the=1 cat=1 sat.=1 the=1 dog=1 ran!=1 -> 6
    assert r["n_syllables"] == 6
    expect = (206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6)) * 1e6
    assert abs(r["flesch_micro"] - expect) <= 1
    assert out[2]["flesch_micro"] is None and out[2]["n_words"] == 0
    # single word, no sentence punctuation -> 'word' is one sentence
    assert out[3]["n_sentences"] == 1 and out[3]["flesch_micro"] is not None


def test_ohlc_bars(spark):
    import datetime as dt

    from pyp_etl_pipeline_spark.driver_queries_ext3 import w10_ohlc_bars  # noqa: F401
    from pyspark.sql import functions as F

    rows = [
        (1, "t", dt.datetime(2024, 1, 1, 9, 0), 10.0),
        (2, "t", dt.datetime(2024, 1, 1, 9, 15), 99.0),
        (3, "t", dt.datetime(2024, 1, 1, 9, 30), 1.0),
        (4, "t", dt.datetime(2024, 1, 1, 9, 45), 42.0),
        # same second as event 1: event_id breaks the tie for OPEN
        (0, "t", dt.datetime(2024, 1, 1, 9, 0), 7.0),
    ]
    e = spark.createDataFrame(rows, "event_id long, event_type string, ts timestamp, value double")
    ord_key = F.expr("CAST(floor(unix_timestamp(ts)) AS BIGINT)") * F.lit(10_000_000) + F.col("event_id")
    out = (
        e.select(F.date_trunc("hour", "ts").alias("w"), "event_type", "value", ord_key.alias("o"))
        .groupBy("w", "event_type")
        .agg(
            F.min_by("value", "o").alias("open"),
            F.max_by("value", "o").alias("close"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
        )
        .collect()[0]
    )
    assert (out["open"], out["close"], out["high"], out["low"]) == (7.0, 42.0, 99.0, 1.0)


def test_heldout_logprob_oov_and_leakage_direction(spark):
    import math

    from pyp_etl_pipeline_spark.operators.textan import heldout_unigram_logprob

    train = spark.createDataFrame([(0, "aa aa bb")], "doc_id long, text string")
    score = spark.createDataFrame(
        [(1, "aa bb"), (3, "zz zz")], "doc_id long, text string"
    )
    out = {r["id"]: r for r in heldout_unigram_logprob(train, score).collect()}
    # N=3, V=2 -> denom 6; p(aa)=3/6, p(bb)=2/6, p(unseen)=1/6
    assert out[1]["n_oov"] == 0
    exp1 = (math.log(3 / 6) + math.log(2 / 6)) / 2
    assert out[1]["mean_logprob"] == round(exp1, 4)
    assert out[3]["n_oov"] == 2
    assert out[3]["mean_logprob"] == round(math.log(1 / 6), 4)
    # OOV-heavy doc scores strictly lower — the gate's direction
    assert out[3]["mean_logprob"] < out[1]["mean_logprob"]


def test_pp02_manifest_invariants(spark):
    """Composition invariants: every doc appears exactly once; reasons
    are exclusive; text-dup keepers survive unless gated downstream."""
    from pyp_etl_pipeline_spark.driver_queries_ext3 import pp02_multimodal_curation

    rows = pp02_multimodal_curation(spark, "/root/testdata/sf0.001").collect()
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))
    statuses = {r["status"] for r in rows}
    assert statuses <= {"kept", "text_dup", "gopher_fail", "image_neardup"}
    for r in rows:
        assert r["keep"] == (r["status"] == "kept")
        if r["status"] == "image_neardup":
            assert r["has_image"]  # only docs WITH images can fail the image gate


def test_sq01_session_transitions_hand_checked(spark):
    """Hand-checkable path: one user with view->click (10 min gap),
    click->purchase (40 min: EXCLUDED by the 30-min rule), plus a
    second user whose lone event yields no transition; a NULL-ts event
    is excluded from the sequence entirely (engines disagree on null
    ordering, so the operator filters them up front)."""
    from pyp_etl_pipeline_spark.driver_queries_ext3 import sq01_session_transitions

    out = sq01_session_transitions(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    total = sum(r["n_trans"] for r in rows)
    assert total > 0
    # shares: floor(n*1e6/total) each, so the sum is within len(rows) of 1e6
    share_sum = sum(r["share_micro"] for r in rows)
    assert 1_000_000 - len(rows) <= share_sum <= 1_000_000
    for r in rows:
        assert r["share_micro"] == r["n_trans"] * 1_000_000 // total


def test_hy01_rrf_fusion_invariants(spark):
    """RRF arithmetic replayed in Python: every candidate's rrf_nano is
    exactly the sum of 1e9 DIV (60 + rank) over the lists containing
    it; fused ranks are 1..n dense over the candidate union; the
    fused order is (rrf desc, doc_id asc)."""
    from pyp_etl_pipeline_spark.driver_queries_ext3 import hy01_hybrid_rrf_fusion

    rows = sorted(
        hy01_hybrid_rrf_fusion(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r["fused_rank"],
    )
    assert [r["fused_rank"] for r in rows] == list(range(1, len(rows) + 1))
    assert 0 < len(rows) <= 10
    prev = None
    for r in rows:
        expect = 0
        if r["text_rank"] is not None:
            expect += 1_000_000_000 // (60 + r["text_rank"])
        if r["vec_rank"] is not None:
            expect += 1_000_000_000 // (60 + r["vec_rank"])
        assert r["rrf_nano"] == expect and expect > 0
        if prev is not None:
            assert (prev["rrf_nano"], -prev["doc_id"]) >= (r["rrf_nano"], -r["doc_id"])
            assert prev["rrf_nano"] > r["rrf_nano"] or prev["doc_id"] < r["doc_id"]
        prev = r


def test_gs01_grouping_flags_semantics(spark):
    """The flags, not NULL-punning, mark super-aggregates: exactly one
    grand-total row (both flags 1), per-status subtotals have only the
    priority flag set, and each subtotal equals the sum of its leaves."""
    from pyp_etl_pipeline_spark.driver_queries_ext3 import gs01_grouping_sets

    rows = gs01_grouping_sets(spark, "/root/testdata/sf0.001").collect()
    grand = [r for r in rows if r["g_status"] == 1 and r["g_priority"] == 1]
    assert len(grand) == 1
    leaves = [r for r in rows if r["g_status"] == 0 and r["g_priority"] == 0]
    subs = [r for r in rows if r["g_status"] == 0 and r["g_priority"] == 1]
    assert grand[0]["n_orders"] == sum(r["n_orders"] for r in leaves)
    for s in subs:
        mine = [r for r in leaves if r["o_orderstatus"] == s["o_orderstatus"]]
        assert s["n_orders"] == sum(r["n_orders"] for r in mine)


def test_uv01_unpivot_inverse_of_wide(spark):
    """Melting part's two numeric attrs doubles the row count pre-rollup
    and partitions it exactly by attr; per-attr totals equal the wide
    column sums (exact centi units)."""
    from pyspark.sql import functions as F

    from pyp_etl_pipeline_spark.driver_queries_ext3 import uv01_unpivot_part_attrs
    from pyp_etl_pipeline_spark.tables import load_table

    out = uv01_unpivot_part_attrs(spark, "/root/testdata/sf0.001")
    per_attr = {r["attr"]: (r["n"], r["sum"]) for r in
                out.groupBy("attr").agg(F.sum("n").alias("n"), F.sum("sum_centi").alias("sum")).collect()}
    p = load_table(spark, "/root/testdata/sf0.001", "part")
    n_parts = p.count()
    for attr in ("p_size", "p_retailprice"):
        wide = p.agg(
            F.sum(F.floor(F.col(attr).cast("double") * 100 + F.lit(0.5)).cast("long"))
        ).collect()[0][0]
        assert per_attr[attr] == (n_parts, wide)


def test_ka01_k_anonymity_ladder(spark):
    """The released level is the FIRST whose smallest group >= 25; every
    released group meets k; totals are preserved (no row suppressed by
    generalization); and more-general levels never release while a
    finer compliant level exists."""
    from pyspark.sql import functions as F

    from pyp_etl_pipeline_spark.driver_queries_ext3 import ka01_k_anonymity
    from pyp_etl_pipeline_spark.tables import load_table

    rows = ka01_k_anonymity(spark, "/root/testdata/sf0.001").collect()
    levels = {r["level"] for r in rows}
    assert len(levels) == 1
    lvl = levels.pop()
    n_customers = load_table(spark, "/root/testdata/sf0.001", "customer").count()
    assert sum(r["n"] for r in rows) == n_customers
    if lvl < 3:
        assert all(r["n"] >= 25 for r in rows)
    else:
        assert len(rows) == 1 and rows[0]["qi_nation"] == "*" and rows[0]["qi_segment"] == "*"


def test_token_entropy_uniform_and_repetitive(spark):
    from pyp_etl_pipeline_spark.operators.textan import token_entropy
    import math

    rows = [
        (1, "a b c d"),              # uniform over 4 -> H = ln(4)
        (2, "x x x x x x"),          # single token -> H = 0
        (3, "a a a a a a a b"),      # skewed -> 0 < H < ln(2)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in token_entropy(df).collect()}
    assert out[1]["n_tokens"] == 4 and out[1]["n_distinct"] == 4
    # 4 terms of floor((1/4)*ln(4)*1e6)
    assert out[1]["entropy_nats_micro"] == 4 * math.floor(0.25 * math.log(4.0) * 1e6)
    assert out[2]["entropy_nats_micro"] == 0 and out[2]["n_distinct"] == 1
    expected3 = math.floor(7 / 8 * math.log(8 / 7) * 1e6) + math.floor(1 / 8 * math.log(8.0) * 1e6)
    assert out[3]["entropy_nats_micro"] == expected3
    assert 0 < out[3]["entropy_nats_micro"] < out[1]["entropy_nats_micro"]
