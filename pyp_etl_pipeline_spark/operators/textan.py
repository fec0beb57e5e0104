"""Text analysis operators (scale generalization of T1-T5) over a corpus.

- token counting: whitespace tokens + a BPE-ish subword regex count
- quality scoring: length / punctuation ratio / stopword ratio /
  mean word length — the standard cheap quality heuristics
- language ID: marker-word n-gram heuristic returning per-language hit
  counts and an argmax guess
- document fingerprinting: md5 content fingerprint (rolling-hash analog,
  portable across engines)

All pure column expressions (codegen; zero Python in the scan path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyp_etl_pipeline_spark.functions import aggregates

from pyp_etl_pipeline_spark.operators.dedup import fingerprint, normalized_text

ENGLISH_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "on", "at", "for", "with", "by", "is", "are", "was",
)

# tiny marker lexicons for the n-gram language heuristic
LANGUAGE_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "es": ("el", "la", "de", "que", "y"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "de", "et", "est"),
}

# BPE-ish token regex: word pieces, numbers, or single non-space symbols
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def whitespace_tokens(c: Column | str) -> Column:
    return F.filter(F.split(F.trim(_col(c)), r"\s+"), lambda x: x != F.lit(""))


def token_count(c: Column | str) -> Column:
    return F.size(whitespace_tokens(c))


def bpeish_token_count(c: Column | str) -> Column:
    """Count of BPE-ish subword pieces via regexp extraction."""
    return F.size(F.regexp_extract_all(_col(c), F.lit(BPE_ISH_PATTERN), 0))


def punct_ratio(c: Column | str) -> Column:
    c = _col(c)
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return F.when(F.length(c) == 0, F.lit(0.0)).otherwise(n_punct / F.length(c))


def stopword_ratio(c: Column | str, stopwords: tuple[str, ...] = ENGLISH_STOPWORDS) -> Column:
    toks = F.transform(whitespace_tokens(c), lambda x: F.lower(x))
    sw = F.array(*[F.lit(s) for s in stopwords])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(n_stop / F.size(toks))


def mean_word_length(c: Column | str) -> Column:
    toks = whitespace_tokens(c)
    total = F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(total / F.size(toks))


def quality_features(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document quality feature vector + a composite score in [0,1]."""
    t = F.col(text_col)
    out = df.select(
        F.col(id_col),
        F.length(t).cast("long").alias("n_chars"),
        token_count(t).cast("long").alias("n_tokens"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
        F.round(stopword_ratio(t), 6).alias("stopword_ratio"),
        F.round(mean_word_length(t), 6).alias("mean_word_len"),
    )
    # cheap composite: long enough, low punct noise, some stopword signal
    score = (
        F.when(F.col("n_tokens") >= 20, F.lit(0.4)).otherwise(F.col("n_tokens") / 50.0)
        + (1.0 - F.least(F.col("punct_ratio") * 4.0, F.lit(1.0))) * 0.3
        + F.least(F.col("stopword_ratio") * 3.0, F.lit(1.0)) * 0.3
    )
    return out.withColumn("quality_score", F.round(score, 6))


def language_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_input_cols: bool = False,
) -> DataFrame:
    """Marker-word hit counts per language + argmax guess ('und' on tie-0).

    ``keep_input_cols=True`` appends the scores to the FULL input row
    (map-only) instead of the narrow (id, scores) projection — the shape
    pipeline compositions want, so a downstream language filter needs no
    join-back against the corpus."""
    toks = F.transform(whitespace_tokens(text_col), lambda x: F.lower(x))
    if keep_input_cols:
        out = df.select("*", toks.alias("__toks"))
    else:
        out = df.select(F.col(id_col), toks.alias("__toks"))
    for lang, markers in LANGUAGE_MARKERS.items():
        marr = F.array(*[F.lit(m) for m in markers])
        out = out.withColumn(f"hits_{lang}", F.size(F.filter(F.col("__toks"), lambda x: F.array_contains(marr, x))))
    langs = list(LANGUAGE_MARKERS)
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in langs])
    guess = F.lit("und")
    for lang in reversed(langs):  # earlier languages win ties
        guess = F.when(F.col(f"hits_{lang}") == best, F.lit(lang)).otherwise(guess)
    guess = F.when(best == 0, F.lit("und")).otherwise(guess)
    return out.withColumn("lang_guess", guess).drop("__toks")


def document_fingerprints(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Content fingerprint per document (md5 of normalized text) plus a
    coarse locality fingerprint (md5 of the first 5 normalized tokens)."""
    toks = F.split(normalized_text(text_col), " ")
    prefix_fp = F.md5(F.array_join(F.slice(toks, 1, 5), " "))
    return df.select(
        F.col(id_col),
        fingerprint(text_col).alias("content_fp"),
        prefix_fp.alias("prefix_fp"),
    )


def repetition_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Intra-document repetition metrics — the within-doc analog of the
    C4/Gopher "duplicate line / duplicate n-gram fraction" quality
    filters: fraction of the doc's word n-grams that are repeats of an
    earlier n-gram. Pure per-row higher-order array ops (no shuffle, no
    Python); a document scoring high here is boilerplate/spam-like and a
    drop candidate for a training corpus.

    Output: id, n_tokens, n_grams, n_distinct_grams,
    repetition_ratio = 1 - distinct/total (0 = no repeated n-gram)."""
    toks = F.split(normalized_text(text_col), " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.when(
        F.size(toks) >= n,
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " ")),
    ).when(
        # NULL text: every metric NULL, not the [NULL] singleton the
        # otherwise-branch would build (null-injection sweep, r8)
        toks.isNotNull(),
        F.array(F.array_join(toks, " ")),
    )
    out = df.select(F.col(id_col).alias("id"), F.size(toks).alias("n_tokens"), grams.alias("__g"))
    return out.select(
        "id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.size("__g").cast("long").alias("n_grams"),
        F.size(F.array_distinct("__g")).cast("long").alias("n_distinct_grams"),
        F.round(1.0 - F.size(F.array_distinct("__g")) / F.size("__g"), 6).alias("repetition_ratio"),
    )


def unigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    unigram model — the cheap analog of a perplexity quality filter:
    documents full of rare tokens (noise, mojibake, code dumps) score
    far below the corpus norm and become drop candidates.

    Two shuffles at scale: one hash-agg for the vocabulary counts (map-
    side combined) and one join of exploded tokens against it (vocab
    tables for natural-language corpora fit broadcast; AQE decides). The
    corpus-total token count rides as a broadcast 1-row aggregate — no
    driver collect.

    Output: (id, n_tokens, mean_logprob) with natural-log probabilities.
    """
    toks = F.split(normalized_text(text_col), " ")
    ex = df.select(F.col(id_col).alias("id"), F.explode(toks).alias("tok")).filter(F.col("tok") != "")
    counts = ex.groupBy("tok").agg(F.count("*").alias("tok_n"))
    total = counts.agg(F.sum("tok_n").alias("total_n"))
    scored = (
        ex.join(counts, "tok")
        .join(F.broadcast(total))
        .withColumn("logp", F.log(F.col("tok_n") / F.col("total_n")))
    )
    return scored.groupBy("id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        # order-independent mean (functions/aggregates.py): a per-doc
        # float avg flips its 4th decimal with partition layout
        aggregates.exact_avg("logp").alias("mean_logprob"),
    )


def token_entropy(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document Shannon entropy of the token distribution (nats) —
    the information-density quality signal: low entropy at high length
    means repetitive junk (keyword stuffing, boilerplate loops) that
    repetition_features' fixed-n window can miss, and abnormally high
    entropy flags mojibake/random noise. The C4/Gopher family uses it
    beside the repetition ratios.

    H = -Σ (c/n)·ln(c/n) over the doc's distinct tokens. Each term is
    micro-floored BEFORE the per-doc integer sum, so the result is
    partition-order exact (the tx06/bm01 contract); the within-doc
    distribution needs no corpus pass, so the whole operator is two
    per-doc-keyed hash aggregates — map-side combinable, no skew
    surface (group = document).

    Output: (id, n_tokens, n_distinct, entropy_nats_micro).
    """
    toks = F.split(normalized_text(text_col), " ")
    ex = df.select(F.col(id_col).alias("id"), F.explode(toks).alias("tok")).filter(
        F.col("tok") != ""
    )
    counts = ex.groupBy("id", "tok").agg(F.count("*").alias("c"))
    totals = counts.groupBy("id").agg(
        F.sum("c").alias("n"), F.count("*").alias("n_distinct")
    )
    term = F.floor(
        (F.col("c") / F.col("n")) * F.log(F.col("n") / F.col("c")) * 1_000_000
    ).cast("long")
    return (
        counts.join(totals, "id")
        .groupBy("id")
        .agg(
            F.max("n").cast("long").alias("n_tokens"),
            F.max("n_distinct").cast("long").alias("n_distinct"),
            F.sum(term).cast("long").alias("entropy_nats_micro"),
        )
    )


def bigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document mean bigram conditional log-probability
    ``ln P(w2|w1) = ln(C(w1,w2) / C1(w1))`` under the corpus's own MLE
    bigram model (``C1`` counts bigram LEFT positions, so the
    conditionals are a proper distribution). One step up from
    ``unigram_logprob``'s vocabulary filter: token ORDER now matters,
    so shuffled/templated/boilerplate text scores low even when every
    individual token is common — the cheap stand-in for a KenLM-style
    perplexity gate.

    Same physical shape as the unigram scorer: the pair explosion is
    map-only column algebra (two slices zipped per row), then two
    map-side-combined count aggregates and two joins of the exploded
    pairs (bigram tables for natural corpora are AQE-broadcastable).
    Output: (id, n_bigrams, mean_logprob); docs with < 2 tokens have no
    bigram and drop out, matching the n>0 contract of the unigram op.
    """
    toks = F.filter(F.split(normalized_text(text_col), " "), lambda x: x != F.lit(""))
    base = df.select(F.col(id_col).alias("id"), toks.alias("__t")).filter(F.size("__t") >= 2)
    n = F.size("__t")
    # two selects: a generator next to struct-building lambdas in one
    # projection makes Catalyst re-resolve struct fields positionally
    zipped = base.select(
        "id",
        F.zip_with(
            F.slice("__t", 1, n - 1),
            F.slice("__t", 2, n - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ).alias("__pairs"),
    )
    ex = zipped.select("id", F.explode("__pairs").alias("p")).select(
        "id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    cb = ex.groupBy("w1", "w2").agg(F.count("*").alias("cb"))
    c1 = ex.groupBy("w1").agg(F.count("*").alias("c1"))
    scored = (
        ex.join(cb, ["w1", "w2"])
        .join(c1, "w1")
        .withColumn("logp", F.log(F.col("cb") / F.col("c1")))
    )
    return scored.groupBy("id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        aggregates.exact_avg("logp").alias("mean_logprob"),
    )


GOPHER_REQUIRED_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_flags(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_ratio: float = 0.8,
    min_stop_hits: int = 2,
    keep_input_cols: bool = False,
) -> DataFrame:
    """Gopher-style rule-based quality filter (Rae et al. 2021, table A1;
    the C4/RefinedWeb heuristic family): per document, the five cheap
    structural signals and a boolean per rule plus the conjunction —
    the standard first-pass gate of an LLM data pipeline, applied before
    any model-based scoring.

    Rules (defaults = the published Gopher thresholds where applicable):
    word count in [min_words, max_words]; mean word length in
    [min_mean_word_len, max_mean_word_len]; '#'-or-ellipsis symbol-to-
    word ratio <= max_symbol_ratio; fraction of words containing an
    alphabetic character >= min_alpha_ratio; >= min_stop_hits occurrences
    of the required-stopword list.

    All pure column algebra, map-only, zero shuffle — at 100 TB this is
    a per-split scan that pipelines into whatever filter consumes
    ``gopher_pass``. Each heavy input (token array) is projected as its
    own column so Catalyst evaluates it once (no CSE inside when()).

    Output: (id, n_words, mean_word_len, symbol_ratio, alpha_word_ratio,
    n_stop_hits, ok_* flags, gopher_pass). ``keep_input_cols=True``
    appends signals+flags to the FULL input row instead (still map-only;
    input columns must not collide with the signal/flag names) — the
    composition shape, so a downstream ``gopher_pass`` filter needs no
    join-back against the corpus.
    """
    sw = F.array(*[F.lit(s) for s in GOPHER_REQUIRED_STOPWORDS])
    if keep_input_cols:
        base_cols = list(df.columns)
        t = df.select("*", F.col(text_col).alias("__txt"), whitespace_tokens(text_col).alias("__w"))
    else:
        base_cols = ["id"]
        t = df.select(
            F.col(id_col).alias("id"),
            F.col(text_col).alias("__txt"),
            whitespace_tokens(text_col).alias("__w"),
        )
    n_words = F.size("__w")
    feats = t.select(
        *base_cols,
        n_words.cast("long").alias("n_words"),
        F.when(n_words == 0, F.lit(0.0))
        .otherwise(F.aggregate("__w", F.lit(0), lambda a, x: a + F.length(x)) / n_words)
        .alias("__mwl"),
        F.when(n_words == 0, F.lit(0.0))
        .otherwise(F.regexp_count("__txt", F.lit(r"#|\.\.\.")) / n_words)
        .alias("__sym"),
        F.when(n_words == 0, F.lit(0.0))
        .otherwise(F.size(F.filter("__w", lambda x: x.rlike("[A-Za-z]"))) / n_words)
        .alias("__alpha"),
        F.size(F.filter("__w", lambda x: F.array_contains(sw, F.lower(x))))
        .cast("long")
        .alias("n_stop_hits"),
    )
    return feats.select(
        *base_cols,
        "n_words",
        F.round("__mwl", 6).alias("mean_word_len"),
        F.round("__sym", 6).alias("symbol_ratio"),
        F.round("__alpha", 6).alias("alpha_word_ratio"),
        "n_stop_hits",
        ((F.col("n_words") >= min_words) & (F.col("n_words") <= max_words)).alias("ok_word_count"),
        ((F.col("__mwl") >= min_mean_word_len) & (F.col("__mwl") <= max_mean_word_len)).alias("ok_word_len"),
        (F.col("__sym") <= max_symbol_ratio).alias("ok_symbol"),
        (F.col("__alpha") >= min_alpha_ratio).alias("ok_alpha"),
        (F.col("n_stop_hits") >= min_stop_hits).alias("ok_stopwords"),
        (
            (F.col("n_words") >= min_words) & (F.col("n_words") <= max_words)
            & (F.col("__mwl") >= min_mean_word_len) & (F.col("__mwl") <= max_mean_word_len)
            & (F.col("__sym") <= max_symbol_ratio)
            & (F.col("__alpha") >= min_alpha_ratio)
            & (F.col("n_stop_hits") >= min_stop_hits)
        ).alias("gopher_pass"),
    )


def tfidf_topk(
    df: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document top-k TF-IDF keyword extraction — the classic
    corpus-level term-weighting step (tag/topic surfacing, index
    pruning, near-dup feature vectors).

    score = tf * ln(N / df), quantized to an integer micro score BEFORE
    ranking (``floor(x * 1e6 + 0.5)``) so the rank key is a BIGINT and
    the top-k order is engine-portable: ties break (score desc, term
    asc), and a sub-micro IEEE wobble in ``ln`` can never flip two
    different-score terms (same contract as ``unigram_logprob``'s
    exact_avg).

    Scale shape: tf is one map-side-combined hash-agg on (doc, term);
    document frequency is a second hash-agg over the FIRST's output
    (rows = distinct doc-term pairs, far smaller than token stream);
    N rides as a broadcast 1-row aggregate; the per-doc top-k is a
    rank-window that AQE executes as WindowGroupLimit (partial top-k on
    the map side, no full sort of the scored stream).

    Output: (id, term, tf, df_docs, score_micro, rank).
    """
    toks = F.split(normalized_text(text_col), " ")
    ex = df.select(F.col(id_col).alias("id"), F.explode(toks).alias("term")).filter(
        F.col("term") != ""
    )
    # one tokenize pass: tf is materialized once and both the document
    # frequencies and the corpus doc count derive from it (the plan
    # otherwise re-derived the tokenize 3x — tf, df and ndocs each
    # re-scanned and re-exploded the corpus)
    tf = (
        ex.groupBy("id", "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df_docs"))
    ndocs = tf.agg(F.count_distinct("id").alias("ndocs"))
    scored = (
        tf.join(dfreq, "term")
        .join(F.broadcast(ndocs))
        .withColumn(
            "score_micro",
            F.floor(
                F.col("tf") * F.log(F.col("ndocs") / F.col("df_docs")) * 1_000_000 + F.lit(0.5)
            ).cast("long"),
        )
    )
    from pyspark.sql import Window  # noqa: PLC0415

    w = Window.partitionBy("id").orderBy(F.col("score_micro").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("id", "term", "tf", "df_docs", "score_micro", "rank")
    )


def pmi_bigrams(
    df: DataFrame,
    k: int = 20,
    min_count: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level collocation mining: top-k adjacent-word bigrams by
    pointwise mutual information — the classic phrase detector
    (word2vec-style phrase merging, index phrase extraction).

    PMI = ln( p(ab) / (p(a) p(b)) ) with p(ab) over the bigram stream
    and p(a) over the unigram stream; ``min_count`` suppresses the
    low-count noise PMI is notorious for. The score quantizes to an
    integer micro value BEFORE ranking (the engine-portable rank-key
    contract, as ``tfidf_topk``), ties break bigram-ascending.

    Scale shape: unigram and bigram counts are both map-side-combined
    hash-aggs; the two join-backs are on the (small) distinct-bigram
    stream, not the token stream; corpus totals ride as broadcast 1-row
    aggregates; the final top-k is a TakeOrdered, never a full sort.

    Output: (bigram, n_ab, n_a, n_b, pmi_micro) — k rows.
    """
    toks = F.split(normalized_text(text_col), " ")
    t = df.select(F.col(id_col).alias("id"), toks.alias("__t")).filter(F.size("__t") > 0)
    # two tokenize passes total: the unigram and bigram count tables are
    # each materialized once, and every other input derives from them —
    # ua/ub/n_uni re-read the vocab table instead of re-exploding the
    # corpus (3 extra passes before), and the corpus bigram total is the
    # sum over the bigram table (sum of per-doc size-1 == total pair
    # occurrences), saving a 5th pass
    uni = (
        t.select(F.explode("__t").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n_w"))
        .localCheckpoint(eager=False)
    )
    big_all = (
        t.select(
            F.explode(
                F.when(
                    F.size("__t") >= 2,
                    F.transform(
                        F.sequence(F.lit(0), F.size("__t") - 2),
                        lambda i: F.struct(
                            F.element_at("__t", i + 1).alias("a"),
                            F.element_at("__t", i + 2).alias("b"),
                        ),
                    ),
                ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
            ).alias("bg")
        )
        .select(F.col("bg.a").alias("a"), F.col("bg.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_ab"))
        .localCheckpoint(eager=False)
    )
    big = big_all.filter(F.col("n_ab") >= min_count)
    n_uni = uni.agg(F.sum("n_w").alias("n_uni"))
    n_big_total = big_all.agg(F.sum("n_ab").alias("n_big"))
    ua = uni.select(F.col("w").alias("a"), F.col("n_w").alias("n_a"))
    ub = uni.select(F.col("w").alias("b"), F.col("n_w").alias("n_b"))
    scored = (
        big.join(ua, "a")
        .join(ub, "b")
        .join(F.broadcast(n_uni))
        .join(F.broadcast(n_big_total))
        .withColumn(
            "pmi_micro",
            F.floor(
                F.log(
                    (F.col("n_ab") / F.col("n_big"))
                    / ((F.col("n_a") / F.col("n_uni")) * (F.col("n_b") / F.col("n_uni")))
                )
                * 1_000_000
                + F.lit(0.5)
            ).cast("long"),
        )
        .withColumn("bigram", F.concat_ws(" ", "a", "b"))
    )
    return (
        scored.orderBy(F.col("pmi_micro").desc(), F.col("bigram").asc())
        .limit(k)
        .select("bigram", "n_ab", "n_a", "n_b", "pmi_micro")
    )


def inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
    max_df_ratio: float = 0.5,
) -> DataFrame:
    """Skew-aware inverted index: one row per surviving token with its
    document frequency, total term frequency, and the posting list
    encoded as a ``"doc:tf doc:tf ..."`` string sorted by doc id.

    Skew is handled BEFORE any posting list exists: term frequencies are
    first combined map-side per (token, doc), then a lightweight
    (token -> df) aggregate joined with the broadcast corpus size prunes
    stopword-grade tokens (df > max_df_ratio * n_docs) and hapax noise
    (df < min_df) *before* the per-token ``collect_list`` — so the
    heaviest keys, exactly the ones that would blow a reducer at 100 TB,
    never reach the list-building shuffle, and every surviving posting
    list is bounded by max_df_ratio * n_docs by construction. For
    web-scale corpora, cap further with a per-token top-k by tf
    (WindowGroupLimit) before the collect.
    """
    toks = F.split(normalized_text(text_col), " ")
    t = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(toks).alias("token"),
    ).filter(F.col("token") != "")
    # one tokenize pass: tf is materialized once; the df/total_tf prune
    # relation and the posting-list build both read it back instead of
    # re-exploding the corpus
    tf = (
        t.groupBy("token", "doc_id")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    dfreq = tf.groupBy("token").agg(
        F.count("*").alias("df"), F.sum("tf").alias("total_tf")
    )
    n = docs.agg(F.count("*").alias("n_docs"))
    keep = (
        dfreq.join(F.broadcast(n))
        .filter((F.col("df") >= min_df) & (F.col("df") <= max_df_ratio * F.col("n_docs")))
        .select("token", "df", "total_tf")
    )
    postings = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("doc_id", "tf"))),
            lambda s: F.concat_ws(":", s["doc_id"], s["tf"]),
        ),
        " ",
    )
    return (
        tf.join(keep, "token")
        .groupBy("token", "df", "total_tf")
        .agg(postings.alias("postings"))
    )


def bm25_rank(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_query_terms: int = 3,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 ranking of the corpus against a deterministic query
    term set — the query-time half of a search index (ii01 is the
    storage half). Query terms are the ``n_query_terms`` tokens whose
    document frequency is closest to n_docs/2 (ties by token asc): the
    mid-frequency band where BM25 actually discriminates.

    Shape at 100 TB: the corpus is tokenized ONCE — the (doc, term)
    tf aggregate is ``localCheckpoint``-materialized and every other
    input (dl = sum of tf per doc, df, the corpus stats) derives from
    that far-smaller table instead of re-exploding the token stream
    (the plan otherwise re-derived the tokenize 4x: tf, dl, df and
    stats each re-scanned the corpus). df and the query-term pick are
    vocabulary-sized; the scoring join hits only postings of the few
    query terms (broadcast), so scan cost is O(matching postings), not
    O(corpus x vocabulary). Ranking is row_number + filter — the
    WindowGroupLimit pattern, a per-partition partial top-k before the
    single final window. Scores floor to integer micro-units after an
    expression kept IDENTICAL on both engines (same assoc/order), the
    tx06/tx13 portability contract.
    """
    toks = F.split(normalized_text(text_col), " ")
    t = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(toks).alias("token")
    ).filter(F.col("token") != "")
    tf = (
        t.groupBy("doc_id", "token")
        .agg(F.count("*").cast("long").alias("tf"))
        .localCheckpoint(eager=False)
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("long").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    dfreq = tf.groupBy("token").agg(F.count("*").cast("long").alias("df"))
    qterms = (
        dfreq.join(F.broadcast(stats))
        .withColumn("__dist", F.abs(F.col("df") * 2 - F.col("n_docs")))
        .orderBy(F.col("__dist").asc(), F.col("token").asc())
        .limit(n_query_terms)
        .select("token", "df", "n_docs", "avgdl")
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    scored = (
        tf.join(F.broadcast(qterms), "token")
        .join(dl, "doc_id")
        .withColumn(
            # floored to micro PER TERM, then integer-summed: float
            # addition is order-sensitive, integer addition is not —
            # the contract that keeps ranks partition/engine-invariant
            "__term_micro",
            F.floor(
                idf
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (F.col("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (F.col("dl") / F.col("avgdl"))))
                * 1_000_000
                + F.lit(0.5)
            ).cast("long"),
        )
        .groupBy("doc_id", "dl")
        .agg(
            F.count("*").cast("long").alias("n_terms_matched"),
            F.sum("__term_micro").cast("long").alias("score_micro"),
        )
    )
    from pyspark.sql import Window  # noqa: PLC0415

    # global top-k: orderBy+limit is TakeOrderedAndProject (per-partition
    # partial top-k, no single-partition window over the full scored
    # set); the rank window then runs over k rows only
    topk = scored.orderBy(F.col("score_micro").desc(), F.col("doc_id").asc()).limit(k)
    w = Window.orderBy(F.col("score_micro").desc(), F.col("doc_id").asc())
    return topk.select(
        "doc_id",
        "dl",
        "n_terms_matched",
        "score_micro",
        F.row_number().over(w).cast("long").alias("rank"),
    )


def readability_features(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Flesch reading-ease per document from the classic proxies:
    whitespace words, [.!?]+ sentence breaks, vowel-group syllable
    estimates (>= 1 per word). The standard cheap readability gate for
    training-corpus curation. Map-only column algebra (one pass, no
    Python); the score floors to integer micro-units after a float
    expression kept identical across engines. Degenerate docs (no words
    or no sentences) yield NULL score rather than a division error."""
    toks = F.filter(F.split(normalized_text(text_col), " "), lambda x: x != F.lit(""))
    syl = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, w: acc
        + F.greatest(F.lit(1), F.size(F.regexp_extract_all(w, F.lit("[aeiouy]+"), 0))).cast("long"),
    )
    sents = F.size(
        F.filter(F.split(F.col(text_col), r"[.!?]+"), lambda x: F.trim(x) != F.lit(""))
    )
    n_words = F.size(toks).cast("long")
    pre = docs.select(
        F.col(id_col).alias("doc_id"),
        n_words.alias("n_words"),
        sents.cast("long").alias("n_sentences"),
        syl.alias("n_syllables"),
    )
    return pre.withColumn(
        "flesch_micro",
        F.when(
            (F.col("n_words") > 0) & (F.col("n_sentences") > 0),
            F.floor(
                (
                    F.lit(206.835)
                    - F.lit(1.015) * (F.col("n_words").cast("double") / F.col("n_sentences").cast("double"))
                    - F.lit(84.6) * (F.col("n_syllables").cast("double") / F.col("n_words").cast("double"))
                )
                * 1_000_000
                + F.lit(0.5)
            ).cast("long"),
        ),
    )


def heldout_unigram_logprob(
    train: DataFrame,
    score: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Held-out perplexity gate: score one corpus half under a unigram
    LM fit on the OTHER half, add-one smoothed over the train
    vocabulary plus an UNK class (p(w) = (c(w)+1) / (N + V + 1)).
    The eval-discipline upgrade of ``unigram_logprob``'s self-scored
    variant — self-scoring lets a doc inflate its own token
    probabilities, exactly the leakage a quality gate must not have.

    Same physical shape as tx06: one map-side-combined vocab count on
    the train half, broadcast scalars for N/V, a token join for the
    score half (train vocabularies AQE-broadcast), and exact integer
    micro means. Output: (id, n_tokens, n_oov, mean_logprob)."""
    toks = F.split(normalized_text(text_col), " ")
    tr = train.select(F.explode(toks).alias("tok")).filter(F.col("tok") != "")
    counts = tr.groupBy("tok").agg(F.count("*").alias("tok_n"))
    scalars = counts.agg(
        F.sum("tok_n").alias("train_n"), F.count("*").alias("train_v")
    )
    ex = score.select(F.col(id_col).alias("id"), F.explode(toks).alias("tok")).filter(
        F.col("tok") != ""
    )
    scored = (
        ex.join(counts, "tok", "left")
        .join(F.broadcast(scalars))
        .withColumn(
            "logp",
            F.log(
                (F.coalesce(F.col("tok_n"), F.lit(0)) + 1)
                / (F.col("train_n") + F.col("train_v") + 1)
            ),
        )
    )
    return scored.groupBy("id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum(F.col("tok_n").isNull().cast("long")).cast("long").alias("n_oov"),
        aggregates.exact_avg("logp").alias("mean_logprob"),
    )


def _mask_bucket(id_col: Column, pos: Column, salt: str) -> Column:
    """Per-(doc, position) deterministic percent bucket for MLM masking
    (the md5-prefix portable-hash contract of operators/sampling.py)."""
    h = F.md5(F.concat(id_col.cast("string"), F.lit(":"), pos.cast("string"), F.lit(salt)))
    return F.conv(F.substring(h, 1, 7), 16, 10).cast("long") % 100


def mlm_masking_plan(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mask_pct: int = 15,
    salt: str = "mlm-v1",
    preview_n: int = 10,
) -> DataFrame:
    """Masked-language-model corruption PLAN: which token positions of
    each document an MLM pretraining run masks, decided by a
    deterministic keyed hash of (doc, position) — re-runs, task
    retries, and engines all agree, and changing the salt re-rolls
    every mask (the epoch knob). Emits per doc: ``n_tokens``,
    ``n_masked``, ``first_masked_pos`` (1-based; NULL when nothing
    masks), and ``masked_preview`` — the first ``preview_n`` tokens
    with '[MASK]' substituted, certifying the substitution itself.

    Entirely array algebra on projected columns — no explode, no
    shuffle, no window: a pure map over the corpus scan, which is the
    only shape token-level corruption can afford at 100 TB."""
    did = F.col(id_col)
    # tokenization is the heavy input — materialize it ONCE as a projected
    # column (Catalyst does not CSE repeated subexpressions; see the
    # token_set_parts precedent in functions/scoring.py)
    staged = df.filter(F.col(text_col).isNotNull()).select(
        did, whitespace_tokens(text_col).alias("__toks")
    )
    # sequence(1, 0) is DESCENDING [1, 0] in Spark (empty in DuckDB) —
    # guard the zero-token case explicitly or position 0/1 get "masked"
    positions = F.when(
        F.size("__toks") > 0, F.sequence(F.lit(1), F.size("__toks"))
    ).otherwise(F.array().cast("array<int>"))
    masked_pos = F.filter(
        positions,
        lambda i: _mask_bucket(did, i, salt) < mask_pct,
    )
    preview = F.array_join(
        F.transform(
            F.slice(F.col("__toks"), 1, preview_n),
            lambda t, i: F.when(_mask_bucket(did, i + 1, salt) < mask_pct, F.lit("[MASK]")).otherwise(t),
        ),
        " ",
    )
    return staged.select(
        did, F.size("__toks").cast("long").alias("n_tokens"), masked_pos.alias("__mpos"), preview.alias("masked_preview")
    ).select(
        id_col,
        "n_tokens",
        F.size("__mpos").cast("long").alias("n_masked"),
        F.try_element_at("__mpos", F.lit(1)).cast("long").alias("first_masked_pos"),
        "masked_preview",
    )


def feature_hash_counts(
    df: DataFrame,
    text_col: str = "text",
    n_buckets: int = 256,
    top_k: int = 20,
) -> DataFrame:
    """The hashing trick: bag-of-words WITHOUT a vocabulary dictionary.

    Each (lowercased) whitespace token is hashed straight to one of
    ``n_buckets`` feature slots via the first 8 hex digits of md5 (the
    repo's portable cross-engine hash — Spark ``conv(substr(md5..))`` ==
    DuckDB ``('0x'||substr(md5..))::BIGINT``). Emits the ``top_k``
    heaviest buckets with their distinct-token count — the collision
    diagnostic that tells you whether ``n_buckets`` is sized right.

    Scale: no vocab build, no broadcast dictionary, no second pass —
    one map-only explode + ONE hash aggregation, then a
    TakeOrderedAndProject for the top-k (never a single-partition
    window). This is why feature hashing is the 100 TB baseline
    featurizer: memory is O(n_buckets) regardless of corpus size.
    """
    toks = df.filter(F.col(text_col).isNotNull()).select(
        F.explode(whitespace_tokens(F.lower(F.col(text_col)))).alias("tok")
    )
    hashed = toks.select(
        "tok",
        (F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long") % n_buckets).alias(
            "bucket"
        ),
    )
    agg = hashed.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.countDistinct("tok").cast("long").alias("n_distinct_tokens"),
    )
    return agg.orderBy(F.desc("n_tokens"), F.asc("bucket")).limit(top_k)


def vocab_coverage_curve(
    df: DataFrame,
    text_col: str = "text",
    ks: tuple[int, ...] = (10, 50, 100, 500),
) -> DataFrame:
    """Corpus token coverage of a top-k frequency-truncated vocabulary,
    for each k in ``ks`` — the curve that sizes a tokenizer vocab.

    The vocab relation can itself be huge (n-gram vocabularies), so the
    rank is NOT an unpartitioned window over it: ``orderBy().limit(
    max(ks))`` plans a TakeOrderedAndProject (per-partition top-k +
    merge), and only the surviving ``max(ks)`` rows — a constant — get
    the row_number. Totals still come from the full counts relation.
    Ties rank deterministically (count DESC, token ASC).
    """
    counts = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.explode(whitespace_tokens(F.lower(F.col(text_col)))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    from pyspark.sql import Window  # noqa: PLC0415

    top = counts.orderBy(F.desc("cnt"), F.asc("tok")).limit(max(ks))
    w = Window.orderBy(F.desc("cnt"), F.asc("tok"))
    ranked = top.select("tok", "cnt", F.row_number().over(w).alias("rk"))
    kdf = counts.sparkSession.createDataFrame([(int(k),) for k in ks], "k long")
    per_k = (
        F.broadcast(kdf)
        .join(ranked, F.col("rk") <= F.col("k"))
        .groupBy("k")
        .agg(F.sum("cnt").cast("long").alias("covered_tokens"))
    )
    totals = counts.agg(
        F.count(F.lit(1)).cast("long").alias("vocab_size"),
        F.sum("cnt").cast("long").alias("total_tokens"),
    )
    return (
        per_k.join(F.broadcast(totals))
        .select(
            "k",
            "vocab_size",
            "covered_tokens",
            "total_tokens",
            F.expr(
                "CASE WHEN total_tokens > 0"
                " THEN covered_tokens * CAST(1000000 AS BIGINT) DIV total_tokens END"
            ).alias("coverage_micro"),
        )
    )
