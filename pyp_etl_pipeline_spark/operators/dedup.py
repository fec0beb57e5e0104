"""Corpus-level deduplication operators (scale extension of E2/J2).

Five strategies over a document corpus:
- exact: hash-groupBy on a normalized fingerprint (md5)
- n-gram Jaccard: word-shingle blocking join + exact Jaccard on shingle sets
- MinHash-LSH: banded min-hash signatures (md5-derived, engine-portable),
  band-bucket self-join, Jaccard verification
- SimHash: 64-bit majority-vote fingerprint via a vectorized Pandas UDF,
  near-dup = small Hamming distance within blocking buckets
- embedding cosine near-dup: see ``operators/similarity.py``

Scale notes: every strategy is blocking-based — candidate pairs come from
equi-joins on derived keys (fingerprint / shingle / band-minhash / simhash
prefix), never from a cross join. Pair outputs are canonicalized
(id_a < id_b) to halve the shuffle. md5 is used as the portable hash so the
DuckDB oracle can reproduce signatures bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pyp_etl_pipeline_spark.functions.text import collapse_whitespace


def normalized_text(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.trim(collapse_whitespace(F.lower(c)))


def fingerprint(c: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of normalized text."""
    return F.md5(normalized_text(c))


def exact_duplicates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups with >1 identical normalized text. Returns
    (fp, dup_count, min_id) — one row per duplicate cluster."""
    return (
        df.select(F.col(id_col).alias("id"), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("dup_count"), F.min("id").alias("keep_id"))
        .filter(F.col("dup_count") > 1)
    )


def dedup_exact(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the lowest-id document per identical normalized text."""
    w_min = (
        df.select(F.col(id_col).alias("__id"), fingerprint(text_col).alias("__fp"))
        .groupBy("__fp")
        .agg(F.min("__id").alias("__keep"))
    )
    return df.join(
        w_min, (fingerprint(text_col) == F.col("__fp")) & (F.col(id_col) == F.col("__keep")), "inner"
    ).drop("__fp", "__keep")


def word_shingles(c: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the normalized text.

    Deliberately ``array_join(slice(...))`` per position, NOT n
    ``F.get``/``element_at`` accesses: get() is RuntimeReplaceable and
    expands to a sizeable null-guard tree per access, which multiplied
    across the transform lambda and the self-join's duplicated branches
    blew Catalyst ANALYSIS time from ~5s to ~12s per dd02 call at sf0.1
    (execution itself is <0.2s either way — planning, not compute, is
    what this expression shape protects)."""
    toks = F.split(normalized_text(c), " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    sh = F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    return F.array_distinct(F.when(F.size(toks) >= n, sh).otherwise(F.array(F.array_join(toks, " "))))


# Plan-stat crossover for shingle_pairs_jaccard's strategy auto-select
# (VERDICT r10 item 4): below this estimated input size the count-based
# full shingle index wins (fewer stages, no md5/sort/verify constant
# factors), above it the SSJoin prefix filter wins (sublinear measured
# exponent). Calibrated at the dd02 operating point (t=0.5, min-of-3
# quiet): count 1.66 s / prefix 6.25 s at sf0.1 (0.57 MB scan stat) and
# count 23.4 s / prefix 50.6 s at the 10x upscale (5.8 MB) — exponents
# 1.15 (superlinear) vs 0.91 (sublinear), so the fitted power-law curves
# cross at ~250x sf0.1 ~= 150 MB of scan bytes; 128 MiB is the threshold.
# Higher jaccard thresholds shift the real crossover LOWER (prefix keeps
# |X|-ceil(t|X|)+1 postings, so pruning strengthens with t); 128 MiB is
# conservative for t>0.5. See SCALE.md "shingle-join strategy crossover".
PREFIX_AUTO_BYTES = 128 << 20


# A stats().sizeInBytes() at/near Long.MaxValue means "unknown", not
# "huge": LogicalRDD (memory tables) reports spark.sql.defaultSizeInBytes
# = Long.MaxValue. Anything above this sentinel is treated as unknown.
_STATS_UNKNOWN = 1 << 60

# Bounded row probe for unknown-stat relations: the measured count/prefix
# crossover (~150 MB parquet scan bytes at t=0.5) corresponds to ~1.5M
# documents, so a relation with fewer than this many rows is firmly on
# the count path's side. limit().count() stops at the cap — O(probe), not
# O(relation) — and only ever runs for stats-less sources.
_PROBE_ROWS = 500_000


def _prefix_auto(df: DataFrame) -> bool:
    """Pick the physical strategy from Catalyst's plan-time size estimate
    (parquet file bytes propagated through the optimized plan — the same
    statistic autoBroadcastJoinThreshold consults, ZERO extra jobs). When
    the estimate is unknown (memory tables report MaxValue; VERDICT r11
    item 5 — the old behavior assumed huge and silently put toy-scale
    library callers on the 4x-slower prefix path), fall back to a
    bounded ``limit(probe).count()``: under the cap => provably small =>
    count path; at the cap => could be huge => prefix, the safe-at-scale
    default. ``prefix_filter`` overrides both."""
    try:
        est = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # noqa: BLE001 — stats unavailable, not an error
        est = None
    if est is not None and est < _STATS_UNKNOWN:
        return est > PREFIX_AUTO_BYTES
    try:
        return df.limit(_PROBE_ROWS).count() >= _PROBE_ROWS
    except Exception:  # noqa: BLE001 — unprobe-able source: assume huge
        return True


def shingle_pairs_jaccard(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    prefix_filter: bool | None = None,
) -> DataFrame:
    """n-gram Jaccard near-dup pairs via shingle-blocking join + exact
    Jaccard. Both physical strategies return identical results:

    - count-based: index EVERY shingle, count shared shingles
      per pair in one groupBy. A size-band filter (jaccard >= t implies
      min/max set-size ratio >= t; shared <= min and j is increasing in
      shared) rides the join losslessly. Fewer stages — fastest while the
      per-shingle fan-out fits comfortably in the cluster (measured 1.66s
      vs 6.25s for the prefix variant at sf0.1/t=0.5 on local[32]).
    - ``prefix_filter=True`` (SSJoin/PPJoin family): order each doc's
      shingles by a global total order (md5 — deterministic,
      frequency-agnostic); sets with jaccard >= t MUST share an element
      within their first ``|X| - ceil(t*|X|) + 1`` elements, so only those
      prefixes are indexed — exact, zero recall loss, and the candidate
      fan-out drops by ~(1-t)^2. The scale path when the corpus (or a hot
      shingle) makes the full fan-out the bottleneck.
    - ``prefix_filter=None`` (default) auto-selects on Catalyst's
      plan-time input-size statistic vs ``PREFIX_AUTO_BYTES``: the count
      path's fan-out grows superlinearly (measured 10x exponent 1.15 vs
      the prefix path's 0.91 — see SCALE.md), so small-to-medium corpora
      take the low-latency count path and anything past the extrapolated
      crossover (~150 MB scan bytes at t=0.5) takes the prefix path —
      which also bounds the hot-shingle quadratic blowup (boilerplate
      grams) that real 100 TB corpora have and the synthetic upscale
      lacks. The choice never changes RESULTS, only the physical plan.
    """
    if prefix_filter is None:
        prefix_filter = _prefix_auto(df)
    docs = df.select(F.col(id_col).alias("id"), word_shingles(text_col, n).alias("sh")).withColumn(
        "n_sh", F.size("sh")
    )
    size_band = (
        F.least(F.col("n_a"), F.col("n_b")) / F.greatest(F.col("n_a"), F.col("n_b")) >= threshold
    )

    if not prefix_filter:
        ex = docs.select("id", "n_sh", F.explode("sh").alias("shingle"))
        a = ex.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"), "shingle")
        b = ex.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"), "shingle")
        return (
            # shuffle-hash instead of sort-merge: the join key is a text
            # shingle, so SMJ pays a per-partition string sort that the
            # hash join skips (measured ~8% on the sf0.1 bench, min-of-3);
            # per-partition build sides are bounded by the shingle
            # fan-out, which the blocking design already keeps in memory
            a.hint("shuffle_hash").join(b, ["shingle"])
            .filter((F.col("id_a") < F.col("id_b")) & size_band)
            .groupBy("id_a", "id_b", "n_a", "n_b")
            .agg(F.count("*").alias("shared"))
            .withColumn("jaccard", F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared")))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
        )

    hashed = docs.withColumn("hs", F.array_sort(F.transform("sh", lambda x: F.md5(x))))
    prefix_len = (F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")) + 1).cast("int")
    prefixed = hashed.select("id", "n_sh", F.explode(F.slice("hs", F.lit(1), prefix_len)).alias("h"))
    a = prefixed.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"), "h")
    b = prefixed.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"), "h")
    cands = (
        a.join(b, "h")
        .filter((F.col("id_a") < F.col("id_b")) & size_band)
        .select("id_a", "id_b")
        .distinct()
    )
    sets_ = docs.select("id", "sh")
    return (
        cands.join(sets_.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(sets_.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .withColumn("shared", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("jaccard", F.col("shared") / (F.size("sh_a") + F.size("sh_b") - F.col("shared")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


LSH_BANDS = 32
LSH_ROWS = 3  # minhashes per band; threshold ~ (1/b)^(1/r) ~ 0.31
LSH_PRIME = 1_000_000_007


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    bands: int = LSH_BANDS,
    rows: int = LSH_ROWS,
) -> DataFrame:
    """Banded min-hash signatures: ``bands`` x ``rows`` hash family; per
    doc, minhash_i = min over its shingles of hash_i; band signature =
    concat of that band's ``rows`` minhashes.

    Classic b x r LSH: two docs become candidates iff ALL ``rows``
    minhashes agree in some band, giving the s-curve collision probability
    1 - (1 - j^r)^b — for b=32, r=3: j=0.5 -> 99%, j=0.1 -> 3%. (r=1
    banding would make even 5%-similar docs collide with high probability,
    flooding verification with junk pairs.)

    The hash family uses the Kirsch-Mitzenmacher two-hash trick: ONE md5
    per shingle supplies x1, x2 (two 28-bit ints from hex substrings), and
    hash_i = (x1 + (i+1)*(x2+1)) mod p — 96 multiply-adds instead of 96
    md5 calls per shingle. Pure md5 + integer arithmetic, no RNG, so the
    DuckDB oracle reproduces signatures bit-for-bit.

    Physical shape: per-document shingles are an ARRAY column, so the
    whole b*r minimization happens IN-ROW — one ``aggregate`` fold over
    the shingle array carrying a b*r-long running-min array
    (``zip_with(acc, hashes, least)``). Zero shuffle, zero explode, no
    aggregation buffers: the signature stage is map-only and
    embarrassingly parallel, which is exactly the 100 TB shape (the
    previous explode + groupBy with b*r independent ``min()`` buffers
    shuffled a 96-column partial per doc and ran 4-20x slower at sf0.1).
    Each intermediate (md5 array, x1/x2, running mins) is projected as
    its own column so Catalyst evaluates it once (no CSE inside lambdas).

    Output: one row per (id, band) with ``sig``.
    """
    k = bands * rows
    # null text -> null shingle array; drop those docs up front (the
    # DuckDB oracle's NULL band signatures never equi-join, so null-text
    # docs produce no pairs there either — and an "all null docs share
    # one bucket" signature would be a skew bomb at scale)
    docs = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"), word_shingles(text_col, n).alias("sh")
    )
    d = docs.select("id", F.transform("sh", lambda s: F.md5(s)).alias("__hs"))
    d = d.select(
        "id",
        F.transform("__hs", lambda h: F.conv(F.substring(h, 1, 7), 16, 10).cast("long")).alias("__x1"),
        F.transform("__hs", lambda h: F.conv(F.substring(h, 8, 7), 16, 10).cast("long")).alias("__x2"),
    )
    # one struct per shingle: (x1, y = x2+1) — y precomputed so the inner
    # fold is a bare multiply-add per lane
    d = d.select(
        "id",
        F.zip_with("__x1", "__x2", lambda a, b: F.struct(a.alias("x1"), (b + 1).alias("y"))).alias("__p"),
    )
    # running-min fold: init = p (strict upper bound of any hash mod p);
    # word_shingles never yields an empty array, so no doc keeps init
    init = F.array_repeat(F.lit(LSH_PRIME).cast("long"), k)
    mins = F.aggregate(
        "__p",
        init,
        lambda acc, p: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(1), F.lit(k)),
                lambda i: (p["x1"] + i.cast("long") * p["y"]) % LSH_PRIME,
            ),
            lambda u, v: F.least(u, v),
        ),
    )
    d = d.select("id", F.transform(mins, lambda e: e.cast("string")).alias("__ms"))
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.array_join(F.slice("__ms", b * rows + 1, rows), ":").alias("sig"),
            )
            for b in range(bands)
        ]
    )
    return d.select("id", F.explode(band_structs).alias("bs")).select(
        "id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash-LSH candidate pairs, verified with exact shingle Jaccard.
    Candidates come from the banded signature self-join; with b=32 x r=3
    the candidate set is already near the true near-dup set, so
    verification touches few pairs.

    The signature table is eagerly ``localCheckpoint``-ed before the
    self-join: the minhash fold is built from higher-order functions,
    whose ``NamedLambdaVariable``s defeat plan canonicalization — without
    the checkpoint ReuseExchange misses and BOTH join legs recompute the
    full signature pipeline. The checkpoint is tiny (one (id, band, sig)
    row per doc-band) and is the cluster-scale shape too: signatures are
    worth materializing once per dedup run."""
    sig = minhash_signatures(df, id_col, text_col, n).localCheckpoint(eager=True)
    a = sig.select(F.col("id").alias("id_a"), "band", "sig")
    b = sig.select(F.col("id").alias("id_b"), "band", "sig")
    # shuffle-hash for the same reason as shingle_pairs_jaccard: the join
    # key is a (band, signature-string) pair and SMJ's per-partition
    # string sort is pure overhead next to a hash build
    cands = (
        a.hint("shuffle_hash")
        .join(b, ["band", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )

    docs = df.select(F.col(id_col).alias("id"), word_shingles(text_col, n).alias("sh"))
    verified = (
        cands.join(docs.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(docs.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .withColumn("shared", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("jaccard", F.col("shared") / (F.size("sh_a") + F.size("sh_b") - F.col("shared")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return verified


def save_minhash_index(
    docs: DataFrame,
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    n_buckets: int = 32,
) -> None:
    """Persist the corpus MinHash signature index as a managed table
    BUCKETED BY (band, sig) — the incremental dedup join key. Joining a
    new batch's signatures against this table then shuffles ONLY the
    batch side: the corpus index's exchange was paid once at write time
    and is amortized over every subsequent ingest (the property pinned
    in test_dedup.test_minhash_index_join_shuffles_batch_only). At 100 TB
    the index is the (id, band, sig) relation — tiny next to the corpus
    text — and each ingest reads it in place."""
    from pyp_etl_pipeline_spark.sources.bucketed import write_bucketed  # noqa: PLC0415

    sig = minhash_signatures(docs, id_col, text_col, n)
    write_bucketed(sig, table, ["band", "sig"], n_buckets=n_buckets)


def load_minhash_index(spark, table: str) -> DataFrame:
    """Catalog read of a ``save_minhash_index`` table (bucket metadata
    only survives the catalog path) — pass as ``corpus_signatures`` to
    ``minhash_lsh_pairs_incremental``."""
    return spark.table(table)


def minhash_lsh_pairs_incremental(
    new_docs: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    corpus_signatures: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs of a NEW ingest batch against an EXISTING corpus,
    plus within-batch pairs — the incremental path a 100 TB pipeline
    actually runs. Re-deduping the whole corpus per ingest is a
    corpus-sized self-join every batch; here the corpus side contributes
    only its (id, band, sig) index (pass ``corpus_signatures`` to read a
    previously persisted index and skip even the signature recompute),
    and the per-batch cost is O(batch signatures) + bucket collisions +
    verification of the candidate pairs.

    Output: (id_a, id_b, source, jaccard) with id_a always the new-batch
    doc; source = 'corpus' for batch-vs-corpus pairs, 'batch' for pairs
    inside the new batch (id_a < id_b). Same b x r banded family and
    exact-Jaccard verification as ``minhash_lsh_pairs`` — running this
    per batch over a growing corpus yields exactly the pairs the full
    recompute would have found between those documents."""
    sig_new = minhash_signatures(new_docs, id_col, text_col, n).localCheckpoint(eager=True)
    # The corpus index feeds TWO consumers — the cross-join and the
    # verification restriction below — so it is materialized once (lazy;
    # rides the first action). In production this IS the persisted index
    # the docstring describes (pass ``corpus_signatures`` to skip the
    # recompute entirely); the r14 change makes the verification shingle
    # pass O(colliding docs) instead of O(corpus) — per-ingest cost must
    # not include a corpus-wide shingle pass (VERDICT r13 item 3).
    sig_old = (
        corpus_signatures
        if corpus_signatures is not None
        else minhash_signatures(corpus, id_col, text_col, n).localCheckpoint(eager=False)
    )
    a = sig_new.select(F.col("id").alias("id_a"), "band", "sig")
    cross = (
        a.hint("shuffle_hash")
        .join(sig_old.select(F.col("id").alias("id_b"), "band", "sig"), ["band", "sig"])
        .select("id_a", "id_b", F.lit("corpus").alias("source"))
    )
    within = (
        a.hint("shuffle_hash")
        .join(sig_new.select(F.col("id").alias("id_b"), "band", "sig"), ["band", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.lit("batch").alias("source"))
    )
    cands = cross.unionByName(within).distinct()

    sh_new = new_docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"), word_shingles(text_col, n).alias("sh")
    )
    # a corpus doc can appear in a candidate pair ONLY if one of its
    # buckets collides with a batch signature — semi-join the stored
    # index against the batch index and shingle just those docs (a
    # superset of every cross-pair id_b, so the inner join below is
    # unchanged); the semi-join is bucket-sized, the saved work is the
    # corpus-wide shingle pass
    hit_old = sig_old.join(
        sig_new.select("band", "sig"), ["band", "sig"], "left_semi"
    ).select(F.col("id").alias(id_col))
    sh_old = (
        corpus.join(hit_old, id_col, "left_semi")
        .filter(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("id"), word_shingles(text_col, n).alias("sh"))
    )
    # the b-side shingles come from the corpus for cross pairs and from
    # the batch for within pairs — one unioned lookup keyed by source
    sh_b = sh_old.withColumn("source", F.lit("corpus")).unionByName(
        sh_new.withColumn("source", F.lit("batch"))
    )
    return (
        cands.join(sh_new.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(
            sh_b.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"), "source"),
            ["id_b", "source"],
        )
        .withColumn("shared", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("jaccard", F.col("shared") / (F.size("sh_a") + F.size("sh_b") - F.col("shared")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "source", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash_fingerprints(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash via a vectorized Pandas UDF (Arrow-batched).

    Per document: token -> 64-bit hash (md5 low bits); bitwise majority
    vote weighted by term frequency -> fingerprint. Near-dups share a small
    Hamming distance. Python is unavoidable for the bit-vote; it runs
    vectorized per batch, not per row.
    """
    from pyspark.sql.types import LongType  # noqa: PLC0415

    # No type hints on the inner function: under ``from __future__ import
    # annotations`` they stringify and Spark can't infer the eval type.
    # useArrow=False pins the classic pandas Series->Series scalar UDF.
    def _simhash64(texts):
        import hashlib  # noqa: PLC0415

        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        # md5 is pinned by the oracle twin (one 64-bit prefix per token),
        # but each distinct token needs hashing only once per batch —
        # corpora repeat vocabulary heavily, so the cache removes most of
        # the per-token Python work; the bit-vote is one matrix op per doc
        # instead of a per-token loop.
        shifts = np.arange(64, dtype=np.uint64)
        cache: dict = {}
        out = np.zeros(len(texts), dtype=np.int64)
        # a doc with no tokens has NO fingerprint (a majority vote over
        # zero tokens is undefined; fp=0 made every null/empty doc a
        # mutual near-dup — found by the null-injection sweep, r8)
        valid = np.zeros(len(texts), dtype=bool)
        for i, t in enumerate(texts):
            toks = (t or "").lower().split()
            if not toks:
                continue
            valid[i] = True
            hs = np.empty(len(toks), dtype=np.uint64)
            for j, tok in enumerate(toks):
                h = cache.get(tok)
                if h is None:
                    h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
                    cache[tok] = h
                hs[j] = h
            bits = (hs[:, None] >> shifts[None, :]) & np.uint64(1)
            votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
            fp = int(((votes > 0).astype(np.uint64) << shifts).sum())
            out[i] = fp - (1 << 64) if fp >= (1 << 63) else fp  # wrap to signed
        s = pd.Series(out, dtype="Int64")  # nullable: tokenless docs -> NULL
        s[~valid] = pd.NA
        return s

    import pandas as pd  # noqa: PLC0415

    _simhash64.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    simhash64 = F.pandas_udf(_simhash64, LongType())
    return df.select(F.col(id_col).alias("id"), simhash64(F.col(text_col)).alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs. Blocking: 4 x 16-bit key chunks — two docs
    within Hamming distance 3 of each other must agree on >= 1 chunk
    (pigeonhole), so the self-join runs per chunk, never all-pairs.
    Tokenless (null/empty) docs have no fingerprint and never pair."""
    fps = simhash_fingerprints(df, id_col, text_col).filter(F.col("simhash").isNotNull())
    chunks = fps.select(
        "id",
        "simhash",
        F.explode(
            F.array(*[F.struct(F.lit(i).alias("chunk"), F.shiftrightunsigned("simhash", i * 16).bitwiseAND(F.lit(0xFFFF)).alias("key")) for i in range(4)])
        ).alias("c"),
    ).select("id", "simhash", F.col("c.chunk").alias("chunk"), F.col("c.key").alias("key"))
    a = chunks.select(F.col("id").alias("id_a"), F.col("simhash").alias("h_a"), "chunk", "key")
    b = chunks.select(F.col("id").alias("id_b"), F.col("simhash").alias("h_b"), "chunk", "key")
    cands = a.join(b, ["chunk", "key"]).filter(F.col("id_a") < F.col("id_b")).select("id_a", "h_a", "id_b", "h_b").distinct()
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return cands.withColumn("hamming", hamming).filter(F.col("hamming") <= max_hamming).select("id_a", "id_b", "hamming")


def span_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
) -> DataFrame:
    """Corpus-wide duplicate-SPAN removal — the C4/RefinedWeb
    "remove duplicate lines across the corpus" step, adapted to
    unstructured text: each document's normalized text is chunked into
    consecutive non-overlapping ``k``-word spans, every span whose exact
    text already occurred earlier in the corpus (first occurrence =
    smallest ``(doc_id, span_idx)``) is dropped, and the surviving spans
    are re-joined in order. Unlike document-level dedup (dd01/dd03) this
    rewrites documents in place, which is how boilerplate (headers,
    navigation, license blocks) is actually removed from web corpora.

    Physical shape for 100 TB: chunking is map-only; first-occurrence
    election is ONE groupBy on the span fingerprint with a
    ``min(struct)`` aggregate — map-side combinable, so a boilerplate
    span repeated a billion times collapses to one row per map task
    before the shuffle (a window ``row_number`` over the same key would
    sort the full billion-row group instead — that is why the election
    is an aggregate, not a window). Join-back is keyed by fingerprint
    against the unique-per-fp winner set, then one groupBy(doc) rebuild.
    No window over corpus-sized groups, no skew bomb.

    Output: one row per input document —
    (doc_id, n_spans, n_kept, text) with ``text`` rebuilt from the kept
    spans ('' when every span was seen earlier).
    """
    docs = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"), F.split(normalized_text(text_col), " ").alias("toks")
    )
    n_spans = F.ceil(F.size("toks") / F.lit(k)).cast("int")
    base = docs.select("id", "toks", F.greatest(n_spans, F.lit(1)).alias("n_spans"))
    spans = base.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.col("n_spans") - 1),
                lambda i: F.array_join(F.slice("toks", i * k + 1, k), " "),
            )
        ).alias("idx", "span"),
    ).withColumn("fp", F.md5("span"))
    winners = spans.groupBy("fp").agg(F.min(F.struct("id", "idx")).alias("w"))
    kept = (
        spans.join(winners, "fp")
        .filter((F.col("id") == F.col("w.id")) & (F.col("idx") == F.col("w.idx")))
        .select("id", "idx", "span")
    )
    rebuilt = kept.groupBy("id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "span"))), lambda s: s["span"]
            ),
            " ",
        ).alias("text"),
    )
    return (
        base.select("id", "n_spans")
        .join(rebuilt, "id", "left")
        .select(
            F.col("id").alias("doc_id"),
            F.col("n_spans").cast("long").alias("n_spans"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("text", F.lit("")).alias("text"),
        )
    )


def exact_substring_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    gram: int = 40,
    sample_mod: int = 1,
) -> DataFrame:
    """Cross-document exact substring duplication audit — the Lee et al.
    ("Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499) exact-substring dedup signal, approximated with
    fixed-length character grams + interval extension instead of a
    suffix array (the standard distributed adaptation).

    Every overlapping ``gram``-char window of every document is
    fingerprinted; a gram that occurs in >= 2 DISTINCT documents marks
    its position as duplicated, and per document the marked positions
    are merged into maximal intervals (two hits extend the same span
    iff their starts are <= gram apart). A true duplicated span of
    length L >= gram is covered exactly (all L - gram + 1 windows
    match), so ``dup_chars`` is the precise number of characters a
    span-removal pass would cut.

    Physical shape: gram extraction is map-only (explode + substr, all
    JVM); the duplicate test is ONE map-side-combinable groupBy(gram)
    with min/max doc-id (an aggregate, not a window — a
    billion-occurrence boilerplate gram collapses per map task, no skew
    bomb); join-back re-derives grams map-side (cheaper than caching
    the corpus-sized relation); the extension window partitions by
    document (groups bounded by doc length). At 100 TB the shuffle
    carries ~corpus_chars rows — ``sample_mod=s`` cuts it ~s-fold with
    CONTENT-DEFINED sampling: only grams whose md5 ≡ 0 (mod s) are
    kept, so both occurrences of a duplicated span select the SAME
    grams (positional stride cannot — the two occurrences sit at
    different offsets). Detection becomes probabilistic (a span of
    length L >= gram carries L - gram + 1 grams, each kept w.p. ~1/s
    independently of position; miss probability ~(1-1/s)^(L-gram+1))
    and coverage is measured over sampled grams only — the certified
    default ``sample_mod=1`` keeps every gram for exactness.

    Output: (doc_id, n_dup_grams, dup_chars, n_spans) per document with
    at least one cross-document duplicated span.
    """
    d = df.filter(
        F.col(text_col).isNotNull() & (F.length(text_col) >= gram)
    ).select(F.col(id_col).alias("id"), F.col(text_col).alias("txt"))
    grams = d.select(
        "id",
        F.explode(F.sequence(F.lit(1), F.length("txt") - gram + 1)).alias("p"),
        "txt",
    ).select("id", "p", F.col("txt").substr(F.col("p"), F.lit(gram)).alias("gram"))
    if sample_mod > 1:
        # engine-portable content hash: first 7 md5 hex chars -> int
        # (conv(...,16,10) == DuckDB ('0x'||...)::BIGINT)
        grams = grams.filter(
            F.conv(F.substring(F.md5("gram"), 1, 7), 16, 10).cast("long") % sample_mod == 0
        )
    dup = (
        grams.groupBy("gram")
        .agg(F.min("id").alias("__lo"), F.max("id").alias("__hi"))
        .filter(F.col("__lo") != F.col("__hi"))
        .select("gram")
    )
    hits = grams.join(dup, "gram").select("id", "p")
    wd = Window.partitionBy("id").orderBy("p")
    ext = hits.select(
        "id", "p", F.lead("p").over(wd).alias("np"), F.lag("p").over(wd).alias("pp")
    )
    return (
        ext.groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_dup_grams"),
            F.sum(
                F.when(F.col("np").isNull(), gram).otherwise(
                    F.least(F.col("np") - F.col("p"), F.lit(gram))
                )
            )
            .cast("long")
            .alias("dup_chars"),
            F.sum(
                F.when(F.col("pp").isNull() | (F.col("p") - F.col("pp") > gram), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_spans"),
        )
        .select(F.col("id").alias("doc_id"), "n_dup_grams", "dup_chars", "n_spans")
    )


def decontaminate_spans(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    k: int = 10,
    n: int = 3,
) -> DataFrame:
    """Span-level benchmark decontamination: instead of dropping whole
    documents that overlap the eval set (``decontaminate``), surgically
    REMOVE the ``k``-word spans whose word ``n``-grams hit any benchmark
    document, and rebuild the text from the clean spans — how a pipeline
    keeps a 10k-word document that quotes one eval question.

    Detection is span-local: an n-gram STRADDLING two spans is not
    checked (the standard trade-off of chunked removal; halve ``k`` or
    run doc-level ``decontaminate`` first when absolute recall beats
    text preservation).

    Physical shape: benchmark shingles broadcast (eval sets are tiny);
    the corpus maps to spans and span-shingles without shuffling, the
    contaminated-(id, idx) set comes from the broadcast semi-join, and
    one anti-join + one groupBy(doc) rebuild the texts.

    Output: (doc_id, n_spans, n_clean, text) — '' when everything was
    contaminated.
    """
    bench_sh = (
        benchmark.select(F.explode(word_shingles(bench_text_col, n)).alias("shingle")).distinct()
    )
    docs = corpus.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"), F.split(normalized_text(text_col), " ").alias("toks")
    )
    n_spans = F.greatest(F.ceil(F.size("toks") / F.lit(k)).cast("int"), F.lit(1))
    base = docs.select("id", "toks", n_spans.alias("n_spans"))
    spans = base.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.col("n_spans") - 1),
                lambda i: F.array_join(F.slice("toks", i * k + 1, k), " "),
            )
        ).alias("idx", "span"),
    )
    contaminated = (
        spans.select("id", "idx", F.explode(word_shingles(F.col("span"), n)).alias("shingle"))
        .join(F.broadcast(bench_sh), "shingle")
        .select("id", "idx")
        .distinct()
    )
    clean = spans.join(contaminated, ["id", "idx"], "left_anti")
    rebuilt = clean.groupBy("id").agg(
        F.count("*").alias("n_clean"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "span"))), lambda s: s["span"]
            ),
            " ",
        ).alias("text"),
    )
    return (
        base.select("id", "n_spans")
        .join(rebuilt, "id", "left")
        .select(
            F.col("id").alias("doc_id"),
            F.col("n_spans").cast("long").alias("n_spans"),
            F.coalesce("n_clean", F.lit(0)).cast("long").alias("n_clean"),
            F.coalesce("text", F.lit("")).alias("text"),
        )
    )


# ------------------------------------------------------------------ clusters

def _star_components(edges: DataFrame, max_iterations: int, strict: bool) -> DataFrame:
    """Alternating large-star/small-star connected components (Kiveris et
    al., "Connected Components in MapReduce and Beyond", alg. 2) over a
    BIDIRECTIONAL distinct edge list with columns (src, dst).

    Each round rewrites the edge set:

    - large-star: every node's strictly LARGER neighbors re-attach to
      the minimum of its closed neighborhood — long chains fold toward
      the minimum and a hot node sheds its larger neighbors, which is
      what bounds the per-round fan-out on skewed components;
    - small-star: every node's smaller neighbors (and the node itself)
      re-attach to its minimum smaller neighbor, producing canonical
      (node > root) star edges.

    Both operations preserve connectivity; the fixpoint is a forest of
    stars (node -> component minimum) reached in O(log n) rounds. The
    convergence check tests the star-forest property DIRECTLY — no node
    appears as both a child (u) and a parent (v), AND every child has
    exactly one parent — one count over the union of the two violation
    sets per round, instead of the former symmetric
    exceptAll-count set equality against the previous round (two
    shuffle-heavy exceptAlls per round, and it could only see the
    fixpoint one full round AFTER the star forest appeared). A star
    forest is provably stable under both rewrites (safe early stop);
    a non-forest that happened to equal its rewrite would raise loudly
    under ``strict`` rather than mislabel (Kiveris et al. prove
    fixpoints are exactly star forests, so the branch is theoretical).
    Each round's result is lazily ``localCheckpoint``-ed and
    materialized by that count, which also truncates the per-iteration
    lineage exactly like the hashmin loop."""
    nodes = edges.select(F.col("src").alias("node")).distinct().localCheckpoint(eager=True)
    # canonical orientation: one row per undirected edge, larger -> smaller
    e = (
        edges.filter(F.col("src") > F.col("dst"))
        .select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .localCheckpoint(eager=True)
    )
    converged = e.isEmpty()  # no non-self edges: every node is its own root
    rounds = 0
    while not converged and rounds < max_iterations:
        bi = e.select(F.col("u").alias("a"), F.col("v").alias("b")).unionByName(
            e.select(F.col("v").alias("a"), F.col("u").alias("b"))
        )
        mins = bi.groupBy("a").agg(F.least(F.min("b"), F.col("a")).alias("m"))
        large = (
            bi.filter(F.col("b") > F.col("a"))
            .join(mins, "a")
            .select(F.col("b").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        smins = large.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            large.join(smins, "u")
            .select(F.col("v").alias("node"), "m")
            .unionByName(smins.select(F.col("u").alias("node"), "m"))
            .filter(F.col("node") != F.col("m"))
            .select(F.col("node").alias("u"), F.col("m").alias("v"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        # True star-forest test, BOTH conditions: (a) no child is also a
        # parent, and (b) every child has exactly one parent. (b) is not
        # implied by (a): edges {u->v1, u->v2} pass (a) but are NOT a
        # fixpoint — the next large-star round re-attaches v2 to v1
        # through u, so stopping here splits a connected component (the
        # {5-7,5-8,6-7,6-1,4-8,4-2} counterexample, pinned in
        # test_sampling_clusters). One count job over the union of both
        # violation sets; it also materializes the lazy checkpoint above.
        parents = small.select(F.col("v").alias("u")).distinct()
        multi_parent = (
            small.groupBy("u")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
            .select("u")
        )
        non_star = (
            small.join(parents, "u", "left_semi").select("u").unionByName(multi_parent).count()
        )
        e = small
        rounds += 1
        if non_star == 0:
            converged = True
    if not converged and strict:
        raise RuntimeError(
            f"dup_clusters(strategy='star') did not converge within "
            f"max_iterations={max_iterations}; edge rewrites are mid-flight and "
            "cluster ids would be wrong. Raise max_iterations (O(log n) rounds "
            "suffice) or pass strict=False to accept partial labels."
        )
    roots = e.groupBy(F.col("u").alias("node")).agg(F.min("v").alias("root"))
    return nodes.join(roots, "node", "left").select(
        F.col("node").alias("doc_id"),
        F.coalesce(F.col("root"), F.col("node")).alias("cluster_id"),
    )


def dup_clusters(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iterations: int = 20,
    strict: bool = True,
    strategy: str = "hashmin",
) -> DataFrame:
    """Connected components over a near-dup pair list: every doc gets
    ``cluster_id`` = the smallest id reachable through the pair graph —
    the step that turns pairwise candidates (dd02/dd03/sh01/nd01) into
    actual keep-one-per-cluster dedup decisions.

    Two strategies, identical output (property-tested equivalent):

    - ``strategy="hashmin"`` (default): label propagation — each round
      every node adopts the minimum label among itself and its
      neighbors; converges in O(diameter) rounds. Near-dup graphs are
      overwhelmingly tiny cliques and short chains (diameter <= 3-4 in
      practice), so the loop exits in a few rounds via the AQE-sized
      shuffles; ``max_iterations`` bounds pathological chains.
    - ``strategy="star"``: alternating large-star/small-star edge
      rewrites (Kiveris et al., "Connected Components in MapReduce and
      Beyond"). Converges in O(log n) rounds REGARDLESS of diameter,
      and — the scale property hash-min lacks — each large-star round
      re-attaches a hot node's larger neighbors directly to the
      component minimum, so one viral near-dup cluster cannot keep
      fanning its full neighbor list through every round. The per-round
      cost is ~2x hash-min (two groupBy+join phases vs one), which is
      why tiny-diameter dedup graphs default to hash-min and skewed /
      high-diameter graphs should pass ``strategy="star"``.

    Round shape (2 shuffles/round, 1 action per TWO rounds): neighbor
    labels are emitted as messages (edge join), unioned with each node's
    own label, and one min-aggregate produces BOTH the new label and —
    via a null-tagged "own" column that only the self row carries — the
    pre-batch label, so the changed-label convergence check is a filter
    over the same aggregate, not an extra join. Rounds run in batches of
    two per check (labels are monotone non-increasing, so
    unchanged-over-batch == fixpoint), and round 1 rides the initial
    node-dedup aggregate. The single ``count()`` action per batch
    also materializes that batch's lazy ``localCheckpoint``:
    the label relation appears twice in the next round's plan (message
    join + self union), so without lineage truncation the analyzed plan
    doubles per iteration and planning itself OOMs on deep chains. On a
    production cluster with executor churn, swap in a reliable
    ``checkpoint`` directory — the loop shape is identical.

    If the loop exhausts ``max_iterations`` before converging, labels
    may still be mid-propagation (docs in one component holding
    different cluster ids). With ``strict=True`` (default) that raises
    ``RuntimeError`` instead of silently returning wrong clusters;
    ``strict=False`` returns the partial labels for callers that want
    bounded-cost approximate clustering. Verifying convergence takes at
    least one propagation round beyond hashmin's free init round, so
    ``strict=True`` with ``strategy="hashmin"`` requires
    ``max_iterations >= 2`` (ValueError otherwise — a strict 1-round
    budget could never be certified even when init already hit the
    fixpoint; the star strategy checks convergence inside every round
    and has no such floor).
    """
    if strategy not in ("hashmin", "star"):
        raise ValueError(f"unknown strategy {strategy!r}: expected 'hashmin' or 'star'")
    if strict and strategy == "hashmin" and max_iterations < 2:
        raise ValueError(
            "strict=True needs max_iterations >= 2: convergence can only be "
            "verified by a propagation round after the init round"
        )
    a, b = F.col(a_col), F.col(b_col)
    # Materialize the pair list BEFORE the union below references it twice:
    # pairs is typically the output of a whole candidate-generation pipeline
    # (shingle join / LSH), and without this checkpoint both union branches
    # re-execute that entire pipeline (measured ~2x the dd04 runtime).
    pairs = pairs.select(a.alias("pa"), b.alias("pb")).localCheckpoint(eager=True)
    a, b = F.col("pa"), F.col("pb")
    # undirected edge list so propagation runs both ways
    edges = (
        pairs.select(a.alias("src"), b.alias("dst"))
        .unionByName(pairs.select(b.alias("src"), a.alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if strategy == "star":
        return _star_components(edges, max_iterations, strict)

    label_null = F.lit(None).cast(edges.schema["src"].dataType)

    def propagate(lbls: DataFrame) -> DataFrame:
        """One hash-min round over (node, label, own). Message rows carry
        own=NULL so min(own) surfaces each node's OWN value untouched —
        'own' rides the aggregate as the pre-batch label for the
        changed-label convergence check, at zero extra shuffles."""
        msgs = edges.join(lbls, edges.src == lbls.node).select(
            F.col("dst").alias("node"), "label", label_null.alias("own")
        )
        return (
            msgs.unionByName(lbls.select("node", "label", "own"))
            .groupBy("node")
            .agg(F.min("label").alias("label"), F.min("own").alias("own"))
        )

    # Round 1 rides the node-dedup aggregate for free: instead of
    # DISTINCT-then-propagate, initialize each node's label directly to
    # min(self, neighbors) — same single shuffle as the plain DISTINCT.
    labels = (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.least(F.min("dst"), F.col("node")).alias("label"))
        .localCheckpoint(eager=True)
    )
    rounds_done = 1
    converged = False
    while rounds_done < max_iterations and not converged:
        # Two propagation rounds per convergence check: the check is a
        # driver-synchronized action, and on the tiny-diameter graphs
        # near-dup produces, halving the action count matters more than
        # the (at most one) extra round past the fixpoint. Labels are
        # monotone non-increasing, so label-unchanged-over-the-batch is
        # exactly the fixpoint test whatever the batch size.
        stepped = propagate(labels.withColumn("own", F.col("label")))
        if rounds_done + 2 <= max_iterations:
            stepped = propagate(stepped)
            rounds_done += 2
        else:
            rounds_done += 1
        new_labels = stepped.localCheckpoint(eager=False)
        changed = new_labels.filter(F.col("label") != F.col("own")).count()
        labels = new_labels.drop("own")
        if changed == 0:
            converged = True
    if not converged and strict:
        raise RuntimeError(
            f"dup_clusters did not converge within max_iterations={max_iterations}; "
            "labels are mid-propagation and cluster ids would be wrong. Raise "
            "max_iterations (graph diameter bounds the rounds needed) or pass "
            "strict=False to accept partial labels."
        )
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


# ------------------------------------------------------------ decontamination

def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 3,
    min_overlap: int = 1,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing >=
    ``min_overlap`` word ``n``-grams with any benchmark/eval document —
    the standard guard against test-set leakage into a training corpus
    (the cross-corpus cousin of ``shingle_pairs_jaccard``).

    Physical shape for 100 TB: the benchmark side is tiny (eval sets are
    thousands of docs), so its DISTINCT shingle set is BROADCAST and the
    corpus streams through a map-side semi-join — no shuffle of the
    corpus at all; the only aggregation is the per-doc overlap count,
    which combines map-side.

    Output: one row per corpus doc — (id, n_overlapping_grams,
    contaminated).
    """
    bench_sh = (
        benchmark.select(F.explode(word_shingles(bench_text_col, n)).alias("shingle")).distinct()
    )
    docs = corpus.select(F.col(id_col).alias("id"), F.explode(word_shingles(text_col, n)).alias("shingle"))
    hits = (
        docs.join(F.broadcast(bench_sh), "shingle")
        .groupBy("id")
        .agg(F.count("*").alias("n_overlapping_grams"))
    )
    return (
        corpus.select(F.col(id_col).alias("id"))
        .join(hits, "id", "left")
        .select(
            "id",
            F.coalesce("n_overlapping_grams", F.lit(0)).cast("long").alias("n_overlapping_grams"),
            (F.coalesce("n_overlapping_grams", F.lit(0)) >= min_overlap).alias("contaminated"),
        )
    )
