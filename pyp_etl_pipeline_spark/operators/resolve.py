"""Entity resolution: exact join + blocked similarity join + band routing.

This is the analytical core (reference J1-J7):
- J1 exact equi-join on lowercased title -> score 100, resolved
  (``app/etl.py:1262-1268``)
- J2 fuzzy top-k candidate generation (``app/etl.py:1270-1272``)
- J3 cross-algorithm validation penalty (``app/etl.py:1280-1294``)
- J4 penalty-adjusted rescoring (``app/etl.py:713-755``)
- J5 best-after-penalty selection (``app/etl.py:1295-1316``)
- J6 three-band threshold routing (``app/etl.py:1318-1374``)
- J7 top-3 alternatives (``app/etl.py:1342-1351``)

Scale design (the part the reference, being row-at-a-time, never had):
- the similarity join runs ONLY over exact-miss rows (anti-join gate);
- candidate generation is a token-blocking join (explode distinct tokens,
  equi-join on token, pair-dedup) instead of an O(items x dim) cross join;
- very frequent blocking tokens can be dropped (``max_token_df``) so a
  stop-word token never fans out into dim-size candidate lists (skew guard);
- the dimension side is broadcast when small; scoring is pure column
  arithmetic (whole-stage codegen), top-k is a bounded window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pyp_etl_pipeline_spark import schema as S
from pyp_etl_pipeline_spark.functions import scoring
from pyp_etl_pipeline_spark.functions.text import lower_key


def _dedupe_dim(dim: DataFrame, title_col: str, id_col: str) -> DataFrame:
    """One dimension row per lowercase title (the reference's canonical
    dict is keyed on ``title.lower()``, app/etl.py:1090-1093 — duplicate
    titles must not fan out the join). Deterministic pick: min (title,
    id) pair per key; the reference's dict keeps the arbitrary last fetch
    row, a documented deviation."""
    return (
        dim.groupBy(lower_key(title_col).alias("__key"))
        .agg(F.min(F.struct(F.col(title_col).alias("t"), F.col(id_col).alias("i"))).alias("__m"))
        .select("__key", F.col("__m.t").alias("__dim_title"), F.col("__m.i").alias("__dim_id"))
    )


def exact_resolve(
    items: DataFrame,
    dim: DataFrame,
    item_col: str = "item",
    title_col: str = "title",
    id_col: str = "ext_id",
    broadcast_dim: bool = True,
    pre_deduped: bool = False,
) -> DataFrame:
    """J1: broadcast hash join on the lowercase key. Adds
    ``matched_id``, ``matched_title``, ``score``, ``resolved``.
    ``pre_deduped=True`` means ``dim`` is already ``_dedupe_dim`` output
    (callers that share one deduped dict across stages)."""
    d = (dim if pre_deduped else _dedupe_dim(dim, title_col, id_col)).select(
        "__key",
        F.col("__dim_id").alias("matched_id"),
        F.col("__dim_title").alias("matched_title"),
    )
    if broadcast_dim:
        d = F.broadcast(d)
    out = items.join(d, lower_key(item_col) == F.col("__key"), "left").drop("__key")
    return out.withColumn("resolved", F.col("matched_id").isNotNull()).withColumn(
        "score", F.when(F.col("resolved"), F.lit(100.0)).otherwise(F.lit(None).cast("double"))
    )


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Round-robin repartition when the input has fewer partitions than the
    session's parallelism (small single-file scans otherwise serialize all
    downstream per-row compute onto one core). No-op at cluster scale."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        df = df.repartition(target)
    return df


def fuzzy_candidates(
    items: DataFrame,
    dim: DataFrame,
    item_col: str = "item",
    title_col: str = "title",
    id_col: str = "ext_id",
    max_token_df: int | None = None,
    ngram_fallback: bool = True,
    ngram_n: int = 3,
    pre_deduped: bool = False,
) -> DataFrame:
    """J2 candidate generation via token blocking: all (item, candidate)
    pairs sharing >= 1 blocking token, carrying both token arrays for
    downstream scoring.

    Physical shape (the 100 TB-aware choice): the *dimension* side is the
    small canonical dictionary, so its exploded token index is BROADCAST —
    the corpus-sized items side streams through the join with no shuffle at
    all. Pair dedup (a pair shares k tokens -> k join hits) is a map-side
    partial aggregate before the only shuffle, whose input is already
    collapsed to distinct pairs. ``max_token_df`` drops tokens whose
    dimension document frequency exceeds the cap (skew/stop-word guard) —
    scoring still uses the FULL token sets, so the cap only affects recall
    of candidates sharing nothing but ultra-common tokens.

    ``ngram_fallback`` closes the recall gap vs the reference's full-pool
    scan (app/etl.py:1270-1272): an item whose every token is typo'd
    ("Gelatne" vs dim "Gelatin") shares no whole token, so token blocking
    alone silently auto-rejects what the reference would surface for
    review. Items with ZERO token-block candidates are re-blocked on
    character ``ngram_n``-grams (broadcast dim-side gram index, same
    shape as the token join). Only the uncovered remainder — typically a
    tiny fraction of the corpus — pays the wider gram fan-out.
    """
    q = items.select(F.col(item_col).alias("__item"), scoring.tokens(item_col).alias("__q_tokens")).distinct()
    if ngram_fallback:
        # the query-side blocking index is consumed twice (token join +
        # uncovered-remainder probe); materialize it once — O(distinct
        # items) keys + token arrays, the same relation either consumer
        # would otherwise each recompute through the full upstream plan
        q = q.localCheckpoint(eager=True)
    d = (dim if pre_deduped else _dedupe_dim(dim, title_col, id_col)).select(
        F.col("__dim_title").alias("__title"),
        F.col("__dim_id").alias("__cand_id"),
    ).withColumn("__d_tokens", scoring.tokens("__title"))

    dx = d.select("__title", "__cand_id", "__d_tokens", F.explode("__d_tokens").alias("__tok"))
    if max_token_df is not None:
        df_counts = dx.groupBy("__tok").agg(F.count("*").alias("__df")).filter(F.col("__df") <= max_token_df)
        dx = dx.join(F.broadcast(df_counts.select("__tok")), "__tok")
    qx = ensure_parallelism(q).select("__item", "__q_tokens", F.explode("__q_tokens").alias("__tok"))

    pairs = (
        qx.join(F.broadcast(dx), "__tok")
        .select("__item", "__q_tokens", "__title", "__cand_id", "__d_tokens")
        .dropDuplicates(["__item", "__title", "__cand_id"])
    )
    if not ngram_fallback:
        return pairs

    # "has any token-block candidate" is just token-set membership — probe
    # the broadcast distinct dim-token set instead of re-evaluating the
    # full pair join a second time for the anti-join
    dim_toks = dx.select("__tok").distinct()
    covered = qx.join(F.broadcast(dim_toks), "__tok").select("__item").distinct()
    uncovered = q.join(covered, "__item", "left_anti")
    gq = uncovered.select(
        "__item", "__q_tokens", F.explode(scoring.char_ngrams("__item", ngram_n)).alias("__g")
    )
    gd = d.select(
        "__title", "__cand_id", "__d_tokens", F.explode(scoring.char_ngrams("__title", ngram_n)).alias("__g")
    )
    gram_pairs = (
        gq.join(F.broadcast(gd), "__g")
        .select("__item", "__q_tokens", "__title", "__cand_id", "__d_tokens")
        .dropDuplicates(["__item", "__title", "__cand_id"])
    )
    return pairs.unionByName(gram_pairs)


def score_candidates(pairs: DataFrame, scorer: str = "token_set", k: int = 10) -> DataFrame:
    """J2-J4 with the reference's extract-limit shape (app/etl.py:1272):
    raw-score every candidate pair, keep only the top ``k`` per item BY
    RAW SCORE (``process.extract(..., limit=10)`` — the reference never
    sees candidates beyond the raw top-10), cross-validate ONLY the
    raw-best row (``all_matches[0]``, app/etl.py:1281-1294), then apply
    penalties to every retained row.

    This ordering is also the 100 TB-correct physical plan: the raw
    top-k is a row_number window whose ``raw_rnk <= k`` filter triggers
    WindowGroupLimit pushdown (per-map-partition top-k BEFORE the
    shuffle), and the Levenshtein cross-validators run on <= k rows per
    item instead of every candidate pair. Tiebreak (title, id) is
    deterministic; the reference breaks ties by pool insertion order, a
    documented deviation.

    Output adds ``raw_rnk`` (1 = raw-best), ``raw_score``,
    ``disagreement_penalty``, ``adjusted_score``.
    """
    if scorer == "dice":
        scored = pairs.withColumn("raw_score", scoring.dice_token_score("__item", "__title"))
    elif scorer == "token_set":
        # materialize scoring inputs ONCE as columns: Catalyst won't CSE
        # subtrees referenced from multiple when() branches. The token
        # arrays were computed per distinct item/title before the pair
        # fan-out — reuse them instead of re-tokenizing per pair.
        inter, rest_a, rest_b = scoring.token_set_parts_from_tokens(
            F.col("__q_tokens"), F.col("__d_tokens")
        )
        scored = (
            pairs.withColumn("__int", inter)
            .withColumn("__ra", rest_a)
            .withColumn("__rb", rest_b)
            .withColumn(
                "raw_score",
                scoring.token_set_ratio_from_parts(F.col("__int"), F.col("__ra"), F.col("__rb")),
            )
            .drop("__int", "__ra", "__rb")
        )
    else:
        raise ValueError(f"unknown scorer: {scorer}")

    raw_w = Window.partitionBy("__item").orderBy(
        F.desc("raw_score"), F.asc("__title"), F.asc("__cand_id")
    )
    scored = scored.withColumn("raw_rnk", F.row_number().over(raw_w)).filter(F.col("raw_rnk") <= k)

    is_best = F.col("raw_rnk") == 1
    # validators run on default_process'd strings, exactly as the
    # reference passes utils.default_process to every scorer call
    scored = scored.withColumn("__li", scoring.process_text("__item")).withColumn(
        "__lt", scoring.process_text("__title")
    )
    li, lt = F.col("__li"), F.col("__lt")
    scored = scored.withColumn("__rplain", F.when(is_best, scoring.ratio(li, lt)))
    # containment_ratio = 100 on substring containment else plain ratio —
    # reuse the materialized plain ratio instead of a second levenshtein
    r_part = F.when(li.contains(lt) | lt.contains(li), F.lit(100.0)).otherwise(F.col("__rplain"))
    scored = scored.withColumn(
        "disagreement_penalty",
        F.when(
            is_best,
            scoring.algorithm_disagreement_penalty(F.col("raw_score"), F.col("__rplain"), r_part),
        ).otherwise(F.lit(0.0)),
    ).drop("__li", "__lt", "__rplain")
    adjusted = scoring.apply_match_penalties(
        F.col("raw_score") - F.col("disagreement_penalty"), F.col("__item"), F.col("__title")
    )
    return scored.withColumn("adjusted_score", adjusted)


def similarity_resolve(
    items: DataFrame,
    dim: DataFrame,
    item_col: str = "item",
    title_col: str = "title",
    id_col: str = "ext_id",
    k: int = 10,
    n_alternatives: int = 3,
    scorer: str = "token_set",
    max_token_df: int | None = None,
) -> DataFrame:
    """Full J1-J7 pipeline.

    Output: one row per distinct input item with ``matched_id,
    matched_title, suggested_id, suggested_name, score, band, resolved,
    alternatives``. Exact hits short-circuit the similarity stage
    entirely (the reference's single most important optimization, kept
    as an anti-join gate).

    Reject-band fidelity (app/etl.py:1360-1374): auto-rejected rows
    still persist the top guess — ``suggested_name`` (falling back to
    the item text when blocking surfaced no candidate at all) and
    ``suggested_id`` — plus ``alternatives = []`` (the reference writes
    a MatchReview with an empty list, not a missing one). Review rows
    likewise get ``[]`` when no alternative clears the reject threshold;
    auto-resolved rows create no MatchReview, so theirs stays NULL.

    Plan shape: the canonical dict is deduped ONCE and localCheckpoint'd
    (it is the broadcast-small side — materializing it is O(dict), never
    O(corpus)), so the exact key join, the token index, the gram
    fallback index, and the covered-token probe all read one tiny
    materialized relation instead of each re-deriving the dict's
    dedup shuffle; and the no-candidate reject branch rides the SAME
    left join that attaches the fuzzy best row to the misses, instead
    of a third traversal with an anti-join (was 60 exchanges in the
    end-to-end plan, now ~1/5th of that).
    """
    dimd = _dedupe_dim(dim, title_col, id_col).localCheckpoint(eager=True)
    base = items.select(F.col(item_col).alias("__item")).distinct()
    # The exact-join output feeds THREE consumers (hits, the fuzzy query
    # side, the final misses re-join) — materialize it once. Its size is
    # O(distinct items) x a few narrow columns, not O(raw corpus); on a
    # cluster swap localCheckpoint for a reliable checkpoint dir.
    exact = exact_resolve(base, dimd, "__item", title_col, id_col, pre_deduped=True).localCheckpoint(
        eager=True
    )
    hits = exact.filter(F.col("resolved"))
    misses = exact.filter(~F.col("resolved")).select("__item")

    pairs = fuzzy_candidates(
        misses, dimd, "__item", title_col, id_col, max_token_df=max_token_df, pre_deduped=True
    )
    scored = score_candidates(pairs, scorer=scorer, k=k)

    # Best-after-penalty among the raw top-k (reference app/etl.py:1304-1316:
    # strictly-greater comparison walking the extract order, so ties go to
    # the earlier = lower raw rank row).
    w = Window.partitionBy("__item").orderBy(F.desc("adjusted_score"), F.asc("raw_rnk"))
    ranked = scored.withColumn("rank", F.row_number().over(w))

    # Best row AND alternatives in ONE aggregation pass over ``ranked``
    # (two filter+join consumers would each re-derive the whole fuzzy
    # chain in the physical plan and meet in a sort-merge join — the
    # heaviest shape in the registry until round 10). Alternatives,
    # reference app/etl.py:1342-1351: walk the extract (raw) order, skip
    # the chosen best, keep adjusted >= the auto-reject threshold, stop
    # at n. ``alt_rank`` is the 1-based position among qualifying rows
    # in raw order — a conditional running count over the SAME __item
    # partitioning the ranking windows already shuffled on (no new
    # exchange), exactly row_number-after-filter without the filter
    # forking the plan.
    alt_ok = (F.col("rank") >= 2) & (F.col("adjusted_score") >= S.AUTO_REJECT_THRESHOLD)
    run_w = (
        Window.partitionBy("__item")
        .orderBy(F.asc("raw_rnk"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_alt = ranked.withColumn(
        "__alt_rank", F.sum(F.when(alt_ok, 1).otherwise(0)).over(run_w)
    )
    is_best = F.col("rank") == 1
    keep_alt = alt_ok & (F.col("__alt_rank") <= n_alternatives)
    best_cols = with_alt.groupBy("__item").agg(
        F.max(F.when(is_best, F.col("__title"))).alias("__best_title"),
        F.max(F.when(is_best, F.col("__cand_id"))).alias("__best_id"),
        F.max(F.when(is_best, F.col("adjusted_score"))).alias("__best_score"),
        F.sort_array(
            # collect_list drops the NULLs the non-alternative rows
            # produce; [] (no qualifying alternative) and the old
            # missing-row NULL coalesce identically downstream
            F.collect_list(
                F.when(
                    keep_alt,
                    F.struct(
                        F.col("__alt_rank").cast("int").alias("rank"),
                        F.col("__title").alias("name"),
                        F.round("adjusted_score", 4).alias("score"),
                        F.col("__cand_id").alias("ext_id"),
                    ),
                )
            )
        ).alias("__alts"),
    )

    empty_alts = F.array().cast("array<struct<rank:int,name:string,score:double,ext_id:string>>")
    null_alts = F.lit(None).cast("array<struct<rank:int,name:string,score:double,ext_id:string>>")

    # One left join from the misses attaches the fuzzy best row AND
    # covers items whose blocking produced no candidate at all (best is
    # absent -> score 0.0 -> reject band with the item text as the
    # suggested name, exactly the reference's `name0 or text_sanitized`).
    fuzzy_out = (
        misses.join(best_cols, "__item", "left")
        .withColumn("score", F.coalesce(F.col("__best_score"), F.lit(0.0)))
        .withColumn("band", scoring.band("score"))
        .select(
            F.col("__item"),
            F.when(F.col("band") == "auto_resolve", F.col("__best_id")).alias("matched_id"),
            F.when(F.col("band") != "reject", F.col("__best_title")).alias("matched_title"),
            # MatchReview payload exists for review AND reject rows: the
            # reference persists the top guess on auto-rejects too
            # (app/etl.py:1360-1374)
            F.col("__best_id").alias("suggested_id"),
            F.coalesce(F.col("__best_title"), F.col("__item")).alias("suggested_name"),
            F.col("score"),
            F.col("band"),
            (F.col("band") == "auto_resolve").alias("resolved"),
            # review: the collected list, [] when none clears the
            # threshold; reject: always []; auto_resolve: no MatchReview
            F.when(F.col("band") == "review", F.coalesce(F.col("__alts"), empty_alts))
            .when(F.col("band") == "reject", empty_alts)
            .otherwise(null_alts)
            .alias("alternatives"),
        )
    )

    hits_out = hits.select(
        "__item",
        "matched_id",
        "matched_title",
        F.col("matched_id").alias("suggested_id"),
        F.col("matched_title").alias("suggested_name"),
        "score",
        F.lit("auto_resolve").alias("band"),
        F.lit(True).alias("resolved"),
        null_alts.alias("alternatives"),
    )

    return hits_out.unionByName(fuzzy_out).withColumnRenamed("__item", item_col)
