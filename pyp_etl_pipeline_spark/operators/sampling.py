"""Deterministic sampling / dataset-split operators for training-data
pipelines.

At 100 TB, sampling must be (a) a map-only predicate — no shuffle, no
driver coordination, (b) stable across runs and engines — re-running the
pipeline yields the same split, and (c) keyed — a document keeps its
split assignment even when the corpus around it changes. All three fall
out of hashing a stable key: bucket = md5(key || salt) mod B, keep/route
by bucket range. md5 is the engine-portable hash used across this repo
(the DuckDB oracles reproduce assignments bit-for-bit via the
``('0x' || substring(md5(..),1,7))::BIGINT`` == Spark
``conv(substring(md5(..),1,7),16,10)`` identity).

- ``hash_bucket``: the shared primitive (28-bit md5 prefix mod B).
- ``hash_split``: route rows into named splits by cumulative fraction
  (train/val/test). Map-only; changing the salt re-rolls every
  assignment, changing fractions only moves boundary buckets.
- ``deterministic_sample``: keep a fraction, keyed. Equivalent to
  TABLESAMPLE but stable under re-runs, engine-portable, and usable on
  any key (e.g. sample by USER so all of a user's rows travel together).
- ``stratified_fixed_n``: exactly-n-per-stratum via a per-stratum
  hash-order window (one shuffle on the stratum key; WindowGroupLimit
  thins map-side). Hash order = deterministic but unbiased within the
  stratum.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

BUCKETS = 1 << 20


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def hash_bucket(key: Column | str, salt: str = "", buckets: int = BUCKETS) -> Column:
    """Deterministic bucket in [0, buckets): 28-bit md5 prefix mod B."""
    h = F.md5(F.concat(_col(key).cast("string"), F.lit(salt)))
    return (F.conv(F.substring(h, 1, 7), 16, 10).cast("long") % buckets).alias("bucket")


def sql_hash_bucket(key: str, salt: str = "", buckets: int = BUCKETS) -> str:
    """DuckDB twin of ``hash_bucket`` (oracle helper)."""
    return f"((('0x' || substring(md5({key}::VARCHAR || '{salt}'), 1, 7))::BIGINT) % {buckets})"


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float],
    salt: str = "split-v1",
    out_col: str = "split",
) -> DataFrame:
    """Route every row to a named split by cumulative bucket fraction.

    ``splits`` = ordered {name: fraction}; fractions must sum to ~1.
    Map-only (no shuffle): the assignment is a pure column expression on
    the key, so it survives any repartitioning and any corpus growth.
    """
    total = sum(splits.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    bucket = hash_bucket(key_col, salt)
    expr = None
    cum = 0.0
    names = list(splits)
    for name in names[:-1]:
        cum += splits[name]
        cond = bucket < int(cum * BUCKETS)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn(out_col, expr)


def deterministic_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    salt: str = "sample-v1",
) -> DataFrame:
    """Keyed deterministic sample: keep rows whose bucket falls below
    ``fraction``. Same key + salt -> same decision, forever, on any
    engine. Map-only."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return df.filter(hash_bucket(key_col, salt) < int(fraction * BUCKETS))


def stratified_fixed_n(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    n: int,
    salt: str = "strata-v1",
) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum, chosen by hash order
    (deterministic, unbiased within the stratum). One shuffle on the
    stratum key; the rank filter triggers WindowGroupLimit so each map
    partition forwards at most n rows per stratum."""
    h = F.md5(F.concat(_col(key_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy(strata_col).orderBy(h.asc(), _col(key_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def mix_corpora(
    sources: list[tuple[str, DataFrame, float]],
    key_col: str,
    salt: str = "mix-v1",
    source_col: str = "source",
    copy_col: str = "copy",
) -> DataFrame:
    """Deterministic training-mixture assembly: each (name, df, rate)
    source contributes ``rate`` expected copies of every document —
    rate 0.25 down-samples to a quarter, rate 2.3 emits 2 copies of
    every doc plus a 3rd for a keyed 30% subset (the standard
    "repeat the high-quality corpus" mixing move). Per row:
    ``floor(rate)`` guaranteed copies + one more iff the doc's hash
    fraction < frac(rate). Pure column algebra + one explode per source
    — map-only, no shuffle, stable under re-runs and corpus growth, so
    a 100 TB mixture can be re-materialized (or streamed straight into
    tokenization) with bit-identical composition. Output adds
    ``source`` and a 0-based ``copy`` index (downstream shuffles/seeds
    can mix on (source, key, copy)).

    Columns are unioned by name across sources (missing columns are
    allowed and null-filled) — schemas should share the key column.
    """
    if not sources:
        raise ValueError("mix_corpora needs at least one source")
    outs = []
    for name, df, rate in sources:
        if rate < 0:
            raise ValueError(f"rate for {name!r} must be >= 0, got {rate}")
        whole = int(rate)
        frac = rate - whole
        n_copies = F.lit(whole) + (
            hash_bucket(key_col, f"{salt}:{name}") < int(frac * BUCKETS)
        ).cast("int")
        outs.append(
            df.withColumn(source_col, F.lit(name))
            .withColumn("__n", n_copies)
            .filter(F.col("__n") > 0)
            .withColumn(copy_col, F.explode(F.sequence(F.lit(0), F.col("__n") - 1)))
            .drop("__n")
        )
    mixed = outs[0]
    for o in outs[1:]:
        mixed = mixed.unionByName(o, allowMissingColumns=True)
    return mixed


def budget_fill(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    budget: int,
    group_cols: tuple[str, ...] = (),
    salt: str = "budget-v1",
) -> DataFrame:
    """Fill a weight budget (token count, byte count) per group with a
    deterministic pseudo-random subset: rows are ordered by their keyed
    hash bucket (unbiased, reproducible on any engine — ties broken by
    key), and a row is kept while the budget is not yet met, i.e. its
    EXCLUSIVE running weight is < ``budget``. The first overflowing row
    is included, so a met budget always reaches >= budget (greedy-fill
    contract; an empty group or zero budget keeps one row at most per
    group only if budget > 0... precisely: kept iff cum - weight <
    budget).

    This is the "give me 10B training tokens from this source, fairly
    sampled, same answer every run" operator. The running weight is the
    deterministic two-pass distributed prefix sum (operators/prefix) —
    hash buckets have the static domain [0, 2^20), so bucketing needs NO
    bounds aggregate and the whole plan costs two small shuffles instead
    of a single-partition global window.

    Output: input columns + ``fill_rank_bucket`` (the hash order key,
    for audit) and ``cum_weight`` (inclusive running weight in fill
    order)."""
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    from pyp_etl_pipeline_spark.operators.prefix import grouped_prefix_sum  # noqa: PLC0415

    with_bucket = df.withColumn("fill_rank_bucket", hash_bucket(key_col, salt))
    cum = grouped_prefix_sum(
        with_bucket,
        value_col=weight_col,
        order_col="fill_rank_bucket",
        group_cols=group_cols,
        extra_order_cols=(key_col,),
        bounds=(0, BUCKETS),
        cum_col="cum_weight",
    )
    return cum.filter(F.col("cum_weight") - F.col(weight_col) < budget)


def epoch_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    epoch: int = 0,
    n_shards: int = 8,
    salt: str = "epoch-shuffle-v1",
) -> DataFrame:
    """Deterministic training-order shuffle: every epoch gets a DIFFERENT
    but fully REPRODUCIBLE global order and shard assignment, with no
    RNG state anywhere — order_key = md5(id || salt || epoch), shard =
    order_key's top bits. Re-running epoch 3 after a crash reproduces
    byte-identical shards (the resumability contract RNG-based shuffles
    can't give you), while epochs decorrelate as well as a true
    reshuffle for training purposes.

    Shape: map-only key derivation; the writer then range-partitions on
    (shard, order_key) — one shuffle per epoch, which IS the reshuffle.
    Adds ``epoch``, ``order_key`` (hex), ``shard`` columns."""
    key = F.md5(F.concat_ws("|", F.col(id_col).cast("string"), F.lit(salt), F.lit(epoch)))
    return df.withColumn("epoch", F.lit(epoch).cast("int")).withColumn(
        "order_key", key
    ).withColumn(
        "shard",
        F.pmod(F.conv(F.substring(key, 1, 8), 16, 10).cast("long"), F.lit(n_shards)).cast("int"),
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int = 20,
    id_col: str = "doc_id",
    salt: str = "wsample-v1",
) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis-Spirakis A-ES): each row gets key = ln(u) / w with u a
    DETERMINISTIC md5-uniform in (0,1), and the k largest keys win —
    inclusion probability proportional to weight, yet fully
    reproducible and retry-safe (no RNG state; the id+salt decide).
    The quality-weighted corpus-sampling primitive: weight by a quality
    score and heavy docs surface proportionally.

    Shape: map-only key derivation + TakeOrderedAndProject (distributed
    partial top-k; no global sort). Keys floor to integer micro (the
    tx06 log-portability contract) so selection is engine-identical.
    Zero/negative weights are excluded (A-ES requires w > 0)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 12), 16, 10
    ).cast("long")
    # u in (0, 1): (h + 1) / (2^48 + 1) — never 0 or 1, ln defined
    u = (h + 1) / F.lit(float((1 << 48) + 1))
    key_micro = F.floor(F.log(u) / F.col(weight_col) * 1_000_000 + F.lit(0.5)).cast("long")
    ranked = (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__key", key_micro)
        .orderBy(F.col("__key").desc(), F.col(id_col).asc())
        .limit(k)
    )
    return ranked.withColumnRenamed("__key", "sample_key_micro")


def curriculum_schedule(
    df: DataFrame,
    difficulty_micro: Column,
    thresholds_micro: tuple[int, ...] = (4_000_000, 5_000_000, 6_000_000),
    id_col: str = "doc_id",
    salt: str = "curriculum-v1",
) -> DataFrame:
    """Curriculum-learning schedule assignment: every row gets a
    ``phase`` (0 = easiest) from a static difficulty ladder and a
    deterministic ``order_key`` (hash of the id) that shuffles rows
    WITHIN a phase. A trainer consumes phases in order and rows within
    a phase in order_key order — the standard easy-to-hard pacing.

    Deliberately MAP-ONLY: phase comes from fixed thresholds (not
    ntile/percent_rank — a global rank is a single-partition window,
    the classic scale killer) and the within-phase order is a hash SORT
    KEY, not a rank, so no window and no shuffle exist at all. The
    writer orders the corpus with one
    ``repartitionByRange(phase, order_key)`` — the only (and
    unavoidable) shuffle, deferred to the sink. Data-dependent
    thresholds, when wanted, come from one qt01-style histogram-
    quantile pass, then re-enter here as constants."""
    phase = F.lit(0)
    for t in thresholds_micro:
        phase = phase + F.when(difficulty_micro >= F.lit(t), 1).otherwise(0)
    return df.select(
        F.col(id_col),
        difficulty_micro.cast("long").alias("difficulty_micro"),
        phase.cast("long").alias("phase"),
        hash_bucket(id_col, salt=salt).cast("long").alias("order_key"),
    )
