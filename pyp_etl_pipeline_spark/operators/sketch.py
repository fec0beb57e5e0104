"""Engine-portable cardinality sketches.

``approx_count_distinct`` exists in every engine, but each
implementation's hash and register layout differs — useless when a
result must be reproducible across engines or audited bit-for-bit.
This module builds the sketches from first principles on a DETERMINISTIC
hash stream (md5, the engine-portable primitive the MinHash family
already uses), with all register math in exact integers:

- ``hll_distinct``: HyperLogLog with 2^p registers. Register index =
  top p bits of a 48-bit md5-derived hash; rho = leading-zero count of
  the remaining 40 bits + 1, computed EXACTLY via the binary-string
  length (``bin()`` renders without leading zeros in both Spark and
  DuckDB — no float log2 anywhere). The harmonic denominator is kept
  as an integer (each register contributes ``2^(41 - rho)``, empty
  registers ``2^41``), so the only floating-point step is one final
  exactly-rounded IEEE division — the estimate is bit-reproducible on
  any engine. Raw HLL estimate by contract: no small-range bias
  correction (that needs ``ln``, whose last ulp is libm-dependent);
  for n >> m the raw estimate IS the HLL estimate.

Physical shape: one map-side-combined (group, register) max — 2^p rows
per group per map task regardless of input size — then a tiny per-group
sum. The 100 TB cardinality shape: no distinct shuffle, state is 2^p
integers per group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _h48(value: Column, salt: str) -> Column:
    """Deterministic 48-bit hash: first 12 hex chars of md5(value||salt)."""
    return F.conv(
        F.substring(F.md5(F.concat(value.cast("string"), F.lit(salt))), 1, 12), 16, 10
    ).cast("long")


def sql_h48(value: str, salt: str) -> str:
    """DuckDB twin of ``_h48`` (oracle helper)."""
    return f"(('0x' || substring(md5({value}::VARCHAR || '{salt}'), 1, 12))::BIGINT)"


def hll_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: tuple[str, ...] = (),
    p: int = 8,
    salt: str = "hll-v1",
) -> DataFrame:
    """Per-group HLL cardinality estimate. Output: group columns +
    ``n_registers_hit`` (non-empty registers), ``harmonic_scaled``
    (the exact integer denominator, for audit/mergeability) and
    ``est_distinct`` (raw HLL estimate, rounded to 4)."""
    return hll_finalize(hll_registers(df, value_col, group_cols, p, salt), group_cols, p)


def hll_registers(
    df: DataFrame,
    value_col: str,
    group_cols: tuple[str, ...] = (),
    p: int = 8,
    salt: str = "hll-v1",
) -> DataFrame:
    """The MERGEABLE half of the HLL: per-(group, register) max rho.
    Register tables from disjoint batches merge by groupBy-max — the
    state an incremental 100 TB rollup persists between runs."""
    if not 4 <= p <= 14:
        raise ValueError(f"p must be in [4,14], got {p}")
    wbits = 48 - p
    h = _h48(F.col(value_col), salt)
    reg = F.expr(f"__h DIV {1 << wbits}")
    w = F.pmod(F.col("__h"), F.lit(1 << wbits))
    rho = F.when(w == 0, F.lit(wbits + 1)).otherwise(
        F.lit(wbits + 1) - F.length(F.bin(w))
    )
    gb = [F.col(c) for c in group_cols]
    return (
        df.filter(F.col(value_col).isNotNull())
        .withColumn("__h", h)
        .select(*group_cols, reg.alias("__reg"), rho.alias("__rho"))
        .groupBy(*gb, F.col("__reg"))
        .agg(F.max("__rho").alias("__r"))
    )


def hll_finalize(
    regs: DataFrame, group_cols: tuple[str, ...] = (), p: int = 8
) -> DataFrame:
    """Estimate from a (group, __reg, __r) register table."""
    m = 1 << p
    wbits = 48 - p
    gb = [F.col(c) for c in group_cols]
    # integer harmonic denominator: hit register -> 2^(wbits+1-r),
    # each of the (m - hits) empty registers -> 2^(wbits+1)
    alpha = 0.7213 / (1 + 1.079 / m)
    per_group = regs.groupBy(*gb).agg(
        F.count("*").cast("long").alias("n_registers_hit"),
        # shiftleft() takes a python int, not a Column — expr form
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {wbits + 1} - __r)")).alias("__s_hit"),
    )
    s = (
        F.col("__s_hit")
        + (F.lit(m).cast("long") - F.col("n_registers_hit")) * F.lit(1 << (wbits + 1)).cast("long")
    )
    est = F.lit(alpha * m * m) * F.lit(float(1 << (wbits + 1))) / s.cast("double")
    return per_group.select(
        *group_cols,
        "n_registers_hit",
        s.alias("harmonic_scaled"),
        F.round(est, 4).alias("est_distinct"),
    )


def sql_hll_distinct(
    table_expr: str,
    value: str,
    group_cols: tuple[str, ...] = (),
    p: int = 8,
    salt: str = "hll-v1",
) -> str:
    """DuckDB twin of ``hll_distinct`` over ``table_expr`` — identical
    hash, register, rho, and integer-denominator math."""
    m = 1 << p
    wbits = 48 - p
    alpha = 0.7213 / (1 + 1.079 / m)
    gsel = ", ".join(group_cols)
    gpre = f"{gsel}, " if group_cols else ""
    gby = f"GROUP BY {gsel}" if group_cols else ""
    return f"""
WITH hh AS (
  SELECT {gpre}{sql_h48(value, salt)} AS h
  FROM {table_expr} WHERE {value} IS NOT NULL
),
regs AS (
  SELECT {gpre}h // {1 << wbits} AS reg,
         max(CASE WHEN h % {1 << wbits} = 0 THEN {wbits + 1}
                  ELSE {wbits + 1} - length(bin(h % {1 << wbits})) END) AS r
  FROM hh GROUP BY {gpre}reg
),
agg AS (
  SELECT {gpre}count(*)::BIGINT AS n_registers_hit,
         sum((1::BIGINT << ({wbits + 1} - r)))::BIGINT
           + ({m}::BIGINT - count(*)) * {1 << (wbits + 1)}::BIGINT AS harmonic_scaled
  FROM regs {gby}
)
SELECT {gpre}n_registers_hit, harmonic_scaled,
       round(({alpha * m * m!r}::DOUBLE * {float(1 << (wbits + 1))!r}::DOUBLE)
             / harmonic_scaled::DOUBLE, 4) AS est_distinct
FROM agg
"""


def cms_token_counts(
    tokens: DataFrame,
    token_col: str = "tok",
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms-v1",
) -> DataFrame:
    """Count-min sketch of a token stream: ``depth`` independent
    md5-derived hash rows x ``width`` counters. Returns the sketch as
    (row, bucket, n) — depth*width bounded state built by one
    map-side-combined count (each token contributes to ``depth``
    buckets, so the shuffle carries at most depth*width rows per map
    task). The streaming/heavy-hitter companion to an exact groupBy:
    at 100 TB the exact token table may be too hot to materialize, the
    sketch never grows."""
    rows = tokens.select(
        F.col(token_col).alias("tok"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        F.pmod(_h48(F.col(token_col), f"{salt}:{r}"), F.lit(width)).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rb"),
    )
    return rows.groupBy(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket")).agg(
        F.count("*").cast("long").alias("n")
    )


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    token_col: str = "tok",
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms-v1",
) -> DataFrame:
    """Point-query the sketch: estimate = min over rows of the counter at
    each row's bucket — the CMS guarantee is estimate >= true count,
    with overshoot bounded by the collision mass. Queries join the
    (small, broadcastable) sketch on (row, bucket)."""
    probes = queries.select(
        F.col(token_col).alias("tok"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        F.pmod(_h48(F.col(token_col), f"{salt}:{r}"), F.lit(width)).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rb"),
    ).select("tok", F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy("tok")
        .agg(F.min("n").alias("n_cms"))
    )


def histogram_quantiles(
    df: DataFrame,
    value_col: str = "value",
    group_col: str = "event_type",
    n_bins: int = 32,
    quantiles: tuple[tuple[int, str], ...] = ((50, "p50"), (95, "p95"), (99, "p99")),
) -> DataFrame:
    """Mergeable equi-width histogram quantile estimates per group, in
    exact integer micro-units (long rows: group, n, q, est_micro).

    The scale story: exact percentiles need a per-group SORT of every
    value; this sketch needs two map-side-combinable aggregates whose
    state is ``n_bins`` integers per group — (1) per-group min/max/count
    bounds, (2) per-(group, bin) counts with
    ``bin = (m - lo) * n_bins DIV (hi - lo + 1)`` (always in
    [0, n_bins)). Bin-count vectors from different shards/days MERGE by
    integer addition under shared bounds — the property that lets a
    100 TB rollup keep running percentiles without ever re-sorting
    history. The estimate is the midpoint of the first bin whose running
    count reaches ``ceil(q * n)``; error is bounded by one bin width.
    All arithmetic is integer, so the result is bit-identical on any
    engine and any partitioning. Bounds are broadcast back (one row per
    group).
    """
    from pyp_etl_pipeline_spark.functions import aggregates  # noqa: PLC0415

    v = df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("g"), aggregates.micro_col(value_col).alias("m")
    )
    b = v.groupBy("g").agg(
        F.min("m").alias("lo"), F.max("m").alias("hi"), F.count("*").alias("n")
    )
    binned = v.join(F.broadcast(b), "g").withColumn(
        "bin", F.expr(f"CAST(((m - lo) * {n_bins}) DIV (hi - lo + 1) AS INT)")
    )
    cnt = binned.groupBy("g", "lo", "hi", "n", "bin").agg(F.count("*").alias("c"))
    from pyspark.sql import Window  # noqa: PLC0415

    w = Window.partitionBy("g").orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = cnt.withColumn("cum", F.sum("c").over(w))
    qdf = cum.select(
        "g", "lo", "hi", "n", "bin", "cum",
        F.explode(
            F.array(*[
                F.struct(F.lit(p).alias("p"), F.lit(lbl).alias("q"))
                for p, lbl in quantiles
            ])
        ).alias("qq"),
    ).select("g", "lo", "hi", "n", "bin", "cum", F.col("qq.p").alias("p"), F.col("qq.q").alias("q"))
    hit = qdf.filter(F.col("cum") >= F.expr("(n * p + 99) DIV 100"))
    res = hit.groupBy("g", "lo", "hi", "n", "q").agg(F.min("bin").alias("qbin"))
    est = F.expr(f"lo + ((2 * qbin + 1) * (hi - lo + 1)) DIV ({2 * n_bins})")
    return res.select(
        F.col("g").alias(group_col),
        F.col("n").cast("long").alias("n"),
        "q",
        est.cast("long").alias("est_micro"),
    )


def winsorized_stats(
    df: DataFrame,
    value_col: str = "value",
    group_col: str = "event_type",
    n_bins: int = 32,
    lo_pct: int = 5,
    hi_pct: int = 95,
) -> DataFrame:
    """Robust per-group stats: values clipped (winsorized) at the
    histogram-sketch p_lo / p_hi estimates, then exactly aggregated in
    integer micro-units. The outlier-resistant mean every metrics
    pipeline wants, WITHOUT a per-group sort: bounds come from the
    mergeable ``histogram_quantiles`` sketch (n_bins integers of state
    per group), the clip is map-only against broadcast bounds, and the
    final sums are exact integers. Output per group: n, n_clipped_lo,
    n_clipped_hi, raw_mean (micro), winsorized_mean (micro).
    """
    from pyp_etl_pipeline_spark.functions import aggregates  # noqa: PLC0415

    qs = histogram_quantiles(
        df,
        value_col=value_col,
        group_col=group_col,
        n_bins=n_bins,
        quantiles=((lo_pct, "lo"), (hi_pct, "hi")),
    )
    bounds = qs.groupBy(group_col).agg(
        F.max(F.when(F.col("q") == "lo", F.col("est_micro"))).alias("lo_m"),
        F.max(F.when(F.col("q") == "hi", F.col("est_micro"))).alias("hi_m"),
    )
    v = df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col), aggregates.micro_col(value_col).alias("m")
    )
    clipped = v.join(F.broadcast(bounds), group_col).select(
        group_col,
        "m",
        F.greatest(F.col("lo_m"), F.least(F.col("hi_m"), F.col("m"))).alias("w"),
        (F.col("m") < F.col("lo_m")).cast("long").alias("is_lo"),
        (F.col("m") > F.col("hi_m")).cast("long").alias("is_hi"),
    )
    agg = clipped.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("is_lo").cast("long").alias("n_clipped_lo"),
        F.sum("is_hi").cast("long").alias("n_clipped_hi"),
        F.sum("m").alias("__sm"),
        F.sum("w").alias("__sw"),
    )
    mean_of = lambda s: F.expr(  # noqa: E731 — exact integer mean in micro
        f"CAST((CASE WHEN {s} < 0 THEN -1 ELSE 1 END) * "
        f"((abs({s}) + n DIV 2) DIV n) AS BIGINT)"
    )
    return agg.select(
        group_col,
        "n",
        "n_clipped_lo",
        "n_clipped_hi",
        mean_of("__sm").alias("raw_mean_micro"),
        mean_of("__sw").alias("winsorized_mean_micro"),
    )


def bloom_build(
    items: DataFrame,
    item_col: str,
    n_bits: int = 8192,
    k: int = 4,
    salt: str = "bloom-v1",
) -> DataFrame:
    """Engine-portable Bloom filter as a SPARSE BITSET RELATION
    (word, bits): position r = h48(item || salt:r) mod n_bits, word =
    pos DIV 63, and a map-side-combinable ``bit_or`` folds the masks.
    Completes the module's mergeable-sketch family (HLL, count-min,
    histogram): filters over disjoint batches MERGE by bit_or on word,
    the bitset is at most n_bits/64 rows (broadcastable at any corpus
    size), and — like the others — it is built on the deterministic md5
    stream, so the same items produce the same bits on any engine. The
    Bloom guarantee holds by construction: probes have NO false
    negatives, and false positives are bounded by the fill factor."""
    pos = F.explode(
        F.array(*[F.pmod(_h48(F.col(item_col), f"{salt}:{r}"), F.lit(n_bits)) for r in range(k)])
    )
    # NULL items set no bits (a Bloom filter has no NULL member; a null
    # word row would also be an illegal map key in bloom_probe's folded
    # bitset) — probing NULL correspondingly returns false
    rows = items.filter(F.col(item_col).isNotNull()).select(pos.alias("pos"))
    # 63-bit words: shift stays <= 62, below BOTH engines' signed-shift
    # edge (DuckDB raises on 1 << 63; Java wraps silently) — same layout
    # on each side by construction
    return (
        rows.select(
            F.expr("pos DIV 63").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 63 AS INT))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_probe(
    probes: DataFrame,
    bloom: DataFrame,
    item_col: str,
    n_bits: int = 8192,
    k: int = 4,
    salt: str = "bloom-v1",
) -> DataFrame:
    """``might_contain`` per probe row: all k positions set. The bitset
    (at most n_bits/63 rows by construction) folds into a ONE-ROW
    word→bits map that broadcast-cross-joins onto the probes, and
    membership is k static ``element_at`` lookups — fully map-only on
    the probe side: no explode, no shuffle, no aggregation. Output: the
    input rows (multiplicity preserved — duplicate probes each get their
    own verdict, so the no-false-negative guarantee holds row-for-row)
    + ``might_contain`` boolean."""
    bm = bloom.groupBy().agg(
        F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias("__bm")
    )
    hits = []
    for r in range(k):
        pos = F.pmod(_h48(F.col(item_col), f"{salt}:{r}"), F.lit(n_bits))
        word = (pos / 63).cast("long")  # pos >= 0, so floor-div == DIV 63
        mask = F.call_function("shiftleft", F.lit(1).cast("long"), (pos % 63).cast("int"))
        hits.append(
            F.coalesce(
                F.element_at(F.col("__bm"), word).bitwiseAND(mask) != 0, F.lit(False)
            )
        )
    out = probes.crossJoin(F.broadcast(bm))
    verdict = hits[0]
    for h in hits[1:]:
        verdict = verdict & h
    return out.select(*probes.columns, verdict.alias("might_contain"))


def heavy_hitters(items: DataFrame, col: str = "tok", k: int = 200) -> DataFrame:
    """All items with global frequency >= n/k (count*k >= n), found
    WITHOUT shuffling the long tail. Returns (col, cnt) — exact counts.

    The 100 TB story: a plain ``groupBy(col).count()`` shuffles the
    full item cardinality (every distinct URL / token / entity — often
    billions of tail keys that can never be heavy). This is the
    classic two-pass guaranteed-superset scheme instead:

    1. **Candidate pass (map-only, vectorized)**: per Arrow batch, a
       pandas ``value_counts`` emits items whose LOCAL frequency is
       >= 1/k of the batch. By pigeonhole, any item with global
       frequency >= n/k must reach local frequency >= 1/k in at least
       one batch (if count/n >= 1/k globally, sum over batches forces
       count_b/n_b >= 1/k somewhere) — so the union of local
       candidates is a GUARANTEED superset of the true heavy hitters.
       No per-row Python: ``value_counts`` is one hashed C pass.
    2. **Exact recount (candidates only)**: broadcast the (small)
       candidate set, semi-join the stream against it, and count just
       those — the shuffle now carries only candidate keys, bounded by
       k * num_batches regardless of tail cardinality — then filter by
       the exact global threshold ``cnt * k >= n``.

    Because the final filter uses EXACT global counts against the
    EXACT global n, the output is identical for every partitioning /
    batching of the input (the candidate set varies; the superset
    property makes that invisible) — deterministic under AQE, task
    retry, and any cluster layout.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def _local_candidates(batches):
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            s = pdf[col]
            vc = s.value_counts()
            hh = vc[vc * k >= len(s)]
            yield pd.DataFrame({col: hh.index})

    items = items.filter(F.col(col).isNotNull())
    # candidate schema mirrors the input column's type — a hardcoded
    # string schema would coerce/break numeric item ids (ADVICE r8)
    from pyspark.sql.types import StructField, StructType  # noqa: PLC0415

    cand_schema = StructType([StructField(col, items.schema[col].dataType)])
    candidates = items.mapInPandas(_local_candidates, schema=cand_schema).distinct()
    total = items.agg(F.count("*").alias("__total"))
    counts = (
        items.join(F.broadcast(candidates), col)
        .groupBy(col)
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * k >= F.col("__total"))
        .select(col, "cnt")
    )
