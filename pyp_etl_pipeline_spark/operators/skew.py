"""Skew-mitigation joins: salting for hot keys.

AQE's skew-join splitting (enabled in the session factory) handles most
skew at runtime by splitting oversized shuffle partitions. Salting is
the complementary *plan-level* tool for the pathological case AQE can't
fix: a single join key so hot that one task would still process it alone
(power-law user ids, a null-heavy foreign key, one mega-customer).

``salted_join`` replicates the small side N ways and scatters the big
side's hot keys across N salt buckets, so the hot key's work spreads
over N tasks. Exactly equivalent to the plain join for inner/left joins
on equi-keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with an N-way salt.

    big side: salt = pmod(hash(all columns), N) — a pure function of the
    row, so recomputes (task retry, AQE re-plan) assign the same salt;
    small side: replicated once per salt value. The join key becomes
    (key, salt), so a hot key occupies N shuffle partitions instead of
    one. Use when a specific key's row count dwarfs the rest and the
    small side is replicable (dimension-sized). Caveat: fully identical
    duplicate rows share a salt — hot keys whose rows differ in any
    other column (the normal case) spread evenly.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left equi-joins")
    salts = F.array(*[F.lit(i) for i in range(n_salts)])
    b = big.withColumn("__salt", F.pmod(F.hash(*big.columns), F.lit(n_salts)).cast("int"))
    s = small.withColumn("__salt", F.explode(salts))
    out = b.join(s, [key, "__salt"], how)
    return out.drop("__salt")


def top_keys_by_frequency(df: DataFrame, key: str, n: int = 10) -> DataFrame:
    """Skew diagnosis helper: the N heaviest join keys with counts and
    the fraction of all rows they carry."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count("*").alias("n_rows"))
        .withColumn("fraction", F.round(F.col("n_rows") / F.lit(total), 6))
        .orderBy(F.desc("n_rows"))
        .limit(n)
    )


def skew_audit(df: DataFrame, key: str, top_n: int = 10) -> DataFrame:
    """Key-distribution audit — the diagnosis step BEFORE choosing a
    skew mitigation (salted_join's N, AQE trust, or broadcast). Emits
    the ``top_n`` heaviest keys with exact-integer global context on
    every row:

    - ``n_rows`` / ``share_micro``: the key's row count and its share
      of the relation, micro-units.
    - ``skew_micro``: max_count / mean_count in micro — "the hottest
      key is X times the average"; 1e6 = perfectly uniform. The number
      that says whether the default hash partitioning leaves one task
      holding the bag.
    - ``salt_factor``: ceil(max_count / mean_count) — the smallest
      replication N for ``salted_join`` that levels the hottest key
      down to the mean task size.

    Physical shape: one partial-aggregated groupBy on the key, a
    TakeOrdered top-N over the per-key counts, and a single-row global
    aggregate broadcast back onto N rows. NULL keys group as their own
    key (a null-heavy foreign key is the classic hot key, and it must
    show up here, not be filtered away). All integer arithmetic —
    engine-portable."""
    counts = df.groupBy(F.col(key).alias("key_value")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    totals = counts.agg(
        F.sum("n_rows").cast("long").alias("total_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("n_rows").cast("long").alias("max_rows"),
    )
    top = (
        counts.orderBy(F.desc("n_rows"), F.asc("key_value"))
        .limit(top_n)
        .withColumn(
            "key_rank",
            F.row_number().over(
                Window.orderBy(F.desc("n_rows"), F.asc("key_value"))
            ).cast("long"),
        )
    )
    return (
        top.join(F.broadcast(totals))
        .select(
            "key_rank",
            F.col("key_value").cast("string").alias("key_value"),
            "n_rows",
            F.expr("n_rows * CAST(1000000 AS BIGINT) DIV total_rows").alias("share_micro"),
            "total_rows",
            "n_keys",
            F.expr("max_rows * n_keys * CAST(1000000 AS BIGINT) DIV total_rows").alias("skew_micro"),
            F.expr(
                "(max_rows * n_keys + total_rows - 1) DIV total_rows"
            ).alias("salt_factor"),
        )
    )
