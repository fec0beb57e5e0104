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

from pyspark.sql import DataFrame
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
