"""Sign-safety of the epoch-seconds / bucket-start idioms (--tsextremes).

Spark `unix_timestamp()` truncates toward zero on pre-1970 fractional
seconds; the engine contract is FLOOR (`cast(ts AS long)`), matching
DuckDB `CAST(floor(epoch(ts)) AS BIGINT)` and `F.window`'s bucket math.
Bucket starts are rebuilt as `floor(epoch / width) * width` on both
engines — integer `//`/`DIV` would land one bucket late on negative
epochs. This test pins the cross-engine agreement at the exact
boundaries (multiples of the widths, ±1 second, 4 sub-second offsets)
so a regression in either idiom fails fast without the full
check_nulls --tsextremes family run.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

WIDTHS = (900, 3600, 604800)


def test_epoch_floor_and_bucket_idioms_agree_across_engines(spark):
    bases = [-604800 * 3, -900 * 7, -3600 * 5, 0, 900 * 4, 604800 * 2]
    epochs = [b + d for b in bases for d in (-1, 0, 1)]
    micros = [(i, e * 1_000_000 + m)
              for i, (e, m) in enumerate((e, m) for e in epochs
                                         for m in (0, 1, 500_000, 999_999))]
    df = (
        spark.createDataFrame(micros, "id long, us long")
        .select("id", "us", F.timestamp_micros(F.col("us")).alias("ts"))
    )
    cols = [F.col("ts").cast("long").alias("ep")]
    for w in WIDTHS:
        cols.append((F.floor(F.col("ts").cast("long") / F.lit(w)) * w).alias(f"b{w}"))
    got = {r["id"]: r for r in df.select("id", *cols).collect()}

    con = duckdb.connect()
    for i, us in micros:
        sel = ["CAST(floor(epoch(make_timestamp($us))) AS BIGINT) AS ep"] + [
            f"CAST(floor(CAST(floor(epoch(make_timestamp($us))) AS BIGINT) / {w}) AS BIGINT) * {w} AS b{w}"
            for w in WIDTHS
        ]
        q = ("SELECT " + ", ".join(sel)).replace("$us", str(us))
        want = con.execute(q).fetchone()
        have = tuple(got[i][c] for c in ["ep"] + [f"b{w}" for w in WIDTHS])
        assert have == want, (us, have, want)
