"""Offerings derivation (J11) — presence-driven tagging.

Reference semantics (``app/etl.py:323-399``): a member gets offering O when
any mapped source field for O is non-empty; Manufacturing is additionally
triggered by a non-empty ``products`` cell. One offering appears at most
once per member even when several source fields map to it (e.g. Spaces has
four source fields).

No join needed — this is ``array_compact``-style column algebra over the
wide row, evaluated in one pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyp_etl_pipeline_spark.functions.nulls import is_valid_value
from pyp_etl_pipeline_spark.schema import OFFERING_RULES


def derive_offerings(
    df: DataFrame,
    rules: list[tuple[str, str, str]] | None = None,
    out_col: str = "offerings",
    manufacturing_from_products: bool = True,
) -> DataFrame:
    """Adds ``out_col``: array<struct<title,uid,source_field>> of derived offerings
    (first source field wins per title, preserving rule order)."""
    rules = rules if rules is not None else OFFERING_RULES
    present = set(df.columns)
    entries = []
    seen_titles: dict[str, list[str]] = {}
    for field, title, uid in rules:
        seen_titles.setdefault(title, []).append(field)
        if field not in present:
            continue
        # only the FIRST matching source field emits the title (dedup by title)
        earlier = [f for f in seen_titles[title][:-1] if f in present]
        cond = is_valid_value(field)
        for e in earlier:
            cond = cond & ~is_valid_value(e)
        entries.append(
            F.when(
                cond,
                F.struct(F.lit(title).alias("title"), F.lit(uid).alias("uid"), F.lit(field).alias("source_field")),
            )
        )
    if manufacturing_from_products and "products" in present:
        mf_fields = [f for f, t, _ in rules if t == "Manufacturing" and f in present]
        cond = is_valid_value("products")
        for f in mf_fields:
            cond = cond & ~is_valid_value(f)
        uid = next(u for _, t, u in rules if t == "Manufacturing")
        entries.append(
            F.when(
                cond,
                F.struct(
                    F.lit("Manufacturing").alias("title"),
                    F.lit(uid).alias("uid"),
                    F.lit("products").alias("source_field"),
                ),
            )
        )
    arr = F.filter(F.array(*entries), lambda x: x.isNotNull()) if entries else F.array()
    return df.withColumn(out_col, arr)


def resolve_uids(
    derived: DataFrame,
    live_dim: DataFrame | None,
    title_col: str = "title",
    uid_col: str = "uid",
) -> DataFrame:
    """Live-dim UID resolution with static fallback (S6).

    Reference semantics (``app/etl.py:160-320``): the playground fetches
    the MemberOffering dim live and keys offerings by
    ``offerings_map.get(title, fallback_uid)`` — i.e. the live
    offering_id wins when the title exists in the live dim, otherwise
    the rule's production fallback UID stands. ``live_dim=None`` (the
    un-configured / fetch-failed path) keeps every fallback, exactly
    like the reference's empty-map return.

    Spark shape: the dim is tiny (one row per offering title), so this
    is a broadcast left join + ``coalesce`` — no collect, no shuffle of
    the derived side."""
    if live_dim is None:
        return derived
    live = live_dim.select(F.col("title").alias("__lt"), F.col("offering_id").alias("__lu"))
    return (
        derived.join(F.broadcast(live), F.col(title_col) == F.col("__lt"), "left")
        .withColumn(uid_col, F.coalesce(F.col("__lu"), F.col(uid_col)))
        .drop("__lt", "__lu")
    )
