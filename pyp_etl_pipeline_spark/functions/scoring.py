"""Similarity scoring, penalties, and confidence banding (J2-J6, T8).

Reference semantics:
- fuzzy scorers: rapidfuzz ``token_set_ratio`` / ``ratio`` / ``partial_ratio``
  (``app/etl.py:1270-1294``). This engine re-expresses them as *native Spark
  column expressions* (array ops + ``levenshtein``) so scoring stays inside
  whole-stage codegen — no Python in the hot path. Documented deviation:
  ``ratio`` here is normalized Levenshtein similarity
  ``100 * (1 - lev / max(len))`` rather than rapidfuzz's indel-based ratio;
  band decisions are pinned by golden tests in ``tests/test_scoring.py``.
- penalty rescoring (``apply_match_penalties``, app/etl.py:713-755):
  length-diff, word-count (cap 25), dietary-term mismatch, special-char
  count mismatch, digit-presence mismatch; floor at 0.
- cross-algorithm disagreement penalty (app/etl.py:1280-1294): if the
  scorers deviate by more than 20 points, subtract 15.
- band routing (app/etl.py:1318-1374): >=97 auto_resolve, [50, 97) review,
  <50 reject.
- confidence class (app/routes.py:31-39): >=90 high, >=70 medium, else low.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from pyp_etl_pipeline_spark import schema as S


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


# ---------------------------------------------------------------- tokenizing

def tokens(c: Column | str) -> Column:
    """Sorted distinct lowercase whitespace tokens (empty strings dropped)."""
    c = _col(c)
    toks = F.split(F.lower(F.trim(c)), r"\s+")
    return F.array_sort(F.array_distinct(F.filter(toks, lambda x: x != F.lit(""))))


# ------------------------------------------------------------------ scorers

def ratio(a: Column | str, b: Column | str) -> Column:
    """Normalized Levenshtein similarity in [0, 100]."""
    a, b = _col(a), _col(b)
    both_empty = (F.length(a) == 0) & (F.length(b) == 0)
    return F.when(both_empty, F.lit(100.0)).otherwise(
        100.0 * (1.0 - F.levenshtein(a, b) / F.greatest(F.length(a), F.length(b)))
    )


def containment_ratio(a: Column | str, b: Column | str) -> Column:
    """partial_ratio analog: 100 if one lowercased string contains the
    other, else plain ``ratio``. Captures the reference's use of
    partial_ratio for substring-ish matches without O(n*m) alignment."""
    a, b = F.lower(F.trim(_col(a))), F.lower(F.trim(_col(b)))
    contains = a.contains(b) | b.contains(a)
    return F.when(contains, F.lit(100.0)).otherwise(ratio(a, b))


def token_set_ratio(a: Column | str, b: Column | str) -> Column:
    """token_set_ratio analog over sorted distinct token sets.

    s0 = join(sorted(A & B)), s1 = s0 + ' ' + join(sorted(A - B)),
    s2 = s0 + ' ' + join(sorted(B - A)); score = max pairwise ``ratio``.
    """
    ta, tb = tokens(a), tokens(b)
    inter = F.array_join(F.array_intersect(ta, tb), " ")
    rest_a = F.array_join(F.array_except(ta, tb), " ")
    rest_b = F.array_join(F.array_except(tb, ta), " ")

    def _glue(base: Column, rest: Column) -> Column:
        return F.when(F.length(rest) == 0, base).otherwise(
            F.when(F.length(base) == 0, rest).otherwise(F.concat(base, F.lit(" "), rest))
        )

    s0 = inter
    s1 = _glue(inter, rest_a)
    s2 = _glue(inter, rest_b)
    return F.greatest(ratio(s0, s1), ratio(s0, s2), ratio(s1, s2))


def dice_token_score(a: Column | str, b: Column | str) -> Column:
    """Sorensen-Dice coefficient over distinct token sets, in [0, 100].
    The blocking-friendly scorer used by the distributed similarity join."""
    ta, tb = tokens(a), tokens(b)
    shared = F.size(F.array_intersect(ta, tb))
    denom = F.size(ta) + F.size(tb)
    return F.when(denom == 0, F.lit(0.0)).otherwise(200.0 * shared / denom)


# ---------------------------------------------------------------- penalties

def _count_special(c: Column) -> Column:
    # count of chars in !@#$%^&*() — length minus length-with-them-removed
    return F.length(c) - F.length(F.regexp_replace(c, r"[!@#$%^&*()]", ""))


def _has_dietary(c: Column) -> Column:
    lc = F.lower(c)
    out = F.lit(False)
    for term in S.DIETARY_TERMS:
        out = out | lc.contains(term)
    return out


def apply_match_penalties(raw_score: Column | str, text: Column | str, match: Column | str) -> Column:
    """Penalty-adjusted rescoring (J4), reference app/etl.py:713-755."""
    raw_score, text, match = _col(raw_score), _col(text), _col(match)
    lt, lm = F.length(text), F.length(match)
    length_penalty = (F.abs(lt - lm) / F.greatest(lt, lm, F.lit(1))) * S.LENGTH_PENALTY_MULTIPLIER

    wc_t = F.size(F.filter(F.split(F.trim(text), r"\s+"), lambda x: x != F.lit("")))
    wc_m = F.size(F.filter(F.split(F.trim(match), r"\s+"), lambda x: x != F.lit("")))
    word_penalty = F.least(
        F.abs(wc_t - wc_m) * S.WORD_COUNT_PENALTY_MULTIPLIER, F.lit(S.WORD_COUNT_PENALTY_CAP)
    )

    dietary_penalty = F.when(
        _has_dietary(text) != _has_dietary(match), F.lit(S.DIETARY_TERMS_PENALTY)
    ).otherwise(F.lit(0.0))

    special_penalty = F.when(
        _count_special(text) != _count_special(match), F.lit(S.SPECIAL_CHARS_PENALTY)
    ).otherwise(F.lit(0.0))

    numbers_penalty = F.when(
        text.rlike("[0-9]") != match.rlike("[0-9]"), F.lit(S.NUMBERS_PENALTY)
    ).otherwise(F.lit(0.0))

    adjusted = raw_score - length_penalty - word_penalty - dietary_penalty - special_penalty - numbers_penalty
    return F.greatest(adjusted, F.lit(0.0))


def algorithm_disagreement_penalty(*scores: Column) -> Column:
    """J3: if max pairwise deviation across scorers > threshold, penalty 15."""
    spread = F.greatest(*scores) - F.least(*scores)
    return F.when(
        spread > S.ALGORITHM_DISAGREEMENT_THRESHOLD, F.lit(S.ALGORITHM_DISAGREEMENT_PENALTY)
    ).otherwise(F.lit(0.0))


# ------------------------------------------------------------------ banding

def band(score: Column | str) -> Column:
    """J6 three-band routing: auto_resolve / review / reject."""
    score = _col(score)
    return (
        F.when(score >= S.AUTO_RESOLVE_THRESHOLD, F.lit("auto_resolve"))
        .when(score >= S.AUTO_REJECT_THRESHOLD, F.lit("review"))
        .otherwise(F.lit("reject"))
    )


def confidence_class(score: Column | str) -> Column:
    """T8 confidence bucketing: high / medium / low."""
    score = _col(score)
    return (
        F.when(score >= 90, F.lit("high"))
        .when(score >= 70, F.lit("medium"))
        .otherwise(F.lit("low"))
    )
