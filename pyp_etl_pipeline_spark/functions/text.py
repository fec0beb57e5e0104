"""Text normalization functions (T1-T7) as native column expressions.

Reference semantics:
- T1 sanitize_string: strip, remove HTML tags, escape HTML entities
  (``app/etl.py:757-765``)
- T2 whitespace collapse (``app/etl.py:786``)
- T3 domain variant normalization, ~30 case-insensitive regex rewrites
  (``app/etl.py:789-834``)
- T4 punctuation strip preserving ``- . ()`` and digits (``app/etl.py:836-839``)
- T5 Capital-Case with stopwords + hyphen/dot segment capitalization
  (``app/etl.py:841-883``)
- T6 lowercase key normalization (``app/etl.py:1090-1093``)

All are pure ``pyspark.sql.functions`` compositions (whole-stage codegen,
no Python in the hot path). T5 uses higher-order array functions
(``transform`` with index) instead of a UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from pyp_etl_pipeline_spark.schema import CAPITAL_CASE_STOPWORDS, VARIANT_RULES


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def collapse_whitespace(c: Column | str) -> Column:
    """T2: fold runs of whitespace into single spaces."""
    return F.regexp_replace(_col(c), r"\s+", " ")


def strip_html(c: Column | str) -> Column:
    """Remove HTML tags (``<[^>]+>``)."""
    return F.regexp_replace(_col(c), "<[^>]+>", "")


def escape_html_entities(c: Column | str) -> Column:
    """Escape ``& < > " '`` like ``html.escape`` (amp first)."""
    c = _col(c)
    c = F.regexp_replace(c, "&", "&amp;")
    c = F.regexp_replace(c, "<", "&lt;")
    c = F.regexp_replace(c, ">", "&gt;")
    c = F.regexp_replace(c, '"', "&quot;")
    c = F.regexp_replace(c, "'", "&#x27;")
    return c


def decode_html_entities(c: Column | str) -> Column:
    """Inverse of ``escape_html_entities`` for the five named entities
    (+ the common numeric forms of quote/apos). ``&amp;`` is decoded
    LAST so ``&amp;lt;`` round-trips to the literal ``&lt;`` text
    rather than double-decoding to ``<`` — the same ordering contract
    as python's ``html.unescape`` for this subset. Full numeric/named
    entity coverage needs a per-row lookup; web-extraction pipelines
    normalize the long tail before ingest."""
    c = _col(c)
    c = F.regexp_replace(c, "&lt;", "<")
    c = F.regexp_replace(c, "&gt;", ">")
    c = F.regexp_replace(c, "&quot;|&#34;", '"')
    c = F.regexp_replace(c, "&#x27;|&#39;|&apos;", "'")
    c = F.regexp_replace(c, "&amp;", "&")
    return c


def extract_html_text(c: Column | str) -> Column:
    """Web-page -> training-text extraction (trafilatura-lite): drop
    tags, decode the common entities, collapse whitespace, trim. Pure
    map-side column algebra — at corpus scale this pipelines into the
    scan that feeds quality filtering / dedup."""
    return F.trim(collapse_whitespace(decode_html_entities(strip_html(_col(c)))))


def sanitize_string(c: Column | str, escape_entities: bool = True) -> Column:
    """T1: trim, strip tags, optionally escape HTML entities."""
    out = strip_html(F.trim(_col(c)))
    return escape_html_entities(out) if escape_entities else out


def variant_normalize(c: Column | str) -> Column:
    """T3: table-driven case-insensitive domain rewrites (vit c -> Vitamin C...)."""
    out = _col(c)
    for pattern, replacement in VARIANT_RULES:
        out = F.regexp_replace(out, "(?i)" + pattern, replacement)
    return out


def strip_punctuation(c: Column | str) -> Column:
    """T4: remove ``, ; ! ? ' " [ ] { }`` keeping hyphens/periods/parens/digits."""
    return F.regexp_replace(_col(c), "[,;!?'\"\\[\\]{}]", "")


def lower_key(c: Column | str) -> Column:
    """T6: canonical lowercase join key."""
    return F.lower(F.trim(_col(c)))


def _cap_segment(seg: Column) -> Column:
    # str.capitalize(): first char upper, rest lower; empty-safe
    return F.when(F.length(seg) == 0, seg).otherwise(
        F.concat(F.upper(F.substring(seg, 1, 1)), F.lower(F.substring(seg, 2, 1_000_000)))
    )


def _cap_word(word: Column) -> Column:
    # capitalize each '-' part; within each, each '.' part (B.adolescentis -> B.Adolescentis)
    return F.array_join(
        F.transform(
            F.split(word, "-"),
            lambda part: F.array_join(F.transform(F.split(part, r"\."), _cap_segment), "."),
        ),
        "-",
    )


def capital_case(c: Column | str) -> Column:
    """T5: per-word Capital Case; stopwords lowercase unless first word;
    hyphen / dot segments each capitalized. Native higher-order functions."""
    words = F.split(F.trim(collapse_whitespace(_col(c))), " ")
    stop = F.array(*[F.lit(s) for s in CAPITAL_CASE_STOPWORDS])
    out = F.transform(
        words,
        lambda w, i: F.when((i > 0) & F.array_contains(stop, F.lower(w)), F.lower(w)).otherwise(_cap_word(w)),
    )
    return F.array_join(out, " ")


def normalize_offering_text(c: Column | str) -> Column:
    """Full T2->T3->T4->T5 normalization chain for offering/item names
    (reference ``normalize_offering_text``, app/etl.py:768-883)."""
    out = collapse_whitespace(F.trim(_col(c)))
    out = variant_normalize(out)
    out = strip_punctuation(out)
    out = capital_case(out)
    return F.trim(collapse_whitespace(out))
