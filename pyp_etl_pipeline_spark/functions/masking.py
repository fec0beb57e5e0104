"""Sensitive-value masking (T9) as column expressions.

Reference semantics (``app/logging_utils.py:38-56``): dict keys containing
token / password / secret / key / auth get their values fully masked;
long base64-ish strings (> 20 chars of [A-Za-z0-9+/=]) are masked
wherever they appear. Here both become pure column expressions so audit
outputs can be masked at write time without leaving the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SENSITIVE_KEY_MARKERS = ("token", "password", "secret", "key", "auth", "credential")
MASK = "***MASKED***"
_BASE64ISH = r"[A-Za-z0-9+/=]{21,}"


def is_sensitive_key(name: str) -> bool:
    low = name.lower()
    return any(m in low for m in SENSITIVE_KEY_MARKERS)


def mask_base64ish(c: Column | str) -> Column:
    """Mask embedded base64-ish runs longer than 20 chars."""
    c = F.col(c) if isinstance(c, str) else c
    return F.regexp_replace(c, _BASE64ISH, MASK)


def mask_columns(df: DataFrame, extra_sensitive: tuple[str, ...] = ()) -> DataFrame:
    """Mask sensitive columns by name + base64-ish runs in all string
    columns — the log-sanitization pass as a DataFrame transform."""
    out = []
    for f_ in df.schema.fields:
        col = F.col(f_.name)
        if f_.dataType.simpleString() == "string":
            if is_sensitive_key(f_.name) or f_.name in extra_sensitive:
                col = F.when(col.isNotNull(), F.lit(MASK)).otherwise(col)
            else:
                col = mask_base64ish(col)
        out.append(col.alias(f_.name))
    return df.select(*out)
