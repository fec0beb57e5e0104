"""Row-validation predicates (F3/F4) as native column expressions.

Reference semantics:
- F3 business-name validation: trimmed length in [2, 200], no ``< > " '``
  characters (``app/etl.py:885-893``)
- F4 email validation: optional; if present must match the reference's
  email regex (``app/etl.py:895-902``)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_PATTERN = r"^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}$"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def valid_business_name(c: Column | str) -> Column:
    c = _col(c)
    return (
        c.isNotNull()
        & F.length(F.trim(c)).between(2, 200)
        & ~c.rlike("[<>\"']")
    )


def valid_email(c: Column | str) -> Column:
    """NULL/absent email is valid (optional field)."""
    c = _col(c)
    return c.isNull() | c.rlike(EMAIL_PATTERN)
