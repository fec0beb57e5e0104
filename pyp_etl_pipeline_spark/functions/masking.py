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


# ------------------------------------------------------------------ PII scrub
#
# Training-corpus PII redaction as pure column algebra (the scale
# extension of T9's audit masking): conservative, engine-portable
# regexes — each pattern uses only syntax that Java regex (Spark) and
# RE2 (DuckDB) interpret identically, so the px01 oracle reproduces
# every replacement bit-for-bit. Patterns are deliberately
# high-precision (anchored shapes, length-bounded runs): at 100 TB a
# recall-greedy PII pass destroys training text; precision-first with
# per-class counters lets the pipeline quantify and iterate.

PII_PATTERNS = {
    # local@domain.tld — no nested quantifiers, no backtracking blowups
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,6}",
    # 1-555-123-4567 / (555) 123-4567 / 555-123-4567 style NANP shapes
    "phone": r"\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}",
    # dotted-quad IPv4
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
    # 123-45-6789 SSN shape
    "ssn": r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
}


def pii_counts(c: Column | str) -> dict[str, Column]:
    """Per-class PII hit counters (regexp_count — JVM-side)."""
    c = F.col(c) if isinstance(c, str) else c
    return {name: F.regexp_count(c, F.lit(pat)) for name, pat in PII_PATTERNS.items()}


def scrub_pii(c: Column | str) -> Column:
    """Replace every PII hit with a typed placeholder (<EMAIL>, <PHONE>,
    <IPV4>, <SSN>). Order matters and is FIXED: email before phone (an
    address can contain digit runs), ssn before ipv4 is irrelevant but
    pinned for determinism — the oracle applies the same order."""
    c = F.col(c) if isinstance(c, str) else c
    out = c
    for name in ("email", "phone", "ssn", "ipv4"):
        out = F.regexp_replace(out, PII_PATTERNS[name], f"<{name.upper()}>")
    return out


def pseudonymize(c: Column | str, cls: str, salt: str = "pseudo-v1") -> Column:
    """Replace each PII hit of one class with a DETERMINISTIC per-value
    token — ``<EMAIL:ab12cd34>`` from the md5 of the matched text+salt —
    instead of ``scrub_pii``'s one-placeholder-fits-all. The property
    that matters for a training/analytics corpus: the same address maps
    to the same token everywhere, so identity joins, dedup keys, and
    frequency analyses survive redaction (referential integrity), while
    the raw value does not.

    Pure column algebra, map-only: split on the pattern, hash the
    extracted matches, interleave back. Same engine-portable regexes as
    ``PII_PATTERNS``; the twin reproduces every token bit-for-bit.
    """
    c = F.col(c) if isinstance(c, str) else c
    pat = PII_PATTERNS[cls]
    parts = F.split(c, pat, -1)
    matches = F.regexp_extract_all(c, F.lit(pat), 0)
    toks = F.transform(
        matches,
        lambda m: F.concat(
            F.lit(f"<{cls.upper()}:"),
            F.substring(F.md5(F.concat(m, F.lit(salt))), 1, 8),
            F.lit(">"),
        ),
    )
    n = F.size(matches)
    return F.concat(
        F.array_join(
            F.zip_with(F.slice(parts, 1, n), toks, lambda p, t: F.concat(p, t)), ""
        ),
        F.element_at(parts, -1),
    )


def noisy_group_counts(
    df: DataFrame,
    keys: tuple[str, ...],
    noise_bound: int = 20,
    salt: str = "dp-v1",
) -> DataFrame:
    """Privacy-budgeted count release: per-group counts perturbed by
    BOUNDED integer noise before publication — the release-side
    complement of px01 (scrub), px02 (pseudonymize) and ka01
    (k-anonymity). The noise is uniform in [-bound, +bound], keyed by
    md5(group || salt): deterministic per (group, salt) — re-running a
    release never leaks extra information through noise resampling (the
    'sticky noise' property of production DP systems), and changing the
    salt draws a fresh release. Counts clamp at 0. A calibrated
    geometric/Laplace mechanism drops in by replacing the uniform draw;
    the bounded-uniform form keeps the pipeline engine-exact.

    Shape: one partial-aggregated groupBy; the noise is a map-side
    column expression over the aggregate's tiny output. True counts
    never leave the plan."""
    groups = df.groupBy(*[F.col(k) for k in keys]).agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    # injective group encoding: each component is md5'd separately (32
    # hex chars) or the 1-char tag 'N' for NULL — no separator collisions
    # (('a|b','c') vs ('a','b|c')) and no literal-vs-sentinel collision,
    # so distinct groups never share noise (ADVICE r8)
    key_str = F.concat(
        *[
            F.when(F.col(k).isNull(), F.lit("N")).otherwise(F.md5(F.col(k).cast("string")))
            for k in keys
        ]
    )
    h = F.conv(F.substring(F.md5(F.concat(key_str, F.lit(salt))), 1, 7), 16, 10).cast("long")
    noise = h % (2 * noise_bound + 1) - noise_bound
    return groups.select(
        *keys,
        F.greatest(F.lit(0).cast("long"), (F.col("__n") + noise).cast("long")).alias(
            "noisy_count"
        ),
    )
