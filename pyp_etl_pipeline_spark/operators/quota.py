"""Sink-writer policies: error categorization, retry/backoff, daily quota
(reference ``app/error_utils.py`` + ``app/routes.py:56-115``).

Spark's task retries cover transient executor failures; these policies
govern the *sink writer* (the part the reference wrapped around every
Dgraph call): which error categories are retryable, how long to back
off, and a daily byte quota enforced before each write batch. The byte
accounting itself rides on ``DataFrame.observe`` (see
``operators/rollup.observe_quota``) so it costs nothing extra at scale.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum


class ErrorCategory(str, Enum):
    """Reference app/error_utils.py categories."""

    NETWORK = "network"
    TIMEOUT = "timeout"
    RATE_LIMIT = "rate_limit"
    QUOTA = "quota"
    VALIDATION = "validation"
    UNKNOWN = "unknown"


#: category -> (retryable, backoff base seconds); reference
#: app/error_utils.py:167-193 (base 1-3 s by category, delay = base * 2^n)
RETRY_POLICY: dict[ErrorCategory, tuple[bool, float]] = {
    ErrorCategory.NETWORK: (True, 1.0),
    ErrorCategory.TIMEOUT: (True, 2.0),
    ErrorCategory.RATE_LIMIT: (True, 3.0),
    ErrorCategory.QUOTA: (False, 0.0),
    ErrorCategory.VALIDATION: (False, 0.0),
    ErrorCategory.UNKNOWN: (True, 1.0),
}

MAX_RETRIES = 3  # reference DGRAPH_MAX_RETRIES, app/config.py:42


def categorize_error(exc: BaseException) -> ErrorCategory:
    """Map an exception to a category by message heuristics (the reference
    categorizes by response shape/status in the same spirit)."""
    msg = str(exc).lower()
    if "timeout" in msg or "timed out" in msg:
        return ErrorCategory.TIMEOUT
    if "connection" in msg or "network" in msg or "unreachable" in msg:
        return ErrorCategory.NETWORK
    if "429" in msg or "rate" in msg:
        return ErrorCategory.RATE_LIMIT
    if "quota" in msg:
        return ErrorCategory.QUOTA
    if "validation" in msg or "invalid" in msg:
        return ErrorCategory.VALIDATION
    return ErrorCategory.UNKNOWN


def backoff_delays(category: ErrorCategory, retries: int = MAX_RETRIES) -> list[float]:
    """delay_n = base * 2^n for retryable categories, else [] (no retry)."""
    retryable, base = RETRY_POLICY[category]
    if not retryable:
        return []
    return [base * (2**n) for n in range(retries)]


@dataclass
class DailyQuota:
    """Daily byte quota with warn threshold (reference
    app/error_utils.py:27-29, :101-134: 5 GB/day hard stop, warn at 80%).
    Feed it the ``observe`` metrics of each written batch."""

    limit_bytes: int = 5 * 1024**3
    warn_fraction: float = 0.8
    used_bytes: int = 0
    days: dict[str, int] = field(default_factory=dict)

    def record(self, day: str, n_bytes: int) -> None:
        self.days[day] = self.days.get(day, 0) + n_bytes
        self.used_bytes = self.days[day]

    def state(self, day: str) -> str:
        used = self.days.get(day, 0)
        if used >= self.limit_bytes:
            return "exceeded"
        if used >= self.limit_bytes * self.warn_fraction:
            return "warning"
        return "ok"

    def check_before_write(self, day: str, incoming_bytes: int) -> bool:
        """True iff the write may proceed (hard stop at the limit)."""
        return self.days.get(day, 0) + incoming_bytes <= self.limit_bytes


def run_with_retry(fn, categorize=categorize_error, retries: int = MAX_RETRIES, sleep=None):
    """Execute a sink write with category-gated exponential backoff.
    ``sleep`` is injectable for tests (defaults to time.sleep)."""
    import time  # noqa: PLC0415

    sleep = sleep or time.sleep
    last: BaseException | None = None
    for attempt in range(retries + 1):
        try:
            return fn()
        except BaseException as exc:  # noqa: BLE001 — policy layer re-raises
            last = exc
            cat = categorize(exc)
            delays = backoff_delays(cat, retries)
            if attempt >= len(delays):
                raise
            sleep(delays[attempt])
    raise last  # pragma: no cover
