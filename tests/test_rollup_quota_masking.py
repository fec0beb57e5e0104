"""Rollup/summary operators (A1-A6), T9 masking, and sink-writer policies
(retry/backoff, daily quota)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyp_etl_pipeline_spark.functions import masking
from pyp_etl_pipeline_spark.operators import quota, rollup


# ------------------------------------------------------------------ rollup

def test_review_state_summary(spark):
    rows = [
        (None, False), (None, False),      # pending
        (True, False),                     # approved
        (False, False),                    # rejected
        (None, True),                      # ignored
    ]
    df = spark.createDataFrame(rows, "approved boolean, ignored boolean")
    out = {r["state"]: r["n"] for r in rollup.review_state_summary(df).collect()}
    assert out == {"pending": 2, "approved": 1, "rejected": 1, "ignored": 1}


def test_per_member_rollup(spark):
    rows = [(1, "A"), (1, "B"), (1, "A"), (2, None), (2, "C")]
    df = spark.createDataFrame(rows, "member_id long, matched_id string")
    out = {r["member_id"]: r for r in rollup.per_member_rollup(df).collect()}
    assert out[1]["all_ids"] == ["A", "B"] and out[1]["n_items"] == 3
    assert out[2]["all_ids"] == ["C"]  # NULLs excluded


def test_top_k_per_group_deterministic(spark):
    rows = [(1, 10.0, "b"), (1, 10.0, "a"), (1, 5.0, "c"), (2, 1.0, "d")]
    df = spark.createDataFrame(rows, "g long, score double, name string")
    out = rollup.top_k_per_group(df, ["g"], "score", k=2, tiebreak_cols=["name"]).collect()
    g1 = [(r["name"], r["rank"]) for r in out if r["g"] == 1]
    assert sorted(g1, key=lambda t: t[1]) == [("a", 1), ("b", 2)]


def test_observe_quota_metrics(spark, tmp_path):
    df = spark.createDataFrame([(100,), (250,)], "nbytes int")
    observed, obs = rollup.observe_quota(df, "nbytes")
    observed.write.mode("overwrite").parquet(str(tmp_path / "out"))
    metrics = obs.get
    assert metrics["bytes_processed"] == 350 and metrics["rows"] == 2
    # metrics feed the daily quota gate
    q = quota.DailyQuota(limit_bytes=1000)
    q.record("2026-08-13", metrics["bytes_processed"])
    assert q.state("2026-08-13") == "ok"


# ------------------------------------------------------------------ masking

def test_mask_columns_by_name_and_content(spark):
    rows = [("alice", "tok_abc", "QWxhZGRpbjpvcGVuIHNlc2FtZQxxFAKE12 rest", "short")]
    df = spark.createDataFrame(rows, "user string, api_token string, blob string, note string")
    out = masking.mask_columns(df).collect()[0]
    assert out["api_token"] == masking.MASK          # sensitive key name
    assert masking.MASK in out["blob"]               # base64-ish run masked
    assert out["blob"].endswith(" rest")             # non-sensitive tail kept
    assert out["user"] == "alice" and out["note"] == "short"


def test_is_sensitive_key():
    assert masking.is_sensitive_key("DGRAPH_AUTH_TOKEN")
    assert masking.is_sensitive_key("passwordHash")
    assert not masking.is_sensitive_key("businessName")


# ------------------------------------------------------------ retry / quota

def test_categorize_error():
    assert quota.categorize_error(TimeoutError("request timed out")) == quota.ErrorCategory.TIMEOUT
    assert quota.categorize_error(ConnectionError("connection refused")) == quota.ErrorCategory.NETWORK
    assert quota.categorize_error(RuntimeError("HTTP 429 rate limited")) == quota.ErrorCategory.RATE_LIMIT
    assert quota.categorize_error(ValueError("validation failed")) == quota.ErrorCategory.VALIDATION


def test_backoff_delays_exponential():
    assert quota.backoff_delays(quota.ErrorCategory.TIMEOUT) == [2.0, 4.0, 8.0]
    assert quota.backoff_delays(quota.ErrorCategory.VALIDATION) == []


def test_run_with_retry_succeeds_after_failures():
    calls = {"n": 0}
    sleeps: list[float] = []

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise TimeoutError("timed out")
        return "ok"

    assert quota.run_with_retry(flaky, sleep=sleeps.append) == "ok"
    assert calls["n"] == 3 and sleeps == [2.0, 4.0]


def test_run_with_retry_no_retry_on_validation():
    calls = {"n": 0}

    def bad():
        calls["n"] += 1
        raise ValueError("validation failed")

    with pytest.raises(ValueError):
        quota.run_with_retry(bad, sleep=lambda s: None)
    assert calls["n"] == 1


def test_daily_quota_states():
    q = quota.DailyQuota(limit_bytes=1000)
    q.record("2026-08-13", 500)
    assert q.state("2026-08-13") == "ok"
    q.record("2026-08-13", 350)
    assert q.state("2026-08-13") == "warning"   # >= 80%
    assert q.check_before_write("2026-08-13", 100)
    assert not q.check_before_write("2026-08-13", 200)
    q.record("2026-08-13", 200)
    assert q.state("2026-08-13") == "exceeded"
    assert q.state("2026-08-14") == "ok"        # day buckets independent


def test_scrub_pii_and_counts(spark):
    from pyspark.sql import functions as F

    from pyp_etl_pipeline_spark.functions import masking

    rows = [
        (1, "mail me at alice.smith+x@corp.example.com today"),
        (2, "call (555) 123-4567 or 555-987-6543 now"),
        (3, "server 192.168.1.200 ssn 123-45-6789"),
        (4, "nothing sensitive here"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    pii = masking.pii_counts(F.col("t"))
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            masking.scrub_pii("t").alias("s"),
            *[pii[n].alias(n) for n in ("email", "phone", "ipv4", "ssn")],
        ).collect()
    }
    assert out[1]["s"] == "mail me at <EMAIL> today"
    assert out[1]["email"] == 1 and out[1]["phone"] == 0
    assert out[2]["s"] == "call <PHONE> or <PHONE> now"
    assert out[2]["phone"] == 2
    assert out[3]["s"] == "server <IPV4> ssn <SSN>"
    assert out[3]["ipv4"] == 1 and out[3]["ssn"] == 1
    assert out[4]["s"] == "nothing sensitive here"
    assert out[5]["s"] is None


def test_pseudonymize_deterministic_and_referential(spark):
    from pyspark.sql import functions as F

    from pyp_etl_pipeline_spark.functions import masking

    df = spark.createDataFrame(
        [
            (1, "write to alice@example.com about x"),
            (2, "alice@example.com and bob@example.com met"),
            (3, "no pii here"),
        ],
        "id long, text string",
    )
    out = {r["id"]: r["p"] for r in df.select("id", masking.pseudonymize("text", "email").alias("p")).collect()}
    # same identity -> same token across documents (referential integrity)
    tok1 = out[1].split()[2]
    assert tok1.startswith("<EMAIL:") and tok1.endswith(">")
    assert tok1 in out[2]
    # different identity -> different token
    toks2 = [w for w in out[2].split() if w.startswith("<EMAIL:")]
    assert len(set(toks2)) == 2
    # surrounding text intact, no-match rows unchanged
    assert out[1] == f"write to {tok1} about x"
    assert out[3] == "no pii here"


def test_pseudonymize_salt_changes_tokens(spark):
    from pyp_etl_pipeline_spark.functions import masking

    df = spark.createDataFrame([(1, "alice@example.com")], "id long, text string")
    a = df.select(masking.pseudonymize("text", "email", salt="s1").alias("p")).collect()[0]["p"]
    b = df.select(masking.pseudonymize("text", "email", salt="s2").alias("p")).collect()[0]["p"]
    assert a != b and a.startswith("<EMAIL:") and b.startswith("<EMAIL:")
