"""Plan-quality invariants: column pruning, predicate pushdown, broadcast
joins. These are the scale properties SCALE.md documents — pinned here so
a refactor that silently loses a pushdown or broadcasts stops CI."""

from __future__ import annotations

import re

import pytest

from pyp_etl_pipeline_spark.driver_queries_ext import REGISTRY


def plan_of(spark, sf_dir, name: str) -> str:
    fn, _ = REGISTRY[name]
    return fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def read_schemas(plan: str) -> list[str]:
    return re.findall(r"ReadSchema: struct<([^>]*)>", plan)


def test_q03_prunes_columns_and_broadcasts(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q03_region_revenue")
    # 5-table star join: every scan column-pruned to the referenced few
    for schema in read_schemas(plan):
        assert len(schema.split(",")) <= 3, f"unpruned scan: {schema}"
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan
    assert "PushedFilters: [" in plan


def test_flagship_broadcast_and_pushdown(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "flagship_band_rollup")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    scans = read_schemas(plan)
    assert all(len(s.split(",")) <= 4 for s in scans), scans


def test_j01_dimension_is_broadcast(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "j01_exact_resolution")
    assert "BroadcastHashJoin" in plan


def test_no_cartesian_products_anywhere(spark, sf_dir):
    """No query may plan a CartesianProduct; nested-loop joins are allowed
    only as broadcast NLJ (and none are expected today)."""
    offenders = {}
    for name in ["q01_pricing_summary", "j02_fuzzy_topk", "dd03_minhash_lsh_pairs",
                 "ann01_cosine_topk", "w03_sessionize_30m", "a01_band_summary"]:
        plan = plan_of(spark, sf_dir, name)
        if "CartesianProduct" in plan:
            offenders[name] = True
    assert not offenders


def test_scoring_pipeline_is_python_free(spark, sf_dir):
    """The similarity scoring pipeline must stay JVM-side: no Python
    evaluation nodes (row-wise or Arrow) may appear in the plan. (The
    pre-execution AQE plan hides WholeStageCodegen markers, so codegen
    presence itself isn't assertable here.)"""
    for name in ["j02_fuzzy_topk", "a01_band_summary", "tx01_quality_features", "dd03_minhash_lsh_pairs"]:
        plan = plan_of(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


def test_sp01_hash_split_is_map_only(spark, sf_dir):
    """The split assignment must stay a pure column predicate — any
    Exchange here means someone turned a map-only routing into a shuffle."""
    plan = plan_of(spark, sf_dir, "sp01_hash_split")
    assert "Exchange" not in plan, plan


def test_fuzzy_chain_keeps_window_group_limit(spark, sf_dir):
    """The raw top-10 filter must keep compiling to WindowGroupLimit
    (per-map-partition top-k before the shuffle) — losing it regressed
    the chain 2.5x when tried with a second full window."""
    plan = plan_of(spark, sf_dir, "j02_fuzzy_topk")
    assert "WindowGroupLimit" in plan, plan


def test_tx05_repetition_is_python_free(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "tx05_repetition")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bloom_probe_side_never_shuffles(spark, sf_dir):
    """SCALE.md's r8 claim for sketch.bloom_probe: membership is k
    element_at lookups against a one-row broadcast map — the probe
    relation must reach the verdict with ZERO exchanges (the pre-r8
    groupBy on all probe columns was a full shuffle; its removal also
    fixed the duplicate-probe false negative). The bitset fold itself is
    a one-row aggregate on the (tiny) bloom side, planned as broadcast."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    from pyp_etl_pipeline_spark.operators import sketch  # noqa: PLC0415

    probes = spark.range(1000).select(F.concat(F.lit("it"), F.col("id")).alias("v"))
    bloom = sketch.bloom_build(probes.limit(100), "v")
    plan = sketch.bloom_probe(probes, bloom, "v")._jdf.queryExecution().executedPlan().toString()
    # the only shuffles allowed are the bitset fold's (keyed on 'word');
    # any hashpartitioning on probe columns means the probe side shuffled
    import re  # noqa: PLC0415

    for m in re.finditer(r"hashpartitioning\(([^)]*)\)", plan):
        assert "word" in m.group(1), plan
    assert plan.count("BroadcastExchange") >= 1  # the one-row map rides broadcast


def test_no_row_python_eval_registry_wide(spark, sf_dir):
    """SCALE.md's headline plan-quality claim: no row-at-a-time Python UDF
    anywhere in the engine. Arrow-vectorized nodes (ArrowEvalPython /
    MapInPandas / FlatMapGroupsInPandas) are the sanctioned Python escape
    hatch; BatchEvalPython is never acceptable. Plan-only (no execution),
    so this sweeps the whole registry cheaply. Streaming entries are
    skipped: building their DataFrame drains a streaming query.
    Pre-localCheckpoint stage plans are captured too (VERDICT r12 item
    3): the per-iteration building blocks of gr01/bfs01/tk01/cf01 are
    exactly the plans that run the most times at scale, and lineage
    truncation would otherwise hide them from this sweep."""
    from pyp_etl_pipeline_spark.plan_audit import capture_checkpoint_plans

    streaming = {"st01_streaming_tumbling", "st02_streaming_sliding",
                 "st03_stateful_running_totals", "st04_streaming_dedup"}
    offenders = {}
    for name, (fn, _) in sorted(REGISTRY.items()):
        if name in streaming:
            continue
        stages: list[dict] = []
        with capture_checkpoint_plans(stages):
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        n = sum(p.count("BatchEvalPython") for p in [plan, *(s["executed"] for s in stages)])
        if n:
            offenders[name] = n
    assert not offenders, f"row-at-a-time Python UDFs in plans: {offenders}"


def test_no_nondeterministic_expressions_registry_wide(spark, sf_dir):
    """No registry query may plan a nondeterministic expression.

    Round 6's one driver failure (pk01) was a two-pass prefix sum keyed
    on spark_partition_id(): nondeterministic under recompute, so the
    two consumer branches of the ranged relation could observe different
    pids after a task retry or AQE re-plan and silently corrupt every
    offset. On a 1000-executor cluster task retries are routine — any
    result that depends on physical placement or an unseeded RNG is a
    latent wrong-answer bug, so the whole registry is pinned to zero.
    Analyzed-plan string sweep (no execution); streaming entries are
    skipped (building their DataFrame drains a streaming query)."""
    import re as _re

    banned = _re.compile(
        r"spark_partition_id\(|monotonically_increasing_id\(|\brand\(|"
        r"\brandn\(|\buuid\(|\bshuffle\(|input_file_name\("
    )
    from pyp_etl_pipeline_spark.plan_audit import capture_checkpoint_plans

    streaming = {"st01_streaming_tumbling", "st02_streaming_sliding",
                 "st03_stateful_running_totals", "st04_streaming_dedup"}
    offenders = {}
    for name, (fn, _) in sorted(REGISTRY.items()):
        if name in streaming:
            continue
        stages: list[dict] = []
        with capture_checkpoint_plans(stages):
            plan = fn(spark, sf_dir)._jdf.queryExecution().analyzed().toString()
        hits = sorted(
            {h for p in [plan, *(s["analyzed"] for s in stages)] for h in banned.findall(p)}
        )
        if hits:
            offenders[name] = hits
    assert not offenders, f"nondeterministic expressions in plans: {offenders}"


@pytest.mark.slow
def test_unpartitioned_windows_are_bounded_registry_wide(spark, sf_dir):
    """Every UNPARTITIONED window in the registry must be intentional and
    provably bounded: its subtree contains a TakeOrderedAndProject /
    limit (top-k epilogues) or a grouped aggregate whose key domain is
    constant-bounded (bins, sources, distinct scores). An unpartitioned
    window over an UNBOUNDED relation moves the whole dataset to one
    partition — the classic scale killer this pin makes impossible to
    reintroduce silently (VERDICT r8 'WindowExec: No Partition Defined'
    nit). Any new query planning one must be added to the allowlist
    with a boundedness argument."""
    BOUNDED_OK = {
        # query -> why the single window partition is constant-size
        "a10_length_histogram": "50-char bins of doc length (dozens of rows)",
        "bm01_bm25_rank": "TakeOrdered top-k + per-term aggregate",
        "cp01_compaction_plan": "file-size buckets aggregate",
        "ev03_rank_agreement": "top-k ranking comparison (limit-bounded)",
        "ev06_quality_auc": "distinct score values of an integer feature",
        "hy01_hybrid_rrf_fusion": "two limit-k rankings fused",
        "mx03_temperature_mixture": "one row per corpus source",
        "pk01_sequence_packing": "per-bucket offsets over bucket aggregate",
        "sa01_skew_audit": "top-N hottest keys (TakeOrdered-bounded)",
        "tk04_vocab_coverage_curve": "TakeOrdered top-k vocab ranking",
        "tx18_zipf_fit": "TakeOrdered top-100 token ranks",
    }
    BOUNDING_NODES = {
        "TakeOrderedAndProjectExec",
        "GlobalLimitExec",
        "LocalLimitExec",
        "CollectLimitExec",
        "HashAggregateExec",
        "ObjectHashAggregateExec",
        "SortAggregateExec",
    }

    def iter_nodes(node):
        yield node
        cls = node.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            yield from iter_nodes(node.initialPlan())
            return
        if cls.endswith("QueryStageExec"):
            yield from iter_nodes(node.plan())
            return
        for i in range(node.children().size()):
            yield from iter_nodes(node.children().apply(i))

    streaming = {n for n in REGISTRY if n.startswith("st")}
    offenders = {}
    for name, (fn, _) in sorted(REGISTRY.items()):
        if name in streaming:
            continue
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan()
        for node in iter_nodes(plan):
            if node.getClass().getSimpleName() not in ("WindowExec", "WindowGroupLimitExec"):
                continue
            if not node.partitionSpec().isEmpty():
                continue
            below = {ch.getClass().getSimpleName() for ch in iter_nodes(node)}
            if name not in BOUNDED_OK:
                offenders[name] = "unpartitioned window in a query not on the allowlist"
            elif not (below & BOUNDING_NODES):
                offenders[name] = "allowlisted but no bounding node below the window"
    assert not offenders, f"unbounded unpartitioned windows: {offenders}"
