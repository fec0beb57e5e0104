"""Plan-capture shim for the audit tooling (VERDICT r12 item 3).

Iterative operators (PageRank/star components/BFS frontiers, BPE merge
rounds, MinHash signature stages, cascade filters) anchor each round
with ``DataFrame.localCheckpoint`` — which TRUNCATES lineage, so by the
time the registry query returns its final DataFrame, the per-iteration
building blocks are invisible to any plan inspection. That left
PLANS.md rows for gr01/gr02/bfs01/tk01/cf01 near all-zero and blinded
the registry-wide row-Python / cartesian / nondeterminism sweeps to
exactly the plans that run the most times at scale.

``capture_checkpoint_plans`` closes the blind spot WITHOUT touching
engine code: within the context, every ``localCheckpoint`` call first
records the pre-truncation analyzed + executed plan strings into the
caller's buffer, then proceeds unchanged. Observation only — the audit
tool is the one place a monkeypatch is the right tool, because the
engine's checkpoint semantics must stay byte-identical in production.
"""

from __future__ import annotations

from contextlib import contextmanager

# Spark 4 split the API: pyspark.sql.dataframe.DataFrame is the abstract
# parent and sessions hand out pyspark.sql.classic.dataframe.DataFrame,
# which OVERRIDES localCheckpoint — patching only the parent intercepts
# nothing. Patch the concrete class (fall back to the parent on older
# layouts).
try:
    from pyspark.sql.classic.dataframe import DataFrame as _ConcreteDF
except ImportError:  # pragma: no cover — pre-4.0 layout
    from pyspark.sql.dataframe import DataFrame as _ConcreteDF


@contextmanager
def capture_checkpoint_plans(buffer: list):
    """Record {"analyzed": str, "executed": str} into ``buffer`` for
    every DataFrame.localCheckpoint call made inside the context."""
    orig = _ConcreteDF.localCheckpoint

    def capturing(self, eager: bool = True):
        qe = self._jdf.queryExecution()
        buffer.append(
            {
                "analyzed": qe.analyzed().toString(),
                "executed": qe.executedPlan().toString(),
            }
        )
        return orig(self, eager=eager)

    _ConcreteDF.localCheckpoint = capturing
    try:
        yield buffer
    finally:
        _ConcreteDF.localCheckpoint = orig
