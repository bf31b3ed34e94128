"""Global physical-plan invariant sweep over the ENTIRE registry.

The per-op plan claims live in PLANS.md and in targeted TestPlanShapes
asserts; this sweep pins the two invariants every query must satisfy at
100 TB regardless of shape:

- **no CartesianProduct, ever** (crossJoins of broadcast 1-row/tiny
  frames compile to BroadcastNestedLoopJoin, which is fine and
  deliberately common here; CartesianProduct is what a dropped join
  condition or a non-broadcast cross join degrades to, and at scale it
  is O(n·m) shuffle death);
- **no row-at-a-time Python, ever** (`BatchEvalPython` — the registry's
  only sanctioned Python boundary is Arrow-batched, and in fact no
  registered query uses Python at all: the one pandas_udf op,
  compression_ratio, is deliberately pytest-only).

Building the DataFrame also re-runs each query's analysis phase, so a
schema regression in ANY registered query fails here without waiting
for the oracle gate.

Runs at sf0.001 — plan construction is the point, not data volume (a
few queries execute bounded driver collects while building; the small SF
keeps those cheap)."""

from __future__ import annotations

import pytest

SF_PLAN_DIR = "/root/testdata/sf0.001"

FORBIDDEN = ("CartesianProduct", "BatchEvalPython")


def test_no_cartesian_or_per_row_python_anywhere(spark):
    from pegasus_spark.analytics.queries import QUERIES
    from pegasus_spark.analytics.pipeline_queries import reset_cluster_memo

    reset_cluster_memo()
    bad: dict[str, str] = {}
    failed: dict[str, str] = {}
    for name, fn in QUERIES.items():
        try:
            plan = (
                fn(spark, SF_PLAN_DIR)
                ._jdf.queryExecution().executedPlan().toString()
            )
        except Exception as exc:  # noqa: BLE001 — collect, then report all
            failed[name] = repr(exc)[:200]
            continue
        for node in FORBIDDEN:
            if node in plan:
                bad[name] = f"{node}: {plan[:400]}"
    assert not failed, f"queries failing to build a plan: {failed}"
    assert not bad, f"forbidden plan nodes in: {list(bad)}\n{bad}"
