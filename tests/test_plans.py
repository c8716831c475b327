"""Physical-plan regression tests: the queries must keep compiling to
scale-appropriate plans (pushdown, pruning, broadcast, partial agg,
no cartesian products, narrow ops staying narrow). A lost broadcast or
a filter that stops pushing is a perf bug even while results stay
correct — this is the 100 TB guardrail."""

from __future__ import annotations

from tools.explain_audit import audit_all


def test_physical_plans(spark, sf_med):
    # cached relations from earlier tests would change plan shapes
    # (InMemoryTableScan embeds its own Exchange) — audit clean plans
    spark.catalog.clearCache()
    results = audit_all(spark, sf_med)
    bad = {k: v for k, v in results.items() if v}
    assert not bad, f"plan regressions: {bad}"
