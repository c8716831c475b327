"""Driver-contract smoke tests: entry() runs, queries()/oracle_sql() align."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_queries_oracles_aligned():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert set(oracles) <= set(qs), "oracle without a query"
    # documented rows-only queries — ONLY ops whose output depends on
    # run-time nondeterminism (HLL sketch internals, GK-sketch merge
    # order), each with error-bound/recall tests. Everything
    # deterministic is hash-oracled: streaming (finite replay), the
    # codec pipelines (r6) and the FULL ANN family (knn_lsh included)
    # + BPE loop + k-means (r7) via precomputed independent-reference
    # VALUES oracles, heavy_hitters_approx via the exact top-k SQL.
    rows_only = set(qs) - set(oracles)
    assert rows_only == {
        "approx_distinct_users",
        "value_deciles_approx",
    }


def test_all_queries_run_small(spark, sf_small):
    """Every declared query executes at sf0.001 and has a stable schema."""
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_small)
        assert df.columns, name
        df.limit(5).collect()
