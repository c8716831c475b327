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
    # documented rows-only queries: APPROXIMATE ops only (each with
    # error-bound/recall tests) — every streaming query is hash-oracled
    # (deterministic on a finite replay), and the deterministic codec
    # pipelines (image_dhash_index, audio_spectral) carry precomputed
    # independent-reference oracles since round 6
    rows_only = set(qs) - set(oracles)
    assert rows_only == {
        "knn_lsh",
        "knn_ivf",
        "knn_pq",
        "knn_ivf_pq",
        "approx_distinct_users",
        "value_deciles_approx",
        "heavy_hitters_approx",
    }


def test_all_queries_run_small(spark, sf_small):
    """Every declared query executes at sf0.001 and has a stable schema."""
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_small)
        assert df.columns, name
        df.limit(5).collect()
