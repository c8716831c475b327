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
    # run-time nondeterminism, each with dual-bound tests. The single
    # survivor is value_deciles_approx: GK quantile sketches merge
    # ORDER-DEPENDENTLY, so the result is a function of partitioning,
    # not just of the data — no precomputed oracle can be host-stable.
    # Everything else is hash-oracled: streaming (finite replay), the
    # codec pipelines (r6), the FULL ANN family + BPE loop + k-means
    # (r7), and approx_distinct_users (r8 — HLL registers max-merge, a
    # commutative/associative/idempotent fold, so the sketch IS a pure
    # function of the input set; oracle via a pure-python xxHash64 +
    # HLL++ restatement in tools/gen_hll_oracle.py).
    rows_only = set(qs) - set(oracles)
    assert rows_only == {"value_deciles_approx"}


def test_all_queries_run_small(spark, sf_small):
    """Every declared query executes at sf0.001 and has a stable schema."""
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_small)
        assert df.columns, name
        df.limit(5).collect()
