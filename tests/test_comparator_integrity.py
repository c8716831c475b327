"""Meta-tests of the oracle comparator itself — a vacuously-green
comparator is worse than none, so prove it actually DISTINGUISHES:
value changes, dtype changes (int vs float), row-count changes, column
renames, null-vs-string collisions, and column-order insensitivity.
"""

from __future__ import annotations

import math

from tools.check_oracle import canon, norm


def test_value_change_detected():
    a = canon(["x", "y"], [(1, 2.0), (3, 4.0)])
    b = canon(["x", "y"], [(1, 2.0), (3, 4.5)])
    assert a != b


def test_dtype_tagged_int_vs_float():
    # the round-2 corpus_mixture bug class: 3549 (int64) must NOT equal
    # 3549.0 (float64 via DuckDB HUGEINT → pandas)
    assert norm(3549) != norm(3549.0)
    assert norm(True) != norm(1)
    assert norm(None) != norm("None") != norm("null:")


def test_string_numeric_namespace_disjoint():
    assert norm("i:5") != norm(5)
    assert norm("f:NaN") != norm(float("nan"))
    assert norm(float("nan")) == norm(float("nan"))  # NaN compares stable


def test_zero_sign_distinguished():
    # round-13 (driver-strict): the driver's value hash distinguishes
    # -0.0 from +0.0 — the r12 lineitem_footer_stats failure was
    # invisible locally precisely because the comparator collapsed
    # them; it must never again be laxer than the driver on this class
    assert norm(0.0) != norm(-0.0)
    assert norm(-0.0) == norm(-0.0)


def test_column_order_insensitive_row_order_insensitive():
    a = canon(["b", "a"], [(2.0, 1), (4.0, 3)])
    b = canon(["a", "b"], [(3, 4.0), (1, 2.0)])
    assert a == b


def test_missing_row_and_renamed_column_detected():
    base = canon(["x"], [(1,), (2,)])
    assert base != canon(["x"], [(1,)])
    assert base[0] != canon(["y"], [(1,), (2,)])[0]
