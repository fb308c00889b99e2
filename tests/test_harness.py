"""Mutation tests for the differential harness itself: the comparator must
detect every class of divergence (otherwise green runs prove nothing)."""

from __future__ import annotations

import pandas as pd

from oe_batch_processing_spark.testing import compare


def test_compare_equal_is_none():
    a = pd.DataFrame({"k": [1, 2], "v": [1.5, 2.5]})
    b = pd.DataFrame({"v": [2.5, 1.5], "k": [2, 1]})  # order-insensitive
    assert compare(a, b) is None


def test_compare_detects_single_ulp_float_difference():
    a = pd.DataFrame({"v": [1.0000000000000002]})
    b = pd.DataFrame({"v": [1.0]})
    assert "differ" in compare(a, b)


def test_compare_detects_rowcount_and_columns():
    a = pd.DataFrame({"k": [1, 2]})
    assert "rowcount" in compare(a, pd.DataFrame({"k": [1]}))
    assert "columns" in compare(a, pd.DataFrame({"x": [1, 2]}))


def test_compare_detects_type_difference():
    a = pd.DataFrame({"v": [1]})        # int
    b = pd.DataFrame({"v": [1.0]})      # float
    assert compare(a, b) is not None


def test_compare_handles_nulls_and_nan():
    a = pd.DataFrame({"v": [None, float("nan")]}, dtype="object")
    b = pd.DataFrame({"v": [None, float("nan")]}, dtype="object")
    assert compare(a, b) is None
    c = pd.DataFrame({"v": [None, 1.0]}, dtype="object")
    assert compare(a, c) is not None
