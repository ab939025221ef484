"""Keyed table diff/reconciliation (operators/tablediff.py)."""

from __future__ import annotations

import pytest

from med_doi_feature_extraction_spark.operators.tablediff import (
    table_diff,
    table_diff_summary,
)


def _frames(spark):
    old = spark.createDataFrame(
        [
            (1, "a", 10),
            (2, "b", 20),
            (3, "c", 30),
            (4, None, 40),
            (5, "e", 50),
        ],
        "k long, s string, v long",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10),        # unchanged
            (2, "B", 20),        # s changed
            (3, "c", 31),        # v changed
            (4, None, 40),       # unchanged (NULL == NULL)
            (6, "f", 60),        # added
        ],  # 5 removed
        "k long, s string, v long",
    )
    return old, new


def test_statuses_and_flags(spark):
    old, new = _frames(spark)
    d = {r["k"]: r for r in table_diff(old, new, ["k"], ["s", "v"]).collect()}
    assert d[1]["status"] == "unchanged"
    assert d[2]["status"] == "changed" and d[2]["s_changed"] and not d[2]["v_changed"]
    assert d[3]["status"] == "changed" and d[3]["v_changed"] and not d[3]["s_changed"]
    assert d[4]["status"] == "unchanged"  # NULL == NULL
    assert d[5]["status"] == "removed" and d[5]["s_changed"] is None
    assert d[6]["status"] == "added" and d[6]["v_changed"] is None


def test_null_vs_value_is_change(spark):
    old = spark.createDataFrame([(1, "x")], "k long, s string")
    new = spark.createDataFrame([(1, None)], "k long, s string")
    r = table_diff(old, new, ["k"], ["s"]).collect()[0]
    assert r["status"] == "changed" and r["s_changed"]


def test_summary_counts(spark):
    old, new = _frames(spark)
    d = table_diff(old, new, ["k"], ["s", "v"])
    s = {r["status"]: r for r in table_diff_summary(d, ["s", "v"]).collect()}
    assert s["unchanged"]["n"] == 2
    assert s["changed"]["n"] == 2
    assert s["changed"]["s_changed_n"] == 1
    assert s["changed"]["v_changed_n"] == 1
    assert s["added"]["n"] == 1 and s["removed"]["n"] == 1
    assert sum(r["share"] for r in s.values()) == pytest.approx(
        1.0, abs=5e-6
    )


def test_identical_snapshots_all_unchanged(spark):
    old, _ = _frames(spark)
    d = table_diff(old, old, ["k"], ["s", "v"])
    s = table_diff_summary(d, ["s", "v"]).collect()
    assert len(s) == 1 and s[0]["status"] == "unchanged"
    assert s[0]["share"] == 1.0
