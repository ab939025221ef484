"""Cohort retention matrix (operators/cohort.py)."""

from __future__ import annotations

from datetime import datetime

import pytest

from med_doi_feature_extraction_spark.operators.cohort import (
    cohort_retention,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "uid long, ts timestamp")


def _cells(spark, rows):
    out = cohort_retention(_df(spark, rows), ["uid"], "ts").collect()
    return {(str(r["cohort_day"]), r["day_offset"]): r for r in out}


def test_hand_computed(spark):
    d = lambda day, h=0: datetime(2024, 1, day, h)
    rows = [
        # cohort Jan 1: users 1, 2
        (1, d(1)), (2, d(1)),
        # day 2: only user 1 returns (twice — distinct-day counted once)
        (1, d(2)), (1, d(2, 5)),
        # day 3: both return
        (1, d(3)), (2, d(3)),
        # cohort Jan 2: user 3
        (3, d(2)), (3, d(4)),
    ]
    by = _cells(spark, rows)
    assert by[("2024-01-01", 0)]["cohort_size"] == 2
    assert by[("2024-01-01", 0)]["retention"] == 1.0
    assert by[("2024-01-01", 1)]["n_active"] == 1
    assert by[("2024-01-01", 1)]["retention"] == 0.5
    assert by[("2024-01-01", 2)]["retention"] == 1.0
    assert by[("2024-01-02", 0)]["cohort_size"] == 1
    assert by[("2024-01-02", 2)]["n_active"] == 1


def test_offset_zero_always_full(spark):
    rows = [
        (i, datetime(2024, 1, 1 + (i % 3), 12)) for i in range(30)
    ]
    by = _cells(spark, rows)
    for (day, off), r in by.items():
        if off == 0:
            assert r["retention"] == 1.0


def test_within_day_repeats_not_double_counted(spark):
    rows = [(1, datetime(2024, 1, 1, h)) for h in range(10)]
    by = _cells(spark, rows)
    assert by[("2024-01-01", 0)]["n_active"] == 1


def test_null_ts_ignored(spark):
    rows = [(1, datetime(2024, 1, 1)), (2, None)]
    by = _cells(spark, rows)
    assert sum(r["cohort_size"] for (_, o), r in by.items() if o == 0) == 1
