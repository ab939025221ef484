"""Classification eval metrics (operators/evalcls.py)."""

from __future__ import annotations

import math

import pytest

from med_doi_feature_extraction_spark.operators.evalcls import (
    brier_score,
    calibration_table,
    classification_report,
)


def _micro(x):
    m = math.floor(abs(x) * 1e6 + 0.5)
    return -m if x < 0 else m


PAIRS = (
    [("a", "a")] * 40
    + [("a", "b")] * 10
    + [("b", "b")] * 25
    + [("b", "c")] * 5
    + [("c", "a")] * 3
    + [("c", "c")] * 7
    + [(None, "a"), ("a", None)]
)


@pytest.fixture(scope="module")
def report(spark):
    df = spark.createDataFrame(PAIRS, "t string, p string")
    return {
        r["class"]: r
        for r in classification_report(df, "t", "p").collect()
    }


def test_report_matches_hand_computation(report):
    # class a: tp=40 fn=10 support=50; predicted a = 40+3 -> fp=3
    a = report["a"]
    assert (a["support"], a["tp"], a["fp"], a["fn"]) == (50, 40, 3, 10)
    assert a["precision"] == pytest.approx(_micro(40 / 43) / 1e6)
    assert a["recall"] == pytest.approx(0.8)
    assert a["f1"] == pytest.approx(_micro(80 / (80 + 3 + 10)) / 1e6)
    # class b: tp=25 fn=5 support=30; predicted b = 25+10 -> fp=10
    b = report["b"]
    assert (b["support"], b["tp"], b["fp"], b["fn"]) == (30, 25, 10, 5)
    # class c: tp=7 fn=3 support=10; predicted c = 7+5 -> fp=5
    c = report["c"]
    assert (c["support"], c["tp"], c["fp"], c["fn"]) == (10, 7, 5, 3)
    assert set(report) == {"a", "b", "c"}  # null rows dropped


def test_report_never_predicted_class(spark):
    df = spark.createDataFrame(
        [("a", "b")] * 5 + [("b", "b")] * 5, "t string, p string"
    )
    rep = {
        r["class"]: r for r in classification_report(df, "t", "p").collect()
    }
    assert rep["a"]["precision"] is None  # a never predicted
    assert rep["a"]["recall"] == 0.0
    assert rep["a"]["f1"] == pytest.approx(0.0)  # tp=0, fn>0 -> 0


def test_calibration_matches_reference(spark):
    rows = [
        (i, (i % 100) / 100.0, 1 if (i * 7) % 100 < (i % 100) else 0)
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "id long, s double, y int")
    got = {
        r["bin"]: r
        for r in calibration_table(df, "s", "y", n_bins=10).collect()
    }
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0, 0])
    for _, s, y in rows:
        b = min(int(s * 10), 9)
        agg[b][0] += 1
        agg[b][1] += _micro(s)
        agg[b][2] += y
    for b, (n, su, pos) in agg.items():
        r = got[b]
        assert r["n"] == n
        assert r["mean_score"] == pytest.approx(
            _micro(su / (n * 1e6)) / 1e6, abs=1e-12
        )
        assert r["frac_pos"] == pytest.approx(
            _micro(pos / n) / 1e6, abs=1e-12
        )


def test_calibration_score_one_lands_in_top_bin(spark):
    df = spark.createDataFrame([(1.0, 1)], "s double, y int")
    row = calibration_table(df, "s", "y", n_bins=10).collect()[0]
    assert row["bin"] == 9  # floor(1.0*10) = 10 clamps to n_bins-1


def test_brier_matches_reference(spark):
    rows = [(i, (i % 10) / 10.0, i % 2) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, s double, y int")
    got = brier_score(df, "s", "y").collect()[0]
    su = sum(_micro((s - y) ** 2) for _, s, y in rows)
    want = _micro(su / (100 * 1e6)) / 1e6
    assert got["brier"] == pytest.approx(want, abs=1e-12)
    assert got["n"] == 100


def test_brier_perfect_and_worst(spark):
    perfect = spark.createDataFrame(
        [(1.0, 1), (0.0, 0)] * 5, "s double, y int"
    )
    assert brier_score(perfect, "s", "y").collect()[0]["brier"] == 0.0
    worst = spark.createDataFrame(
        [(1.0, 0), (0.0, 1)] * 5, "s double, y int"
    )
    assert brier_score(worst, "s", "y").collect()[0]["brier"] == 1.0


def test_rejects_bad_bins(spark):
    df = spark.createDataFrame([(0.5, 1)], "s double, y int")
    with pytest.raises(ValueError):
        calibration_table(df, "s", "y", n_bins=1)


def _auc_ref(pairs):
    pos = sorted(s for s, y in pairs if y == 1)
    neg = sorted(s for s, y in pairs if y == 0)
    import bisect

    total = 0.0
    for p in pos:
        lo = bisect.bisect_left(neg, p)
        hi = bisect.bisect_right(neg, p)
        total += lo + (hi - lo) / 2.0
    auc = total / (len(pos) * len(neg))
    return _micro(auc) / 1e6


def test_roc_auc_matches_reference(spark):
    from med_doi_feature_extraction_spark.operators.evalcls import roc_auc

    pairs = [
        ((i * 13 % 40) / 40.0 + (0.3 if i % 3 == 0 else 0.0), i % 3 == 0)
        for i in range(200)
    ]
    df = spark.createDataFrame(
        [(s, int(y)) for s, y in pairs], "s double, y int"
    )
    row = roc_auc(df, "s", "y").collect()[0]
    want = _auc_ref([(s, int(y)) for s, y in pairs])
    assert row["auc"] == pytest.approx(want, abs=1e-12)
    assert row["auc"] > 0.7  # the planted signal separates


def test_roc_auc_perfect_random_inverted(spark):
    from med_doi_feature_extraction_spark.operators.evalcls import roc_auc

    perfect = spark.createDataFrame(
        [(float(i), 1 if i >= 50 else 0) for i in range(100)],
        "s double, y int",
    )
    assert roc_auc(perfect, "s", "y").collect()[0]["auc"] == 1.0
    const = spark.createDataFrame(
        [(0.5, i % 2) for i in range(100)], "s double, y int"
    )
    assert const.count() == 100
    assert roc_auc(const, "s", "y").collect()[0]["auc"] == 0.5  # all ties
    inv = spark.createDataFrame(
        [(float(-i), 1 if i >= 50 else 0) for i in range(100)],
        "s double, y int",
    )
    assert roc_auc(inv, "s", "y").collect()[0]["auc"] == 0.0


def test_roc_auc_empty_class_null(spark):
    from med_doi_feature_extraction_spark.operators.evalcls import roc_auc

    df = spark.createDataFrame([(0.5, 1), (0.7, 1)], "s double, y int")
    row = roc_auc(df, "s", "y").collect()[0]
    assert row["auc"] is None and row["n_neg"] == 0
