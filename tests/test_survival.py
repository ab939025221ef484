"""Kaplan–Meier product-limit estimator (operators/survival.py)."""

from __future__ import annotations

import math


def _km_reference(subjects):
    """Textbook KM over (duration, observed) pairs → {t: S(t)}."""
    times = sorted({d for d, _ in subjects})
    out = {}
    s = 1.0
    for t in times:
        n = sum(1 for d, _ in subjects if d >= t)
        d_ = sum(1 for d, e in subjects if d == t and e == 1)
        if n > 0:
            s *= 1.0 - d_ / n
        out[t] = s
    return out


def _run(spark, subjects, groups=None):
    from med_doi_feature_extraction_spark.operators.survival import (
        km_curve,
    )

    groups = groups or [("g",) for _ in subjects]
    rows = [
        (g[0], int(d), int(e))
        for (d, e), g in zip(subjects, groups)
    ]
    df = spark.createDataFrame(
        rows, "grp string, dur long, observed long"
    )
    return km_curve(df, ["grp"], "dur", "observed").collect()


class TestKMCurve:
    def test_matches_textbook_km_with_censoring(self, spark):
        # classic example: events at 1,3,4; censored at 2,5
        subjects = [(1, 1), (2, 0), (3, 1), (4, 1), (5, 0)]
        got = {
            r["duration"]: r["km_survival"]
            for r in _run(spark, subjects)
        }
        want = _km_reference(subjects)
        for t, s in want.items():
            assert math.isclose(got[t], s, abs_tol=2e-6), (t, got[t], s)

    def test_censored_rows_reduce_risk_but_not_survival(self, spark):
        rows = _run(spark, [(1, 0), (2, 1), (2, 0)])
        by = {r["duration"]: r for r in rows}
        assert by[1]["km_survival"] == 1.0  # pure censoring step
        assert by[1]["n_risk"] == 3 and by[1]["n_censored"] == 1
        assert by[2]["n_risk"] == 2 and by[2]["n_events"] == 1

    def test_absorbing_step_hits_exact_zero(self, spark):
        rows = _run(spark, [(1, 1), (2, 1), (2, 1)])
        by = {r["duration"]: r for r in rows}
        assert by[2]["km_survival"] == 0.0
        assert by[2]["km_log_micro"] is None
        assert by[1]["km_survival"] > 0.0

    def test_groups_are_independent(self, spark):
        subjects = [(1, 1), (9, 1), (1, 1), (9, 1)]
        groups = [("a",), ("a",), ("b",), ("b",)]
        rows = _run(spark, subjects, groups)
        for r in rows:
            # each group: 2 subjects, events at 1 and 9
            if r["duration"] == 1:
                assert math.isclose(
                    r["km_survival"], 0.5, abs_tol=2e-6
                )
            else:
                assert r["km_survival"] == 0.0

    def test_random_parity_with_reference(self, spark):
        import random

        rng = random.Random(11)
        subjects = [
            (rng.randint(1, 12), rng.randint(0, 1)) for _ in range(80)
        ]
        got = {
            r["duration"]: r["km_survival"]
            for r in _run(spark, subjects)
        }
        want = _km_reference(subjects)
        for t, s in want.items():
            assert math.isclose(got[t], s, abs_tol=5e-6), (t, got[t], s)

    def test_invalid_event_flags_are_dropped(self, spark):
        from med_doi_feature_extraction_spark.operators.survival import (
            km_curve,
        )

        df = spark.createDataFrame(
            [("g", 1, 1), ("g", 1, 7), ("g", None, 1)],
            "grp string, dur long, observed long",
        )
        rows = km_curve(df, ["grp"], "dur", "observed").collect()
        assert len(rows) == 1 and rows[0]["n_risk"] == 1
