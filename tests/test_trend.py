"""Per-entity OLS trend features (operators/trend.py)."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

import pytest

from med_doi_feature_extraction_spark.operators.trend import trend_features

REF = datetime(2024, 1, 1)
REF_EPOCH = 1704067200  # 2024-01-01T00:00:00Z


def _micro(x):
    m = math.floor(abs(x) * 1e6 + 0.5)
    return -m if x < 0 else m


def _fit_ref(points, scale=1000):
    # points: (t_sec, value)
    ys = []
    for t, v in points:
        m = math.floor(abs(v) * float(scale) + 0.5)
        ys.append((t, -m if v < 0 else m))
    n = len(ys)
    st = sum(t for t, _ in ys)
    sy = sum(y for _, y in ys)
    stt = sum(t * t for t, _ in ys)
    sty = sum(t * y for t, y in ys)
    syy = sum(y * y for _, y in ys)
    num = float(n * sty - st * sy)
    den = float(n * stt - st * st)
    deny = float(n * syy - sy * sy)
    if den <= 0:
        return None, None, None
    slope = _micro(num / den * 86400.0 / float(scale)) / 1e6
    intercept = _micro((sy - num / den * st) / n / float(scale)) / 1e6
    r2 = (
        _micro(num * num / (den * deny)) / 1e6 if deny > 0 else None
    )
    return slope, intercept, r2


def _rows(spec):
    # spec: {entity: [(day_offset, value), ...]}
    out = []
    for ent, pts in spec.items():
        for d, v in pts:
            out.append((ent, REF + timedelta(days=d), float(v)))
    return out


@pytest.fixture(scope="module")
def fitted(spark):
    spec = {
        "grow": [(i, 100.0 + 40.0 * i) for i in range(10)],
        "noisy": [(i, 50.0 + 3.0 * i + ((i * 7) % 5 - 2) * 0.25)
                  for i in range(12)],
        "flat": [(i, 7.5) for i in range(6)],
        "point": [(3, 9.0), (3, 11.0)],
        "shrink": [(2 * i, 1000.0 - 12.5 * i) for i in range(8)],
    }
    df = spark.createDataFrame(
        _rows(spec), "url string, ts timestamp, v double"
    )
    got = {
        r["url"]: r
        for r in trend_features(
            df, ["url"], "ts", "v", ref_epoch=REF_EPOCH
        ).collect()
    }
    return spec, got


def test_matches_python_reference(fitted):
    spec, got = fitted
    for ent, pts in spec.items():
        secs = [(d * 86400, v) for d, v in pts]
        slope, intercept, r2 = _fit_ref(secs)
        row = got[ent]
        assert row["n_obs"] == len(pts), ent
        if slope is None:
            assert row["slope_per_day"] is None, ent
        else:
            assert row["slope_per_day"] == pytest.approx(
                slope, abs=1e-12
            ), ent
            assert row["intercept"] == pytest.approx(
                intercept, abs=1e-12
            ), ent
        if r2 is None:
            assert row["r2"] is None, ent
        else:
            assert row["r2"] == pytest.approx(r2, abs=1e-12), ent


def test_perfect_line(fitted):
    _, got = fitted
    row = got["grow"]
    assert row["slope_per_day"] == pytest.approx(40.0)
    assert row["intercept"] == pytest.approx(100.0)
    assert row["r2"] == pytest.approx(1.0)
    down = got["shrink"]
    assert down["slope_per_day"] == pytest.approx(-6.25)  # -12.5 / 2 days
    assert down["r2"] == pytest.approx(1.0)


def test_flat_value_zero_slope_null_r2(fitted):
    _, got = fitted
    row = got["flat"]
    assert row["slope_per_day"] == 0.0
    assert row["r2"] is None  # zero variance in y


def test_single_timestamp_null_fit(fitted):
    _, got = fitted
    row = got["point"]
    assert row["slope_per_day"] is None
    assert row["t_span_sec"] == 0


def test_nulls_dropped(spark):
    df = spark.createDataFrame(
        [("a", REF, 1.0), ("a", None, 2.0),
         ("a", REF + timedelta(days=1), None),
         ("a", REF + timedelta(days=2), 3.0)],
        "url string, ts timestamp, v double",
    )
    row = trend_features(
        df, ["url"], "ts", "v", ref_epoch=REF_EPOCH
    ).collect()[0]
    assert row["n_obs"] == 2


def test_one_hashagg_no_window_no_join(spark):
    df = spark.createDataFrame(
        _rows({"a": [(0, 1.0), (1, 2.0)]}),
        "url string, ts timestamp, v double",
    )
    plan = (
        trend_features(df, ["url"], "ts", "v", ref_epoch=REF_EPOCH)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan and "Window" not in plan
    assert "BatchEvalPython" not in plan


# ---------------------------------------------------------------- burstiness


class TestBurstiness:
    def _df(self, spark, secs, uid=1):
        from datetime import datetime, timedelta

        base = datetime(2024, 1, 1)
        rows = [
            (uid, base + timedelta(seconds=s), i)
            for i, s in enumerate(secs)
        ]
        return spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_id long"
        )

    def _run(self, spark, secs):
        from med_doi_feature_extraction_spark.operators.trend import (
            burstiness,
        )

        return burstiness(
            self._df(spark, secs), ["user_id"], "ts",
            tiebreak=["event_id"],
        ).collect()[0]

    def test_metronome_is_minus_one(self, spark):
        row = self._run(spark, [0, 60, 120, 180, 240])
        assert row["n_gaps"] == 4
        assert row["mean_gap_sec"] == 60.0
        assert row["std_gap_sec"] == 0.0
        assert row["burstiness"] == -1.0 and row["cv"] == 0.0

    def test_matches_python_reference(self, spark):
        import math

        secs = [0, 7, 9, 40, 41, 100, 103, 300]
        row = self._run(spark, secs)
        gaps = [b - a for a, b in zip(secs, secs[1:])]
        mu = sum(gaps) / len(gaps)
        var = sum(g * g for g in gaps) / len(gaps) - mu * mu
        sd = math.sqrt(var)
        assert row["mean_gap_sec"] == pytest.approx(mu, abs=1e-6)
        assert row["std_gap_sec"] == pytest.approx(sd, abs=1e-6)
        assert row["burstiness"] == pytest.approx(
            (sd - mu) / (sd + mu), abs=1e-6
        )
        assert row["cv"] == pytest.approx(sd / mu, abs=1e-6)

    def test_single_event_all_null(self, spark):
        row = self._run(spark, [5])
        assert row["n_gaps"] == 0
        assert row["mean_gap_sec"] is None
        assert row["std_gap_sec"] is None
        assert row["burstiness"] is None and row["cv"] is None

    def test_two_events_mean_only(self, spark):
        row = self._run(spark, [0, 30])
        assert row["n_gaps"] == 1 and row["mean_gap_sec"] == 30.0
        assert row["std_gap_sec"] is None and row["burstiness"] is None

    def test_degenerate_zero_gaps(self, spark):
        row = self._run(spark, [10, 10, 10])
        assert row["mean_gap_sec"] == 0.0 and row["std_gap_sec"] == 0.0
        assert row["burstiness"] is None and row["cv"] is None


# ------------------------------------------------------------ autocorrelation


class TestAutocorrelation:
    def _df(self, spark, vals, uid=1):
        from datetime import datetime, timedelta

        base = datetime(2024, 1, 1)
        rows = [
            (uid, base + timedelta(seconds=60 * i), i, v)
            for i, v in enumerate(vals)
        ]
        return spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_id long, value double"
        )

    def _run(self, spark, vals, lag=1):
        from med_doi_feature_extraction_spark.operators.trend import (
            autocorrelation,
        )

        return autocorrelation(
            self._df(spark, vals), ["user_id"], "ts", "value",
            lag=lag, tiebreak=["event_id"],
        ).collect()[0]

    def test_smooth_ramp_near_one(self, spark):
        row = self._run(spark, [float(i) for i in range(20)])
        assert row["n_pairs"] == 19
        assert row["r"] > 0.97

    def test_alternating_series_near_minus_one(self, spark):
        row = self._run(spark, [float(i % 2) for i in range(20)])
        assert row["r"] == -1.0

    def test_matches_python_reference(self, spark):
        import math

        vals = [3.0, 7.0, 4.0, 9.0, 2.0, 8.0, 5.0, 6.0, 1.0]
        row = self._run(spark, vals)
        ys = [round(v * 1000) for v in vals]
        pairs = list(zip(ys[1:], ys[:-1]))
        n = len(pairs)
        sa = sum(a for a, _ in pairs); sb = sum(b for _, b in pairs)
        sab = sum(a * b for a, b in pairs)
        saa = sum(a * a for a, _ in pairs)
        sbb = sum(b * b for _, b in pairs)
        r = (n * sab - sa * sb) / math.sqrt(
            (n * saa - sa * sa) * (n * sbb - sb * sb)
        )
        assert row["r"] == pytest.approx(r, abs=1e-6)

    def test_constant_series_null(self, spark):
        row = self._run(spark, [5.0] * 10)
        assert row["r"] is None

    def test_null_values_break_pairs(self, spark):
        row = self._run(spark, [1.0, None, 2.0, 4.0])
        # pairs: (2,None)x (4,2)ok (None,1)x -> only (4,2)... and
        # (2, None) dropped; lag positions still advance past nulls
        assert row["n_pairs"] == 1

    def test_lag_validation(self, spark):
        from med_doi_feature_extraction_spark.operators.trend import (
            autocorrelation,
        )

        with pytest.raises(ValueError):
            autocorrelation(
                self._df(spark, [1.0]), ["user_id"], "ts", "value",
                lag=0,
            )


# ---------------------------------------------------------- temporal_profile


class TestTemporalProfile:
    def test_hand_computed(self, spark):
        import math
        from datetime import datetime

        from med_doi_feature_extraction_spark.operators.trend import (
            temporal_profile,
        )

        # 2024-01-01 is a Monday (isodow 1)
        rows = [
            (1, datetime(2024, 1, 1, 9, 0)),   # Mon 9h
            (1, datetime(2024, 1, 1, 9, 30)),  # Mon 9h
            (1, datetime(2024, 1, 2, 14, 0)),  # Tue 14h
            (1, datetime(2024, 1, 8, 9, 5)),   # Mon 9h
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        row = temporal_profile(df, ["user_id"], "ts").collect()[0]
        assert row["n_events"] == 4
        assert row["peak_hour"] == 9 and row["peak_hour_share"] == 0.75
        assert row["peak_dow"] == 1 and row["peak_dow_share"] == 0.75
        h = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
        assert row["hour_entropy_norm"] == pytest.approx(
            h / math.log(24), abs=2e-6
        )

    def test_tie_breaks_to_smallest_bin(self, spark):
        from datetime import datetime

        from med_doi_feature_extraction_spark.operators.trend import (
            temporal_profile,
        )

        rows = [
            (1, datetime(2024, 1, 1, 23, 0)),
            (1, datetime(2024, 1, 1, 2, 0)),
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        row = temporal_profile(df, ["user_id"], "ts").collect()[0]
        assert row["peak_hour"] == 2  # tie -> smallest hour

    def test_uniform_hours_max_entropy(self, spark):
        from datetime import datetime, timedelta

        from med_doi_feature_extraction_spark.operators.trend import (
            temporal_profile,
        )

        base = datetime(2024, 1, 1)
        rows = [(1, base + timedelta(hours=i)) for i in range(24)]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        row = temporal_profile(df, ["user_id"], "ts").collect()[0]
        assert row["hour_entropy_norm"] == pytest.approx(1.0, abs=1e-4)
        assert row["peak_hour_share"] == pytest.approx(
            1 / 24, abs=1e-6
        )


class TestCusumChangepoints:
    def _run(self, spark, rows, kappa, threshold, n_base=3):
        from med_doi_feature_extraction_spark.operators.trend import (
            cusum_changepoints,
        )

        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_id long, value double"
        )
        out = cusum_changepoints(
            df,
            ["user_id"],
            "ts",
            "value",
            kappa=kappa,
            threshold=threshold,
            n_base=n_base,
            tiebreak=["event_id"],
        )
        return sorted(
            out.collect(), key=lambda r: (r["user_id"], r["ts"])
        )

    @staticmethod
    def _rows(values, user=1):
        import datetime as dt

        t0 = dt.datetime(2026, 1, 1)
        return [
            (user, t0 + dt.timedelta(minutes=i), i, float(v))
            for i, v in enumerate(values)
        ]

    @staticmethod
    def _reference(values, kappa, n_base):
        """Textbook Page recursion in integer micro-units."""
        mu = round(
            sum(values[:n_base]) / min(n_base, len(values)) * 1e6
        )
        ku = round(kappa * 1e6)
        sp = sn = 0
        out = []
        for v in values:
            vu = round(v * 1e6)
            sp = max(0, sp + vu - mu - ku)
            sn = max(0, sn - (vu - mu) - ku)
            out.append((sp, sn))
        return out

    def test_matches_textbook_recursion(self, spark):
        import random

        rng = random.Random(5)
        values = [rng.uniform(-3, 3) for _ in range(40)]
        got = self._run(spark, self._rows(values), kappa=0.5,
                        threshold=4.0, n_base=5)
        want = self._reference(values, kappa=0.5, n_base=5)
        assert [
            (r["s_pos_micro"], r["s_neg_micro"]) for r in got
        ] == want

    def test_level_shift_fires_upward_alarm_once_past_threshold(
        self, spark
    ):
        values = [1.0] * 6 + [4.0] * 6  # +3 shift, kappa=1 -> +2/step
        got = self._run(spark, self._rows(values), kappa=1.0,
                        threshold=5.0, n_base=6)
        alarms = [r["alarm_up"] for r in got]
        # needs ceil(5/2)+ = 3 shifted points to cross 5.0
        assert alarms == [0] * 6 + [0, 0, 1, 1, 1, 1]
        assert all(r["alarm_dn"] == 0 for r in got)

    def test_downward_shift_fires_neg_side(self, spark):
        values = [2.0] * 5 + [-1.0] * 5
        got = self._run(spark, self._rows(values), kappa=0.5,
                        threshold=4.0, n_base=5)
        assert got[-1]["alarm_dn"] == 1
        assert all(r["alarm_up"] == 0 for r in got)

    def test_entities_isolated(self, spark):
        rows = self._rows([0.0] * 4 + [10.0] * 4, user=1) + self._rows(
            [5.0] * 8, user=2
        )
        got = self._run(spark, rows, kappa=0.5, threshold=3.0, n_base=4)
        by_user = {}
        for r in got:
            by_user.setdefault(r["user_id"], []).append(r["alarm_up"])
        assert 1 in set(by_user[1])
        assert set(by_user[2]) == {0}

    def test_rejects_bad_n_base(self, spark):
        import pytest as _pt

        from med_doi_feature_extraction_spark.operators.trend import (
            cusum_changepoints,
        )

        df = spark.createDataFrame(
            [(1, None, 1, 1.0)],
            "user_id long, ts timestamp, event_id long, value double",
        )
        with _pt.raises(ValueError):
            cusum_changepoints(
                df, ["user_id"], "ts", "value",
                kappa=1.0, threshold=1.0, n_base=0,
            )
