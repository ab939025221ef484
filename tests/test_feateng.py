"""Feature-engineering transforms: EWMA, leakage-free target
encoding, per-group normalization, quantile binning, as-of tolerance.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from med_doi_feature_extraction_spark.operators.asof import (
    asof_join_horizons,
    asof_join_sorted,
    asof_join_window,
)
from med_doi_feature_extraction_spark.operators.feateng import (
    ewma,
    normalize_features,
    quantile_bin,
    time_target_encode,
)


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


# ------------------------------------------------------------------ ewma

def test_ewma_matches_pandas(spark):
    rows = [
        ("a", 1, _ts(1), 10.0),
        ("a", 2, _ts(2), 20.0),
        ("a", 3, _ts(3), 15.0),
        ("a", 4, _ts(4), None),
        ("a", 5, _ts(5), 30.0),
        ("b", 6, _ts(1), 5.0),
    ]
    df = spark.createDataFrame(rows, ["k", "id", "ts", "x"])
    got = {
        r["id"]: r["x_ewma"]
        for r in ewma(df, "k", "ts", ["x"], alpha=0.5, tiebreak=["id"]).collect()
    }
    exp_a = (
        pd.Series([10.0, 20.0, 15.0, None, 30.0])
        .ewm(alpha=0.5, adjust=True)
        .mean()
    )
    for i, rid in enumerate([1, 2, 3, 4, 5]):
        assert got[rid] == pytest.approx(exp_a.iloc[i], abs=1e-12)
    assert got[6] == pytest.approx(5.0)


def test_ewma_order_is_ts_not_input_order(spark):
    # shuffled input must give the identical result: ordering comes
    # from (ts, tiebreak), never arrival order
    rows = [("a", 2, _ts(2), 20.0), ("a", 1, _ts(1), 10.0)]
    df = spark.createDataFrame(rows, ["k", "id", "ts", "x"])
    got = {
        r["id"]: r["x_ewma"]
        for r in ewma(df, "k", "ts", ["x"], 0.5, ["id"]).collect()
    }
    assert got[1] == pytest.approx(10.0)
    # adjust=True: (20 + 0.5*10)/(1 + 0.5)
    assert got[2] == pytest.approx(50.0 / 3.0)


def test_ewma_rejects_bad_alpha(spark):
    df = spark.createDataFrame([("a", 1, _ts(1), 1.0)], ["k", "id", "ts", "x"])
    with pytest.raises(ValueError):
        ewma(df, "k", "ts", ["x"], alpha=0.0)


# ------------------------------------------------------- target encoding

def test_target_encode_zero_leakage(spark):
    """The code at row t depends ONLY on strictly earlier rows: the
    north-rule leakage property, checked by perturbing the future."""
    base = [
        ("u", 1, _ts(1), 10.0),
        ("u", 2, _ts(2), 20.0),
        ("u", 3, _ts(3), 30.0),
    ]
    perturbed = base[:2] + [("u", 3, _ts(3), 999.0)]
    enc = lambda rows: {
        r["id"]: r["target_enc"]
        for r in time_target_encode(
            spark.createDataFrame(rows, ["k", "id", "ts", "y"]),
            "k", "ts", "y", smoothing=2.0, tiebreak=["id"],
        ).collect()
    }
    a, b = enc(base), enc(perturbed)
    # rows 1 and 2 encode identically although row 3's target changed
    # (the global prior DOES shift — so compare structure, not prior):
    # row1 has no history on both sides → exactly the prior
    prior_a = (10 + 20 + 30) / 3
    prior_b = (10 + 20 + 999) / 3
    assert a[1] == pytest.approx(prior_a)
    assert b[1] == pytest.approx(prior_b)
    # row2 sees only row1's target in both runs
    assert a[2] == pytest.approx((10.0 + 2.0 * prior_a) / (1 + 2.0))
    assert b[2] == pytest.approx((10.0 + 2.0 * prior_b) / (1 + 2.0))
    # and the current row never reaches its own code
    assert a[3] == pytest.approx((30.0 + 2.0 * prior_a) / (2 + 2.0))
    assert b[3] == pytest.approx((30.0 + 2.0 * prior_b) / (2 + 2.0))


def test_target_encode_smoothing_pull(spark):
    rows = [("u", i, _ts(i), 100.0) for i in range(1, 6)] + [
        ("v", 9, _ts(1), 0.0)
    ]
    df = spark.createDataFrame(rows, ["k", "id", "ts", "y"])
    out = {
        r["id"]: r["target_enc"]
        for r in time_target_encode(df, "k", "ts", "y", 10.0, tiebreak=["id"]).collect()
    }
    prior = 500.0 / 6
    # with heavy smoothing every code stays near the prior
    assert out[9] == pytest.approx(prior)
    assert abs(out[5] - prior) < 10


# ------------------------------------------------------- normalization

def test_normalize_zscore_and_minmax(spark):
    rows = [("g", float(v)) for v in (1, 2, 3, 4, 5)] + [("h", 7.0)]
    df = spark.createDataFrame(rows, ["g", "x"])
    z = {
        (r["g"], r["x"]): r["x_norm"]
        for r in normalize_features(df, "g", ["x"], "zscore").collect()
    }
    sd = pd.Series([1, 2, 3, 4, 5], dtype=float).std()  # sample std
    assert z[("g", 1.0)] == pytest.approx((1 - 3) / sd)
    assert z[("g", 5.0)] == pytest.approx((5 - 3) / sd)
    assert z[("h", 7.0)] is None  # single-row group: no variance
    m = {
        (r["g"], r["x"]): r["x_norm"]
        for r in normalize_features(df, "g", ["x"], "minmax").collect()
    }
    assert m[("g", 1.0)] == 0.0 and m[("g", 5.0)] == 1.0
    assert m[("g", 3.0)] == pytest.approx(0.5)
    assert m[("h", 7.0)] is None  # degenerate range → NULL, not inf


def test_normalize_global_broadcast_path(spark):
    df = spark.createDataFrame(
        [(float(v),) for v in range(11)], ["x"]
    )
    out = normalize_features(df, None, ["x"], "minmax")
    vals = sorted(r["x_norm"] for r in out.collect())
    assert vals[0] == 0.0 and vals[-1] == 1.0
    assert vals[5] == pytest.approx(0.5)
    assert not any(c.startswith("_") for c in out.columns)


def test_normalize_rejects_bad_method(spark):
    df = spark.createDataFrame([(1.0,)], ["x"])
    with pytest.raises(ValueError):
        normalize_features(df, None, ["x"], "robust")


# ------------------------------------------------------- quantile bin

def test_quantile_bin_equal_frequency(spark):
    df = spark.createDataFrame([(i, float(i)) for i in range(1, 101)], ["id", "x"])
    out = quantile_bin(df, "x", 4).collect()
    by_bin = {}
    for r in out:
        by_bin.setdefault(r["x_bin"], []).append(r["x"])
    assert sorted(by_bin) == [1, 2, 3, 4]
    assert all(len(v) == 25 for v in by_bin.values())
    # monotonic: every value in bin i is below every value in bin i+1
    assert max(by_bin[1]) < min(by_bin[2])
    assert max(by_bin[3]) < min(by_bin[4])


def test_quantile_bin_null_and_validation(spark):
    df = spark.createDataFrame([(1, 1.0), (2, None), (3, 2.0)], ["id", "x"])
    got = {r["id"]: r["x_bin"] for r in quantile_bin(df, "x", 2).collect()}
    assert got[2] is None
    with pytest.raises(ValueError):
        quantile_bin(df, "x", 1)


# ------------------------------------------------------- as-of tolerance

def _tol_frames(spark):
    left = spark.createDataFrame(
        [("k", 1, _ts(12)), ("k", 2, _ts(14))], ["k", "id", "ts"]
    )
    right = spark.createDataFrame(
        [("k", _ts(10), 100.0)], ["k", "obs_ts", "v"]
    )
    return left, right


@pytest.mark.parametrize("impl", ["window", "sorted"])
def test_asof_tolerance_bounds_staleness(spark, impl):
    left, right = _tol_frames(spark)
    kw = dict(tolerance_sec=2 * 3600)
    if impl == "window":
        out = asof_join_window(left, right, "k", "ts", "obs_ts", ["v"], **kw)
    else:
        out = asof_join_sorted(
            left, right, "k", "ts", "obs_ts", ["v"], num_buckets=2, **kw
        )
    got = {r["id"]: r["v"] for r in out.collect()}
    assert got[1] == 100.0  # diff == tolerance exactly → still a match
    assert got[2] is None   # 4h stale > 2h tolerance → no match


def test_asof_horizons_tiered_staleness(spark):
    """One pass, tiered columns: the 2h-fresh match appears in the 2h+
    tiers only; the left row with a 4h-stale match sees it only in
    tiers that admit 4h; no-match rows are NULL in every tier."""
    left = spark.createDataFrame(
        [("k", 1, _ts(12)), ("k", 2, _ts(14)), ("z", 3, _ts(12))],
        ["k", "id", "ts"],
    )
    right = spark.createDataFrame(
        [("k", _ts(10), 100.0)], ["k", "obs_ts", "v"]
    )
    out = asof_join_horizons(
        left, right, "k", "ts", "obs_ts", ["v"],
        horizons={"2h": 2 * 3600, "6h": 6 * 3600},
    )
    got = {r["id"]: (r["v_2h"], r["v_6h"]) for r in out.collect()}
    assert got[1] == (100.0, 100.0)   # 2h stale: in both tiers (== bound)
    assert got[2] == (None, 100.0)    # 4h stale: only the 6h tier
    assert got[3] == (None, None)     # no right row at all
    assert sorted(out.columns) == ["id", "k", "ts", "v_2h", "v_6h"]
    with pytest.raises(ValueError):
        asof_join_horizons(left, right, "k", "ts", "obs_ts", ["v"], {})


@pytest.mark.parametrize("impl", ["window", "sorted"])
def test_asof_no_tolerance_unchanged(spark, impl):
    left, right = _tol_frames(spark)
    if impl == "window":
        out = asof_join_window(left, right, "k", "ts", "obs_ts", ["v"])
    else:
        out = asof_join_sorted(left, right, "k", "ts", "obs_ts", ["v"], num_buckets=2)
    got = {r["id"]: r["v"] for r in out.collect()}
    assert got[1] == 100.0 and got[2] == 100.0


def test_winsorize_groups_and_global(spark):
    import pandas as pd

    from med_doi_feature_extraction_spark.operators.feateng import winsorize

    pdf = pd.DataFrame(
        {
            "g": ["a"] * 11 + ["b"] * 3,
            "x": list(range(11)) + [100.0, 200.0, None],
        }
    )
    df = spark.createDataFrame(pdf)
    got = winsorize(df, "g", ["x"], lower=0.1, upper=0.9).toPandas()
    a = got[got.g == "a"].sort_values("x")
    # group a: 0..10 → p10=1, p90=9 (exact interpolation on 11 points)
    assert a.x_wins.min() == 1.0 and a.x_wins.max() == 9.0
    assert a[a.x == 5.0].x_wins.iloc[0] == 5.0  # interior untouched
    b = got[got.g == "b"]
    assert b[b.x.isna()].x_wins.isna().all()  # NULL passes through
    # global mode (key=None): one broadcast agg, same clip semantics
    gl = winsorize(df, None, ["x"], lower=0.0, upper=1.0).toPandas()
    assert (gl.dropna(subset=["x"]).x_wins == gl.dropna(subset=["x"]).x).all()
    import pytest as _pt

    with _pt.raises(ValueError):
        winsorize(df, "g", ["x"], lower=0.9, upper=0.1)


class TestRobustOutliers:
    def test_hand_computed_mad(self, spark):
        from med_doi_feature_extraction_spark.operators.feateng import (
            robust_outliers,
        )

        # group a: values 1..5 + wild 100 → med 3.5, absdev
        # {2.5,1.5,.5,.5,1.5,96.5} → MAD 1.5; rz(100)=0.6745*96.5/1.5
        rows = [("a", float(v)) for v in (1, 2, 3, 4, 5, 100)]
        rows += [("b", 7.0)] * 4          # degenerate: MAD 0
        rows += [("a", None)]             # NULL passthrough
        df = spark.createDataFrame(rows, "k: string, value: double")
        out = {
            (r["k"], r["value"]): r
            for r in robust_outliers(df, "k", "value", thresh=3.5).collect()
        }
        r100 = out[("a", 100.0)]
        assert r100["value_med"] == 3.5 and r100["value_mad"] == 1.5
        assert r100["value_rz"] == round(0.6745 * 96.5 / 1.5, 6)
        assert r100["value_outlier"]
        assert not out[("a", 3.0)]["value_outlier"]
        rb = out[("b", 7.0)]
        assert rb["value_mad"] == 0.0 and rb["value_rz"] is None
        assert not rb["value_outlier"]
        rn = out[("a", None)]
        assert rn["value_rz"] is None and not rn["value_outlier"]

    def test_single_exchange(self, spark):
        from med_doi_feature_extraction_spark.operators.feateng import (
            robust_outliers,
        )

        df = spark.createDataFrame(
            [("a", 1.0), ("b", 2.0)], "k: string, value: double"
        )
        plan = (
            robust_outliers(df, "k", "value")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Exchange") == 1  # both windows share one shuffle


# -------------------------------------------------------- quantile_normalize


class TestQuantileNormalize:
    def test_rank_identical_across_scales(self, spark):
        """Two groups with the same SHAPE at different scales map to
        the same normalized values."""
        from med_doi_feature_extraction_spark.operators.feateng import (
            quantile_normalize,
        )

        rows = [("a", float(i)) for i in range(1, 11)] + [
            ("b", float(i * 1000)) for i in range(1, 11)
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        out = quantile_normalize(df, "g", "v", n_grid=10).collect()
        a = sorted(
            r["v_qnorm"] for r in out if r["g"] == "a"
        )
        b = sorted(
            r["v_qnorm"] for r in out if r["g"] == "b"
        )
        assert a == b  # identical rank profile -> identical mapping

    def test_extremes_map_to_pooled_extremes(self, spark):
        from med_doi_feature_extraction_spark.operators.feateng import (
            quantile_normalize,
        )

        rows = [("a", float(i)) for i in range(1, 6)] + [
            ("b", float(100 + i)) for i in range(1, 6)
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        out = quantile_normalize(df, "g", "v", n_grid=10).collect()
        vals = [r["v_qnorm"] for r in out]
        assert min(vals) == 1.0  # pooled min
        assert max(vals) == 105.0  # pooled max

    def test_null_rows_dropped(self, spark):
        from med_doi_feature_extraction_spark.operators.feateng import (
            quantile_normalize,
        )

        rows = [("a", 1.0), ("a", None), ("a", 3.0)]
        df = spark.createDataFrame(rows, "g string, v double")
        out = quantile_normalize(df, "g", "v", n_grid=4)
        assert out.count() == 2

    def test_monotone_within_group(self, spark):
        from med_doi_feature_extraction_spark.operators.feateng import (
            quantile_normalize,
        )

        rows = [("a", float((i * 7) % 13)) for i in range(13)] + [
            ("b", float(i)) for i in range(50)
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        out = (
            quantile_normalize(df, "g", "v", n_grid=20)
            .filter("g = 'a'")
            .orderBy("v")
            .collect()
        )
        qn = [r["v_qnorm"] for r in out]
        assert qn == sorted(qn)

    def test_invalid_grid_raises(self, spark):
        from med_doi_feature_extraction_spark.operators.feateng import (
            quantile_normalize,
        )

        df = spark.createDataFrame([("a", 1.0)], "g string, v double")
        import pytest as _pt

        with _pt.raises(ValueError):
            quantile_normalize(df, "g", "v", n_grid=1)
