"""PSI / two-sample KS drift (operators/drift.py) + the
global_cumsum prefix-sum primitive (operators/order.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from med_doi_feature_extraction_spark.operators.drift import (
    PSI_EPS,
    ks_2samp,
    psi_table,
)
from med_doi_feature_extraction_spark.operators.order import global_cumsum


def _df(spark, vals, col="x"):
    return spark.createDataFrame([(float(v),) for v in vals], f"{col} double")


# --- global_cumsum ----------------------------------------------------


def test_global_cumsum_matches_single_window(spark):
    rows = [(i * 7 % 101, i % 5, (i * 3) % 4) for i in range(200)]
    df = spark.createDataFrame(rows, "v long, a long, b long")
    got = (
        global_cumsum(df, ["v", "a", "b"], ["a", "b"], num_partitions=7)
        .orderBy("v", "a", "b")
        .collect()
    )
    w = (
        Window.orderBy("v", "a", "b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = (
        df.withColumn("a_cum", F.sum("a").over(w))
        .withColumn("b_cum", F.sum("b").over(w))
        .orderBy("v", "a", "b")
        .collect()
    )
    assert [(r["a_cum"], r["b_cum"]) for r in got] == [
        (r["a_cum"], r["b_cum"]) for r in want
    ]


def test_global_cumsum_no_single_partition_window(spark):
    df = spark.createDataFrame(
        [(i, 1) for i in range(50)], "v long, c long"
    )
    plan = (
        global_cumsum(df, ["v"], ["c"], num_partitions=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    import re

    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" in ln:
            ctx = "\n".join(lines[max(0, i - 2): i])
            assert not re.search(r"\b(Window|Sort)\b", ctx), plan


def test_global_cumsum_null_counts_as_zero(spark):
    df = spark.createDataFrame(
        [(1, 5), (2, None), (3, 7)], "v long, c long"
    )
    got = {
        r["v"]: r["c_cum"]
        for r in global_cumsum(df, ["v"], ["c"]).collect()
    }
    assert got == {1: 5, 2: 5, 3: 12}


# --- PSI ----------------------------------------------------------------


def test_psi_identical_distributions_is_zero(spark):
    vals = [i % 50 for i in range(500)]
    out = psi_table(_df(spark, vals), _df(spark, vals), "x").collect()
    assert all(r["psi_term"] == 0.0 for r in out)
    assert all(r["psi_total"] == 0.0 for r in out)
    # identical sides: per-bin counts match
    assert all(r["n_base"] == r["n_new"] for r in out)


def test_psi_matches_python_reference(spark):
    base = [(i * 13) % 97 for i in range(400)]
    new = [((i * 13) % 97) + (15 if i % 3 == 0 else 0) for i in range(380)]
    n_bins = 10
    out = {
        r["bin"]: r
        for r in psi_table(
            _df(spark, base), _df(spark, new), "x", n_bins=n_bins
        ).collect()
    }

    # reference: numpy-free replication of the documented algorithm
    def quantile_cont(sorted_vals, q):
        # Spark F.percentile / DuckDB quantile_cont interpolation
        h = (len(sorted_vals) - 1) * q
        lo = math.floor(h)
        hi = min(lo + 1, len(sorted_vals) - 1)
        return sorted_vals[lo] + (h - lo) * (
            sorted_vals[hi] - sorted_vals[lo]
        )

    sb = sorted(float(v) for v in base)
    edges = [quantile_cont(sb, i / n_bins) for i in range(1, n_bins)]

    def bin_of(v):
        return sum(1 for e in edges if v > e) + 1

    cb: dict[int, int] = {}
    cn: dict[int, int] = {}
    for v in base:
        cb[bin_of(v)] = cb.get(bin_of(v), 0) + 1
    for v in new:
        cn[bin_of(v)] = cn.get(bin_of(v), 0) + 1
    tb, tn = float(len(base)), float(len(new))

    def micro(x):
        m = math.floor(abs(x) * 1e6 + 0.5)
        return -m if x < 0 else m

    total_u = 0
    for b in sorted(set(cb) | set(cn)):
        nb_, nn_ = cb.get(b, 0), cn.get(b, 0)
        pb = max(nb_ / tb, PSI_EPS)
        pn = max(nn_ / tn, PSI_EPS)
        term_u = micro((pb - pn) * math.log(pb / pn))
        total_u += term_u
        row = out[b]
        assert row["n_base"] == nb_ and row["n_new"] == nn_
        assert row["psi_term"] == pytest.approx(term_u / 1e6, abs=1e-12)
        assert row["frac_base"] == pytest.approx(
            micro(nb_ / tb) / 1e6, abs=1e-12
        )
    assert out[1]["psi_total"] == pytest.approx(total_u / 1e6, abs=1e-12)
    assert out[1]["psi_total"] > 0.05  # the planted shift registers


def test_psi_ties_go_to_lower_bin(spark):
    # all values equal -> every edge equals the value -> v > e false
    # everywhere -> everything lands in bin 1
    out = psi_table(
        _df(spark, [5] * 100), _df(spark, [5] * 50), "x", n_bins=4
    ).collect()
    assert [r["bin"] for r in out] == [1]


def test_psi_nulls_dropped(spark):
    base = spark.createDataFrame(
        [(1.0,), (2.0,), (None,)], "x double"
    )
    out = psi_table(base, base, "x").collect()
    assert sum(r["n_base"] for r in out) == 2


def test_psi_rejects_bad_bins(spark):
    with pytest.raises(ValueError):
        psi_table(_df(spark, [1]), _df(spark, [1]), "x", n_bins=1)


# --- KS -----------------------------------------------------------------


def _ks_ref(a, b):
    va, vb = sorted(a), sorted(b)
    points = sorted(set(va) | set(vb))
    na, nb = len(va), len(vb)
    best_u, best_v = -1, None
    import bisect

    for v in points:
        fa = bisect.bisect_right(va, v) / na
        fb = bisect.bisect_right(vb, v) / nb
        du = math.floor(abs(fa - fb) * 1e6 + 0.5)
        if du > best_u:
            best_u, best_v = du, v
    return best_u / 1e6, best_v


def test_ks_matches_python_reference(spark):
    a = [(i * 17) % 211 for i in range(300)]
    b = [((i * 29) % 211) + 30 for i in range(280)]
    row = ks_2samp(_df(spark, a), _df(spark, b), "x").collect()[0]
    want_d, want_v = _ks_ref([float(v) for v in a], [float(v) for v in b])
    assert row["ks_stat"] == pytest.approx(want_d, abs=1e-12)
    assert row["at_value"] == want_v
    assert row["n_a"] == 300 and row["n_b"] == 280


def test_ks_identical_is_zero_disjoint_is_one(spark):
    a = list(range(100))
    same = ks_2samp(_df(spark, a), _df(spark, a), "x").collect()[0]
    assert same["ks_stat"] == 0.0
    disj = ks_2samp(
        _df(spark, range(100)), _df(spark, range(1000, 1100)), "x"
    ).collect()[0]
    assert disj["ks_stat"] == 1.0
    # smallest value attaining the max: the last value of side a
    assert disj["at_value"] == 99.0


def test_ks_argmax_tiebreak_smallest_value(spark):
    # a = {0}, b = {10}: every v in [0,10) has |1-0| = 1 -> at_value
    # must be the SMALLEST observed value attaining it, i.e. 0
    row = ks_2samp(_df(spark, [0]), _df(spark, [10]), "x").collect()[0]
    assert row["ks_stat"] == 1.0 and row["at_value"] == 0.0


# --- Mann-Whitney U ------------------------------------------------------


def _mw_ref(a, b):
    vals = sorted(set(a) | set(b))
    from collections import Counter

    ca, cb = Counter(a), Counter(b)
    na, nb = len(a), len(b)
    before = 0
    ra2 = 0
    ties = 0
    for v in vals:
        t = ca.get(v, 0) + cb.get(v, 0)
        mid2 = 2 * before + t + 1
        ra2 += ca.get(v, 0) * mid2
        ties += t * t * t - t
        before += t
    u2a = ra2 - na * (na + 1)
    u_a = u2a / 2.0
    n = na + nb
    var = na * nb / 12.0 * ((n + 1) - ties / (n * (n - 1)))
    z = (u_a - na * nb / 2.0) / math.sqrt(var) if var > 0 else None
    if z is not None:
        m = math.floor(abs(z) * 1e6 + 0.5)
        z = (-m if z < 0 else m) / 1e6
    return u_a, na * nb - u_a, z


def test_mannwhitney_matches_python_reference(spark):
    from med_doi_feature_extraction_spark.operators.drift import (
        mannwhitney_u,
    )

    a = [float((i * 17) % 50) for i in range(120)]  # heavy ties
    b = [float(((i * 29) % 50) + 7) for i in range(100)]
    row = mannwhitney_u(_df(spark, a), _df(spark, b), "x").collect()[0]
    u_a, u_b, z = _mw_ref(a, b)
    assert row["u_a"] == u_a and row["u_b"] == u_b
    assert row["z"] == pytest.approx(z, abs=1e-12)
    assert row["n_a"] == 120 and row["n_b"] == 100
    assert row["z"] < -3  # b is shifted up -> a's ranks are low


def test_mannwhitney_identical_sides(spark):
    from med_doi_feature_extraction_spark.operators.drift import (
        mannwhitney_u,
    )

    a = [float(i % 10) for i in range(100)]
    row = mannwhitney_u(_df(spark, a), _df(spark, a), "x").collect()[0]
    assert row["u_a"] == row["u_b"] == 5000.0  # na*nb/2
    assert row["z"] == 0.0


def test_mannwhitney_all_tied_null_z(spark):
    from med_doi_feature_extraction_spark.operators.drift import (
        mannwhitney_u,
    )

    row = mannwhitney_u(
        _df(spark, [5.0] * 20), _df(spark, [5.0] * 30), "x"
    ).collect()[0]
    assert row["z"] is None  # zero variance
    assert row["u_a"] == 20 * 30 / 2.0  # all midranks equal


# --- per-group PSI -------------------------------------------------------


def _gdf(spark, rows):
    return spark.createDataFrame(
        [(g, float(v)) for g, v in rows], "g string, x double"
    )


def test_psi_by_group_matches_ungrouped_per_slice(spark):
    from med_doi_feature_extraction_spark.operators.drift import (
        psi_by_group,
    )

    base = [("en", (i * 13) % 97) for i in range(300)] + [
        ("de", (i * 7) % 50) for i in range(200)
    ]
    new = [("en", ((i * 13) % 97) + 20) for i in range(280)] + [
        ("de", (i * 7) % 50) for i in range(150)
    ]
    got = {
        r["group"]: r
        for r in psi_by_group(
            _gdf(spark, base), _gdf(spark, new), "x", "g"
        ).collect()
    }
    # each group must equal the ungrouped psi_table run on its slice
    for g in ("en", "de"):
        tbl = psi_table(
            _gdf(spark, [r for r in base if r[0] == g]),
            _gdf(spark, [r for r in new if r[0] == g]),
            "x",
        ).collect()
        assert got[g]["psi"] == pytest.approx(
            tbl[0]["psi_total"], abs=1e-12
        ), g
    assert got["de"]["psi"] == 0.0  # unchanged slice
    assert got["en"]["psi"] > 0.05  # shifted slice registers


def test_psi_by_group_new_only_group_skipped(spark):
    from med_doi_feature_extraction_spark.operators.drift import (
        psi_by_group,
    )

    base = [("en", i % 10) for i in range(50)]
    new = [("en", i % 10) for i in range(50)] + [
        ("fr", i % 10) for i in range(30)
    ]
    got = {
        r["group"]
        for r in psi_by_group(
            _gdf(spark, base), _gdf(spark, new), "x", "g"
        ).collect()
    }
    assert got == {"en"}  # no baseline for fr -> skipped


def test_psi_by_group_vanished_group_max_drift(spark):
    from med_doi_feature_extraction_spark.operators.drift import (
        psi_by_group,
    )

    base = [("gone", i % 5) for i in range(40)]
    empty = spark.createDataFrame([], "g string, x double")
    row = psi_by_group(_gdf(spark, base), empty, "x", "g").collect()[0]
    assert row["n_new"] == 0
    assert row["psi"] > 5  # every bin's mass collapsed to eps


# ------------------------------------------------------------------ benford


def test_benford_conformant_sample_low_mad(spark):
    """2^k magnitudes are the classic Benford-conformant family."""
    from med_doi_feature_extraction_spark.operators.drift import (
        benford_digits,
    )

    # stay inside the documented |v|*scale < 2^63 envelope
    rows = [(float(2**k),) for k in range(1, 62)]
    out = benford_digits(
        spark.createDataFrame(rows, "v double"), "v", scale=1
    ).collect()
    assert len(out) == 9
    assert [r["digit"] for r in out] == list(range(1, 10))
    assert sum(r["n_digit"] for r in out) == 61
    # 61 samples of an equidistributed family: loose conformity bound
    assert out[0]["mad"] < 0.03
    # shares sum to ~1 on both sides of the comparison
    assert abs(sum(r["obs_share"] for r in out) - 1.0) < 1e-4
    assert abs(sum(r["exp_share"] for r in out) - 1.0) < 1e-4


def test_benford_uniform_injection_flags(spark):
    """A stuck-default injection (every value 500.0) departs hard."""
    from med_doi_feature_extraction_spark.operators.drift import (
        benford_digits,
    )

    rows = [(500.0,)] * 300
    out = benford_digits(
        spark.createDataFrame(rows, "v double"), "v", scale=1
    ).collect()
    d5 = next(r for r in out if r["digit"] == 5)
    assert d5["obs_share"] == 1.0
    assert out[0]["mad"] > 0.1
    assert out[0]["chi2"] > 100.0


def test_benford_zero_null_and_sign_handling(spark):
    from med_doi_feature_extraction_spark.operators.drift import (
        benford_digits,
    )

    rows = [(0.0,), (None,), (-321.0,), (0.004,), (3.9,)]
    out = benford_digits(
        spark.createDataFrame(rows, "v double"), "v", scale=100
    ).collect()
    # 0.0 and 0.004 quantize to 0 (excluded); -321 -> digit 3;
    # 3.9 -> 390 -> digit 3
    by = {r["digit"]: r["n_digit"] for r in out}
    assert by[3] == 2 and sum(by.values()) == 2


def test_benford_first_digit_is_of_quantized_units(spark):
    from med_doi_feature_extraction_spark.operators.drift import (
        benford_digits,
    )

    # 0.85 at scale=100 -> 85 -> digit 8 (not 0.85's mantissa digit)
    out = benford_digits(
        spark.createDataFrame([(0.85,)], "v double"), "v", scale=100
    ).collect()
    by = {r["digit"]: r["n_digit"] for r in out}
    assert by[8] == 1
