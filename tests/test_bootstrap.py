"""Deterministic Poisson bootstrap (operators/bootstrap.py)."""

from __future__ import annotations

import hashlib
import math

import pytest

from med_doi_feature_extraction_spark.operators.bootstrap import (
    _CDF,
    bootstrap_ci,
    poisson_bootstrap_means,
)

ROWS = [(i, (i * 13) % 47) for i in range(200)]


def _uniform(key, salt):
    h = hashlib.sha256(f"{key}|{salt}".encode()).hexdigest()
    return int(h[:8], 16) / 4294967296.0


def _weight(u):
    for k, c in enumerate(_CDF):
        if u < c:
            return k
    return len(_CDF)


def _micro(x):
    m = math.floor(abs(x) * 1e6 + 0.5)
    return -m if x < 0 else m


def _ref_replicate(i, salt="boot"):
    sw = swx = 0
    for k, v in ROWS:
        w = _weight(_uniform(k, f"{salt}:{i}"))
        sw += w
        swx += w * v
    return sw, (_micro(swx / sw) / 1e6 if sw else None)


@pytest.fixture(scope="module")
def reps(spark):
    df = spark.createDataFrame(ROWS, "k long, v long")
    return {
        r["boot_id"]: r
        for r in poisson_bootstrap_means(df, "k", "v", n_boot=20).collect()
    }


def test_matches_python_reference(reps):
    assert len(reps) == 20
    for i in (0, 7, 19):
        sw, mean = _ref_replicate(i)
        assert reps[i]["n_eff"] == sw
        assert reps[i]["mean"] == pytest.approx(mean, abs=1e-12)


def test_replicates_vary_but_center(reps):
    true_mean = sum(v for _, v in ROWS) / len(ROWS)
    means = [r["mean"] for r in reps.values()]
    assert len(set(means)) > 1  # different salts -> different draws
    # all replicate means within a few standard errors
    sd = math.sqrt(
        sum((v - true_mean) ** 2 for _, v in ROWS) / len(ROWS)
    )
    se = sd / math.sqrt(len(ROWS))
    assert all(abs(m - true_mean) < 6 * se for m in means)


def test_n_eff_poisson_scale(reps):
    # sum of 200 Poisson(1) weights concentrates near 200
    for r in reps.values():
        assert 140 <= r["n_eff"] <= 260


def test_deterministic_rerun(spark):
    df = spark.createDataFrame(ROWS, "k long, v long")
    a = poisson_bootstrap_means(df, "k", "v", n_boot=5).collect()
    b = poisson_bootstrap_means(
        df.repartition(7), "k", "v", n_boot=5
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_ci_brackets_truth(spark):
    df = spark.createDataFrame(ROWS, "k long, v long")
    row = bootstrap_ci(df, "k", "v", n_boot=40).collect()[0]
    true_mean = sum(v for _, v in ROWS) / len(ROWS)
    assert row["ci_lo"] <= row["mean"] <= row["ci_hi"]
    assert row["mean"] == pytest.approx(_micro(true_mean) / 1e6, abs=1e-12)
    assert row["ci_hi"] - row["ci_lo"] < 10  # sane width for this data
    assert row["n"] == 200 and row["n_boot"] == 40


def test_cdf_constants_sane():
    assert _CDF[0] == pytest.approx(math.exp(-1))
    assert _CDF[-1] == pytest.approx(1.0, abs=1e-9)
    assert all(a < b for a, b in zip(_CDF, _CDF[1:]))


def test_rejects_bad_n_boot(spark):
    df = spark.createDataFrame(ROWS, "k long, v long")
    with pytest.raises(ValueError):
        poisson_bootstrap_means(df, "k", "v", n_boot=0)


def test_one_scan_no_join_no_udf(spark):
    df = spark.createDataFrame(ROWS, "k long, v long")
    plan = (
        poisson_bootstrap_means(df, "k", "v", n_boot=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
