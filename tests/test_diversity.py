"""Concentration metrics (operators/diversity.py)."""

from __future__ import annotations

import math

import pytest

from med_doi_feature_extraction_spark.operators.diversity import (
    concentration,
)


def _micro(x):
    m = math.floor(abs(x) * 1e6 + 0.5)
    return -m if x < 0 else m


def _ref(groups):
    from collections import Counter

    counts = sorted(Counter(g for g in groups if g is not None).values())
    n, tot = len(counts), sum(counts)
    wsum = sum((2 * (i + 1) - 1) * c for i, c in enumerate(counts))
    gini = (wsum - n * tot) / (n * tot)
    hhi = sum(c * c for c in counts) / (tot * tot)
    top = max(counts) / tot
    return (
        n, tot, _micro(top) / 1e6, _micro(hhi) / 1e6, _micro(gini) / 1e6,
    )


def test_matches_python_reference(spark):
    groups = [f"d{(i * i) % 17}" for i in range(300)] + [None] * 5
    df = spark.createDataFrame([(g,) for g in groups], "g string")
    row = concentration(df, "g").collect()[0]
    n, tot, top, hhi, gini = _ref(groups)
    assert (row["n_groups"], row["n_rows"]) == (n, tot)
    assert row["top_share"] == pytest.approx(top, abs=1e-12)
    assert row["hhi"] == pytest.approx(hhi, abs=1e-12)
    assert row["gini"] == pytest.approx(gini, abs=1e-12)


def test_uniform_distribution(spark):
    df = spark.createDataFrame(
        [(f"d{i % 10}",) for i in range(100)], "g string"
    )
    row = concentration(df, "g").collect()[0]
    assert row["gini"] == 0.0
    assert row["hhi"] == pytest.approx(0.1)  # 1/n_groups
    assert row["top_share"] == pytest.approx(0.1)


def test_total_concentration(spark):
    # one giant group + 9 singletons -> gini near 1, hhi near 1
    df = spark.createDataFrame(
        [("big",)] * 991 + [(f"s{i}",) for i in range(9)], "g string"
    )
    row = concentration(df, "g").collect()[0]
    assert row["top_share"] == pytest.approx(0.991)
    assert row["hhi"] > 0.98
    assert row["gini"] > 0.89


def test_single_group(spark):
    df = spark.createDataFrame([("only",)] * 50, "g string")
    row = concentration(df, "g").collect()[0]
    assert row["n_groups"] == 1
    assert row["hhi"] == 1.0 and row["gini"] == 0.0


def test_partition_invariant(spark):
    groups = [f"d{(i * 3) % 23}" for i in range(200)]
    df = spark.createDataFrame([(g,) for g in groups], "g string")
    a = concentration(df, "g").collect()[0]
    b = concentration(df.repartition(13), "g", num_partitions=5).collect()[0]
    assert tuple(a) == tuple(b)
