"""Embedding-space benchmark decontamination (operators/decontam.py,
semantic tier). DuckDB twin: the `semantic_decontam` contract query."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from med_doi_feature_extraction_spark.operators import decontam as dc


def _schema():
    return T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )


@pytest.fixture(scope="module")
def fixture(spark):
    b0 = [1.0, 0.0, 0.0, 0.0]
    b1 = [0.0, 1.0, 0.0, 0.0]
    b2 = [0.0, 1.0, 0.0, 0.0]  # duplicate of b1 → tie → lowest id wins
    bench = spark.createDataFrame(
        [(0, b0), (1, b1), (2, b2)], _schema()
    )
    corpus = spark.createDataFrame(
        [
            (10, [2.0, 0.0, 0.0, 0.0]),       # scaled copy of b0 → sim 1
            (11, [0.0, 0.9, 0.1, 0.0]),       # near b1
            (12, [0.0, 0.0, 0.0, 1.0]),       # orthogonal to all
            (13, None),                       # NULL embedding
        ],
        _schema(),
    )
    return bench, corpus


def test_contamination_report(spark, fixture):
    bench, corpus = fixture
    ids, mat = dc.collect_bench_vectors(bench)
    rep = {
        r["vec_id"]: r
        for r in dc.semantic_contamination(
            corpus, ids, mat, tau=0.9
        ).collect()
    }
    assert rep[10]["sim"] == 1.0 and rep[10]["contaminated"]
    assert rep[10]["best_bench_id"] == 0
    # near-copy of b1: cos = 0.9/sqrt(0.82) ≈ 0.9939 → contaminated,
    # tie between b1 and b2 resolves to the LOWEST bench id
    assert rep[11]["contaminated"] and rep[11]["best_bench_id"] == 1
    assert abs(rep[11]["sim"] - round(0.9 / np.sqrt(0.82), 6)) < 1e-9
    assert not rep[12]["contaminated"] and rep[12]["sim"] < 0.01
    assert rep[13]["sim"] is None and not rep[13]["contaminated"]
    assert rep[13]["best_bench_id"] is None


def test_decontaminate_filters_survivors(spark, fixture):
    bench, corpus = fixture
    kept = dc.semantic_decontaminate(corpus, bench, tau=0.9)
    ids = sorted(r["vec_id"] for r in kept.select("vec_id").collect())
    assert ids == [12, 13]  # NULL-embedding rows survive the gate


def test_empty_bench_raises(spark, fixture):
    bench, _ = fixture
    with pytest.raises(ValueError):
        dc.collect_bench_vectors(bench.filter(F.col("vec_id") < 0))
