"""Hard-negative mining (similarity.hard_negatives). DuckDB twin:
the `hard_negatives` contract query."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import types as T

from med_doi_feature_extraction_spark.operators.similarity import (
    hard_negatives,
)


@pytest.fixture(scope="module")
def mined(spark):
    rng = np.random.default_rng(11)
    X = rng.normal(size=(60, 8))
    vec_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    corpus = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(60)], vec_schema
    )
    queries = corpus.filter("vec_id < 3")
    # qrels: each query's positives are the 4 ids after it
    pos_rows = [(q, q + j) for q in range(3) for j in range(1, 5)]
    pos = spark.createDataFrame(
        pos_rows, "query_id: long, neighbor_id: long"
    )
    out = hard_negatives(corpus, queries, pos, k=7).collect()
    return X, {(r["query_id"], r["neighbor_id"]): r for r in out}, out


def test_positives_and_self_excluded(mined):
    _, got, _ = mined
    for q in range(3):
        assert (q, q) not in got
        for j in range(1, 5):
            assert (q, q + j) not in got


def test_matches_numpy_brute_force(mined):
    X, _, out = mined
    xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    sims = np.round(xn @ xn.T, 6)
    for q in range(3):
        banned = {q} | {q + j for j in range(1, 5)}
        cand = [
            (-sims[q, i], i) for i in range(60) if i not in banned
        ]
        expect = [i for _, i in sorted(cand)[:7]]
        got_q = sorted(
            (r for r in out if r["query_id"] == q),
            key=lambda r: r["rank"],
        )
        assert [r["neighbor_id"] for r in got_q] == expect
        assert [r["rank"] for r in got_q] == list(range(1, 8))


def test_scores_are_rounded_cosines(mined):
    X, got, _ = mined
    xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    for (q, n), r in got.items():
        assert abs(r["cosine"] - round(float(xn[q] @ xn[n]), 6)) < 1e-9
