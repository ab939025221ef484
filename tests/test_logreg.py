"""Logistic-regression gate vs a numpy reference of the same GD."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from med_doi_feature_extraction_spark.operators.logreg import (
    logreg_score,
    train_logreg,
)


def _data(n=200, seed=5):
    rng = np.random.default_rng(seed)
    x1 = rng.normal(0, 1, n)
    x2 = rng.normal(0, 1, n)
    # linearly separable-ish target with noise
    y = (2.0 * x1 - 1.0 * x2 + rng.normal(0, 0.3, n) > 0).astype(float)
    return x1, x2, y


def _numpy_train(x1, x2, y, n_iter=4, lr=1.0):
    """Identical GD incl. the round-6 weight gate."""
    b = w1 = w2 = 0.0
    for _ in range(n_iter):
        z = b + w1 * x1 + w2 * x2
        p = 1.0 / (1.0 + np.exp(-z))
        gb = float(np.mean(p - y))
        g1 = float(np.mean((p - y) * x1))
        g2 = float(np.mean((p - y) * x2))
        # HALF_UP like Spark/DuckDB round(), incl. negatives
        def r6(v):
            import math

            s = -1.0 if v < 0 else 1.0
            return s * math.floor(abs(v) * 1e6 + 0.5) / 1e6

        b, w1, w2 = r6(b - lr * gb), r6(w1 - lr * g1), r6(w2 - lr * g2)
    return b, w1, w2


class TestLogreg:
    def test_matches_numpy_reference(self, spark):
        x1, x2, y = _data()
        df = spark.createDataFrame(
            [(float(a), float(b), float(c)) for a, b, c in zip(x1, x2, y)],
            "x1: double, x2: double, y: double",
        )
        w = train_logreg(df, ["x1", "x2"], "y", n_iter=4).collect()[0]
        nb, nw1, nw2 = _numpy_train(x1, x2, y, n_iter=4)
        assert abs(w["_b"] - nb) < 2e-6
        assert abs(w["_w_x1"] - nw1) < 2e-6
        assert abs(w["_w_x2"] - nw2) < 2e-6
        # learned signs follow the generative model
        assert w["_w_x1"] > 0 and w["_w_x2"] < 0

    def test_scores_and_gate(self, spark):
        x1, x2, y = _data()
        df = spark.createDataFrame(
            [(float(a), float(b), float(c)) for a, b, c in zip(x1, x2, y)],
            "x1: double, x2: double, y: double",
        )
        w = train_logreg(df, ["x1", "x2"], "y", n_iter=5)
        out = logreg_score(df, w, ["x1", "x2"])
        rows = out.collect()
        assert all(0.0 <= r["score"] <= 1.0 for r in rows)
        acc = np.mean(
            [float(r["keep"]) == r["y"] for r in rows]
        )
        assert acc >= 0.9  # the model actually learned the boundary
        assert "_b" not in out.columns

    def test_validation(self, spark):
        df = spark.createDataFrame([(1.0, 1.0)], "x1: double, y: double")
        with pytest.raises(ValueError):
            train_logreg(df, [], "y")
        with pytest.raises(ValueError):
            train_logreg(df, ["x1"], "y", n_iter=0)
