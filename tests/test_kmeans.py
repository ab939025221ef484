"""Distributed full-corpus Lloyd k-means (operators/kmeans.py).

Oracle strategy: a pure-numpy reimplementation of the SAME portable
semantics (round(cos,6) argmax with lowest-cell ties; per-dim mean
rounded 6 dp; empty cells keep their centroid) — the Spark fit must
reproduce it row-for-row, and the sql/udf assignment impls must agree
with each other. The DuckDB contract twin (`kmeans` /
`kmeans_balance` in __spark_entry__) retrains the model a third way.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from med_doi_feature_extraction_spark.operators import kmeans as km


def _ref_assign(X: np.ndarray, cent: np.ndarray) -> np.ndarray:
    xn = np.maximum(np.linalg.norm(X, axis=1), 1e-12)
    cn = np.maximum(np.linalg.norm(cent, axis=1), 1e-12)
    sims = np.round((X @ cent.T) / xn[:, None] / cn[None, :], 6)
    return sims.argmax(axis=1)


def _ref_fit(X: np.ndarray, k: int, n_iter: int) -> np.ndarray:
    cent = X[:k].astype(np.float64).copy()
    for _ in range(n_iter):
        a = _ref_assign(X, cent)
        nxt = cent.copy()
        for j in range(k):
            pts = X[a == j]
            if len(pts):
                nxt[j] = np.round(pts.mean(axis=0), 6)
        cent = nxt
    return cent


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(7)
    X = rng.normal(size=(200, 16)).astype(np.float64)
    # plant 4 tight blobs so the fit has real structure to find
    for j in range(4):
        X[j * 50 : (j + 1) * 50] += 4.0 * rng.normal(size=16)
    rows = [(i, [float(v) for v in X[i]]) for i in range(len(X))]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    return X, df.repartition(5).cache()


def test_fit_matches_numpy_reference(spark, vecs):
    X, df = vecs
    cent = km.fit_kmeans(df, k=4, n_iter=3, init_ids=[0, 1, 2, 3])
    ref = _ref_fit(X, k=4, n_iter=3)
    assert np.allclose(cent, ref, atol=1e-9)
    got = (
        km.assign_cells(df, cent)
        .select("vec_id", "cell")
        .toPandas()
        .sort_values("vec_id")["cell"]
        .to_numpy()
    )
    assert (got == _ref_assign(X, ref)).all()


def test_sql_and_udf_impls_agree(spark, vecs):
    X, df = vecs
    cent = _ref_fit(X, k=4, n_iter=2)
    a = km.assign_cells(df, cent, impl="sql").select("vec_id", "cell")
    b = km.assign_cells(df, cent, impl="udf").select("vec_id", "cell")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_empty_cell_keeps_previous_centroid(spark):
    # two far blobs, k=3 seeded with a third point that immediately
    # loses all members: its centroid must persist, not NaN out
    rows = [
        (0, [10.0, 0.0]), (1, [10.1, 0.0]), (2, [9.9, 0.0]),
        (3, [0.0, 10.0]), (4, [0.0, 10.2]), (5, [-10.0, -10.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    cent = km.fit_kmeans(df, k=3, n_iter=2, init_ids=[0, 3, 5])
    # cell 2 keeps exactly its seed vector (sole member, mean = self)
    assert np.allclose(cent[2], [-10.0, -10.0])
    assert not np.isnan(cent).any()


def test_cluster_balanced_sample_caps_and_is_layout_stable(spark, vecs):
    X, df = vecs
    cent = _ref_fit(X, k=4, n_iter=3)
    kept = km.cluster_balanced_sample(df, cent, cap=20)
    sizes = kept.groupBy("cell").count().toPandas()
    assert (sizes["count"] <= 20).all() and len(sizes) == 4
    # survivor SET must not depend on partition layout
    kept2 = km.cluster_balanced_sample(df.repartition(13), cent, cap=20)
    a = sorted(r["vec_id"] for r in kept.select("vec_id").collect())
    b = sorted(r["vec_id"] for r in kept2.select("vec_id").collect())
    assert a == b


def test_init_ids_must_exist(spark, vecs):
    _, df = vecs
    with pytest.raises(ValueError):
        km.fit_kmeans(df, k=2, n_iter=1, init_ids=[0, 10_000])
