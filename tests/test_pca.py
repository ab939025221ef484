"""Embedding gram/covariance + PCA whitening (operators/pca.py)."""

from __future__ import annotations

import numpy as np
import pytest


def _vecs(n=120, dim=6, seed=3):
    rng = np.random.default_rng(seed)
    # anisotropic: stretch two axes, correlate a pair
    x = rng.normal(size=(n, dim))
    x[:, 0] *= 4.0
    x[:, 1] = 0.7 * x[:, 0] + 0.3 * x[:, 1]
    x += rng.uniform(-0.2, 0.2, size=dim)
    return np.round(x, 5)


def _df(spark, x):
    return spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<float>",
    )


def _quant(x, scale):
    return (
        np.floor(np.abs(x.astype(np.float64)) * scale + 0.5)
        * np.sign(x)
    ).astype(np.int64)


class TestEmbedGram:
    def test_moments_are_exact_integers(self, spark):
        from med_doi_feature_extraction_spark.operators.pca import (
            embed_gram,
        )

        x = _vecs(dim=4)
        rows = embed_gram(
            _df(spark, x), "embedding", dim=4, scale=1e4
        ).collect()
        xq = _quant(np.stack(_df(spark, x).toPandas()["embedding"]), 1e4)
        want_gram = xq.T @ xq
        want_sums = xq.sum(axis=0)
        for r in rows:
            if r["i"] == -1:
                assert r["s"] == len(x)
            elif r["j"] == -1:
                assert r["s"] == want_sums[r["i"]]
            else:
                assert r["s"] == want_gram[r["i"], r["j"]]

    def test_partition_count_invariance(self, spark):
        from med_doi_feature_extraction_spark.operators.pca import (
            embed_gram,
        )

        x = _vecs(dim=3)
        a = {
            (r["i"], r["j"]): r["s"]
            for r in embed_gram(
                _df(spark, x).repartition(1), "embedding", 3
            ).collect()
        }
        b = {
            (r["i"], r["j"]): r["s"]
            for r in embed_gram(
                _df(spark, x).repartition(7), "embedding", 3
            ).collect()
        }
        assert a == b

    def test_dim_mismatch_raises(self, spark):
        from med_doi_feature_extraction_spark.operators.pca import (
            embed_gram,
        )

        with pytest.raises(Exception):
            embed_gram(
                _df(spark, _vecs(dim=4)), "embedding", dim=5
            ).collect()


class TestEmbedCov:
    def test_cov_matches_numpy_on_quantized_values(self, spark):
        from med_doi_feature_extraction_spark.operators.pca import (
            embed_cov,
        )

        x = _vecs(dim=5)
        scale = 1e4
        rows = embed_cov(
            _df(spark, x), "embedding", dim=5, scale=scale
        ).collect()
        xf = np.stack(_df(spark, x).toPandas()["embedding"]).astype(
            np.float64
        )
        xq = _quant(xf, scale) / scale
        want = np.cov(xq, rowvar=False, bias=True)
        for r in rows:
            assert r["cov"] == pytest.approx(
                want[r["i"], r["j"]], abs=2e-6
            )


class TestPcaWhiten:
    def test_whitened_covariance_is_identity(self, spark):
        from med_doi_feature_extraction_spark.operators.pca import (
            pca_whiten,
        )

        x = _vecs(n=200, dim=6)
        out = pca_whiten(
            _df(spark, x), "vec_id", "embedding", dim=6, k=4
        )
        y = np.stack(
            out.toPandas().sort_values("vec_id")["proj"].to_numpy()
        )
        c = np.cov(y, rowvar=False, bias=True)
        assert np.allclose(c, np.eye(4), atol=2e-2)

    def test_matches_driver_side_numpy_reference(self, spark):
        from med_doi_feature_extraction_spark.operators.pca import (
            pca_whiten,
        )

        x = _vecs(n=150, dim=5, seed=9)
        scale = 1e6
        out = pca_whiten(
            _df(spark, x), "vec_id", "embedding", dim=5, k=3,
            scale=scale,
        )
        got = np.stack(
            out.toPandas().sort_values("vec_id")["proj"].to_numpy()
        )
        # replicate: quantized moments -> cov -> eigh -> signed W
        xf = np.stack(
            _df(spark, x).toPandas()["embedding"]
        ).astype(np.float64)
        xq = _quant(xf, scale)
        n = len(xq)
        mu = xq.sum(axis=0) / scale / n
        cov = (xq.T @ xq) / (scale * scale) / n - np.outer(mu, mu)
        evals, evecs = np.linalg.eigh(cov)
        order = np.argsort(evals)[::-1][:3]
        lam = np.maximum(evals[order], 1e-9)
        u = evecs[:, order]
        flip = np.sign(u[np.argmax(np.abs(u), axis=0), np.arange(3)])
        flip[flip == 0] = 1.0
        w = (u * flip) / np.sqrt(lam)
        want = np.round((xf - mu) @ w, 6)
        assert np.allclose(got, want, atol=2e-6)

    def test_deterministic_across_runs(self, spark):
        from med_doi_feature_extraction_spark.operators.pca import (
            pca_whiten,
        )

        x = _vecs(n=80, dim=4, seed=21)
        a = pca_whiten(
            _df(spark, x).repartition(5), "vec_id", "embedding", 4, 2
        ).collect()
        b = pca_whiten(
            _df(spark, x).repartition(2), "vec_id", "embedding", 4, 2
        ).collect()
        assert sorted((r["vec_id"], tuple(r["proj"])) for r in a) == \
            sorted((r["vec_id"], tuple(r["proj"])) for r in b)

    def test_rejects_bad_k(self, spark):
        from med_doi_feature_extraction_spark.operators.pca import (
            pca_whiten,
        )

        with pytest.raises(ValueError):
            pca_whiten(
                _df(spark, _vecs(dim=4)), "vec_id", "embedding", 4, 0
            )
