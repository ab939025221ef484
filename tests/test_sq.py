"""int8 scalar-quantized similarity: quantization golden, scale
cancellation, recall vs the exact baseline."""

from __future__ import annotations

import pytest

from med_doi_feature_extraction_spark.operators.similarity import (
    cosine_topk,
    quantize_embeddings,
    sq_topk,
)


def test_quantize_golden(spark):
    df = spark.createDataFrame(
        [
            (1, [1.0, -0.5, 0.25, 0.0]),
            (2, [0.0, 0.0, 0.0, 0.0]),
            (3, [-2.0, 2.0, 1.0, -1.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r.asDict() for r in quantize_embeddings(df).collect()}
    # maxabs=1 → 127, floor(-63.5+0.5)=-63, floor(31.75+0.5)=32
    assert out[1]["qvec"] == [127, -63, 32, 0]
    assert out[1]["scale"] == pytest.approx(1.0 / 127)
    assert out[2]["qvec"] == [0, 0, 0, 0]
    assert out[2]["scale"] == 0.0
    # floor(x+0.5): halves round toward +inf → 63.5→64 but -63.5→-63
    assert out[3]["qvec"] == [-127, 127, 64, -63]


def test_sq_recall_vs_exact(spark):
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk(emb, queries, k=10).collect()
    approx = sq_topk(emb, queries, k=10).collect()
    by_q_exact: dict = {}
    by_q_approx: dict = {}
    for r in exact:
        by_q_exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in approx:
        by_q_approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert set(by_q_exact) == set(by_q_approx)
    recalls = [
        len(by_q_exact[q] & by_q_approx[q]) / len(by_q_exact[q])
        for q in by_q_exact
    ]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.9, f"sq recall@10 = {mean_recall}"
    # top-1 cosine must be close to the exact top-1 (quantization noise
    # for 64-dim int8 is well under 1e-2)
    top_exact = {r["query_id"]: r["cosine"] for r in exact if r["rank"] == 1}
    top_approx = {r["query_id"]: r["cosine"] for r in approx if r["rank"] == 1}
    for q in top_exact:
        assert abs(top_exact[q] - top_approx[q]) < 2e-2


def test_sq_rerank_improves_and_scores_exact(spark):
    """Rerank returns EXACT cosines for everything it keeps, and its
    top-k agrees with the exact baseline at least as well as the
    plain quantized search."""
    from pyspark.sql import functions as F

    from med_doi_feature_extraction_spark.operators.similarity import (
        sq_rerank_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk(emb, queries, k=5).collect()
    rer = sq_rerank_topk(emb, queries, k=5, expand=4).collect()
    sq = sq_topk(emb, queries, k=5).collect()

    def sets(rows):
        d: dict = {}
        for r in rows:
            d.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return d

    ex, re_, sq_ = sets(exact), sets(rer), sets(sq)
    rec_re = sum(len(ex[q] & re_[q]) / len(ex[q]) for q in ex) / len(ex)
    rec_sq = sum(len(ex[q] & sq_[q]) / len(ex[q]) for q in ex) / len(ex)
    assert rec_re >= rec_sq
    assert rec_re >= 0.95, (rec_re, rec_sq)
    # returned cosines are the full-precision values, not quantized
    exact_scores = {
        (r["query_id"], r["neighbor_id"]): r["cosine"] for r in exact
    }
    for r in rer:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_scores:
            assert r["cosine"] == exact_scores[key]
