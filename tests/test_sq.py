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
