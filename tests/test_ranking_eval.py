"""ranking_metrics: hand-computed MRR/recall/nDCG golden + spine
semantics (queries with no results / no relevant docs)."""

from __future__ import annotations

import math

import pytest

from med_doi_feature_extraction_spark.operators.ranking_eval import (
    ranking_metrics,
)


@pytest.fixture(scope="module")
def metrics(spark):
    results = spark.createDataFrame(
        [
            ("q1", "d3", 1),
            ("q1", "d1", 2),
            ("q1", "d2", 3),
            ("q2", "d7", 1),
        ],
        "query_id string, neighbor_id string, rank int",
    )
    qrels = spark.createDataFrame(
        [
            ("q1", "d1", 2),
            ("q1", "d2", 1),
            ("q1", "d9", 3),  # relevant but not retrieved
            ("q3", "d5", 1),  # query with judgments but no results
        ],
        "query_id string, neighbor_id string, rel int",
    )
    out = ranking_metrics(results, qrels, k=3)
    return {r["query_id"]: r.asDict() for r in out.collect()}


def test_golden_q1(metrics):
    r = metrics["q1"]
    assert (r["n_retrieved"], r["n_relevant"]) == (3, 3)
    assert r["mrr"] == pytest.approx(0.5)  # first relevant at rank 2
    assert r["recall"] == pytest.approx(round(2 / 3, 6))
    dcg = 3 / math.log2(3) + 1 / math.log2(4)
    idcg = 7 / math.log2(2) + 3 / math.log2(3) + 1 / math.log2(4)
    assert r["ndcg"] == pytest.approx(round(dcg / idcg, 6), abs=1e-9)


def test_no_relevant_query(metrics):
    r = metrics["q2"]
    assert (r["n_retrieved"], r["n_relevant"]) == (1, 0)
    assert r["mrr"] == 0.0
    assert r["recall"] is None  # 0/0 undefined, not 0
    assert r["ndcg"] is None


def test_judged_but_unretrieved_query(metrics):
    r = metrics["q3"]
    assert (r["n_retrieved"], r["n_relevant"]) == (0, 1)
    assert r["mrr"] == 0.0
    assert r["recall"] == 0.0
    assert r["ndcg"] == 0.0


def test_perfect_ranking_is_one(spark):
    results = spark.createDataFrame(
        [("q", "a", 1), ("q", "b", 2)],
        "query_id string, neighbor_id string, rank int",
    )
    qrels = spark.createDataFrame(
        [("q", "a", 3), ("q", "b", 1)],
        "query_id string, neighbor_id string, rel int",
    )
    [r] = ranking_metrics(results, qrels, k=5).collect()
    assert r["mrr"] == 1.0
    assert r["recall"] == 1.0
    assert r["ndcg"] == 1.0


class TestRRFFuse:
    def test_hand_computed_fusion(self, spark):
        from med_doi_feature_extraction_spark.operators.ranking_eval import (
            rrf_fuse,
        )

        a = spark.createDataFrame(
            [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
            "query_id: long, neighbor_id: long, rank: long",
        )
        b = spark.createDataFrame(
            [(1, 11, 1), (1, 13, 2)],
            "query_id: long, neighbor_id: long, rank: long",
        )
        got = {
            r["neighbor_id"]: r
            for r in rrf_fuse([a, b], k=60).collect()
        }
        # doc 11 in both lists: 1/62 + 1/61; others single-system
        assert got[11]["rrf"] == round(1 / 62 + 1 / 61, 6)
        assert got[10]["rrf"] == round(1 / 61, 6)
        assert got[13]["rrf"] == round(1 / 62, 6)
        assert got[12]["rrf"] == round(1 / 63, 6)
        order = sorted(got.values(), key=lambda r: r["rank"])
        assert [r["neighbor_id"] for r in order] == [11, 10, 13, 12]

    def test_tie_breaks_by_id_and_topn(self, spark):
        from med_doi_feature_extraction_spark.operators.ranking_eval import (
            rrf_fuse,
        )

        a = spark.createDataFrame(
            [(1, 20, 1), (1, 21, 1)],  # identical ranks → rrf tie
            "query_id: long, neighbor_id: long, rank: long",
        )
        rows = rrf_fuse([a], k=60, topn=1).collect()
        assert len(rows) == 1 and rows[0]["neighbor_id"] == 20
