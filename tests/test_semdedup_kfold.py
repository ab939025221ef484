"""Semantic dedup (embedding-space CC) and group-aware k-fold."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from med_doi_feature_extraction_spark.operators.sampling import group_kfold
from med_doi_feature_extraction_spark.operators.semdedup import (
    semantic_dedup,
    semdedup_pairs,
)


def _unit(v):
    v = np.asarray(v, dtype=np.float64)
    return (v / np.linalg.norm(v)).tolist()


@pytest.fixture(scope="module")
def vec_df(spark):
    # two well-separated directions; ids 1,2,3 are one near-dup chain
    # (1~2 and 2~3 strongly; 1~3 still > threshold), 4 is alone in the
    # same direction-cluster, 10/11 are an exact-dup pair elsewhere
    base_a = np.array([1.0, 0.0, 0.0, 0.0])
    base_b = np.array([0.0, 1.0, 0.0, 0.0])
    rows = [
        (1, _unit(base_a + [0.00, 0.01, 0, 0])),
        (2, _unit(base_a + [0.00, 0.02, 0, 0])),
        (3, _unit(base_a + [0.00, 0.03, 0, 0])),
        (4, _unit(base_a + [0.00, 0.90, 0, 0])),  # same cell, below threshold
        (10, _unit(base_b)),
        (11, _unit(base_b)),  # exact dup of 10
    ]
    return spark.createDataFrame(rows, "id long, v array<double>")


def test_semdedup_decisions(spark, vec_df):
    cent = np.array([[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]])
    out = {
        r["doc_id"]: (r["cluster_id"], r["keep"])
        for r in semantic_dedup(vec_df, "id", "v", cent, threshold=0.99).collect()
    }
    assert out[1] == (1, True)
    assert out[2] == (1, False)
    assert out[3] == (1, False)   # transitive chain collapses to min id
    assert out[4] == (4, True)    # same cell but cosine below threshold
    assert out[10] == (10, True)
    assert out[11] == (10, False)


def test_semdedup_pairs_exact_cosine(spark, vec_df):
    cent = np.array([[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]])
    pairs = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in semdedup_pairs(vec_df, "id", "v", cent, threshold=0.99).collect()
    }
    assert pairs[(10, 11)] == pytest.approx(1.0, abs=1e-12)
    got = pairs[(1, 2)]
    want = float(
        np.dot(_unit([1, 0.01, 0, 0]), _unit([1, 0.02, 0, 0]))
    )
    assert got == pytest.approx(want, abs=1e-12)
    assert (3, 4) not in pairs and (1, 4) not in pairs


def test_semdedup_cell_cap_drops_hot_cell(spark, vec_df):
    cent = np.array([[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]])
    pairs = semdedup_pairs(
        vec_df, "id", "v", cent, threshold=0.99, max_cell=3
    ).collect()
    # cell A holds 4 members (over cap) -> dropped; only the B pair left
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(10, 11)}


def test_group_kfold_groups_stay_together(spark):
    df = spark.createDataFrame(
        [(i, f"dom{i % 7}") for i in range(200)] + [(999, None)],
        "id long, dom string",
    )
    out = group_kfold(df, "dom", k=5).collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r["dom"], set()).add(r["fold"])
    for dom, folds in by_group.items():
        assert len(folds) == 1, f"group {dom} split across folds {folds}"
    assert all(0 <= r["fold"] < 5 for r in out)
    # deterministic: a second run assigns identical folds
    again = {r["id"]: r["fold"] for r in group_kfold(df, "dom", k=5).collect()}
    assert {r["id"]: r["fold"] for r in out} == again


def test_group_kfold_rejects_k1(spark):
    df = spark.createDataFrame([(1, "a")], "id long, dom string")
    with pytest.raises(ValueError):
        group_kfold(df, "dom", k=1)


def test_dedup_aware_split_keeps_near_dups_together(spark):
    """Composition pin: cluster members (near-dups via CC) always land
    in the same fold — the split can't leak a paraphrase across
    train/eval."""
    from med_doi_feature_extraction_spark.operators.dedup import (
        dedup_decisions,
    )
    from med_doi_feature_extraction_spark.operators.sampling import (
        group_kfold,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i,) for i in range(30)], "doc_id: long"
    )
    # two clusters: {0,1,2} (chained) and {10,11}
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "id_a: long, id_b: long"
    )
    labeled = dedup_decisions(docs, "doc_id", pairs)
    folds = group_kfold(
        labeled, F.col("cluster_id").cast("string"), k=3, salt="split"
    )
    got = {r["doc_id"]: r["fold"] for r in folds.collect()}
    assert got[0] == got[1] == got[2]
    assert got[10] == got[11]
    assert set(got.values()) == {0, 1, 2}  # all folds used over 30 docs
