"""Winnowing fingerprints (operators/winnow.py) vs the Schleimer
2003 guarantees."""

from __future__ import annotations

import random

import pytest

from med_doi_feature_extraction_spark.operators.winnow import (
    winnow_fingerprints,
    winnow_pairs,
)

K, W = 5, 4
THRESHOLD = W + K - 1  # guarantee span length


def _rand_words(rng, n, tag):
    return " ".join(f"{tag}{rng.randrange(10**6)}" for _ in range(n))


def test_guarantee_shared_span_detected(spark):
    """Any shared span of >= w+k-1 tokens yields >= 1 shared fp."""
    rng = random.Random(7)
    shared = _rand_words(rng, THRESHOLD, "s")
    rows = [
        (1, _rand_words(rng, 30, "a") + " " + shared + " "
         + _rand_words(rng, 30, "b")),
        (2, _rand_words(rng, 25, "c") + " " + shared + " "
         + _rand_words(rng, 25, "d")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = winnow_pairs(df, "doc_id", "text", k=K, w=W).collect()
    assert len(pairs) == 1
    assert pairs[0]["n_shared"] >= 1


def test_below_k_span_never_detected(spark):
    """Shared runs shorter than k tokens produce no common grams."""
    rng = random.Random(11)
    shared = _rand_words(rng, K - 1, "s")
    rows = [
        (1, _rand_words(rng, 40, "a") + " " + shared),
        (2, _rand_words(rng, 40, "b") + " " + shared),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert winnow_pairs(df, "doc_id", "text", k=K, w=W).count() == 0


def test_density_near_two_over_w_plus_one(spark):
    """Expected fingerprint density is ~2/(w+1) of grams."""
    rng = random.Random(13)
    n_tokens = 2000
    text = _rand_words(rng, n_tokens, "t")
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    n_fps = winnow_fingerprints(df, "doc_id", "text", k=K, w=W).count()
    n_grams = n_tokens - K + 1
    density = n_fps / n_grams
    assert 0.25 < density < 0.55  # 2/(w+1) = 0.4, distinct-dedup <=


def test_sub_k_documents_emit_nothing(spark):
    df = spark.createDataFrame(
        [(1, "only four tokens here"), (2, None), (3, "")],
        "doc_id long, text string",
    )
    assert winnow_fingerprints(df, "doc_id", "text", k=5, w=4).count() == 0


def test_identical_documents_full_containment(spark):
    rng = random.Random(17)
    text = _rand_words(rng, 100, "x")
    df = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id long, text string"
    )
    row = winnow_pairs(df, "doc_id", "text", k=K, w=W).collect()[0]
    assert row["n_shared"] == row["n_fps_a"] == row["n_fps_b"]
    assert row["containment_est"] == 1.0 and row["jaccard_est"] == 1.0


def test_hot_fingerprint_cap_drops_pairs(spark):
    rng = random.Random(19)
    shared = _rand_words(rng, 40, "s")
    rows = [(i, shared) for i in range(5)]  # fp doc-freq = 5
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert winnow_pairs(df, "doc_id", "text", k=K, w=W,
                        max_docs_per_fp=4).count() == 0
    assert winnow_pairs(df, "doc_id", "text", k=K, w=W,
                        max_docs_per_fp=5).count() == 10


def test_invalid_params_raise(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        winnow_fingerprints(df, "doc_id", "text", k=0, w=4)


def test_pairs_feed_cluster_resolution(spark):
    """winnow_pairs edges compose with dedup.dup_clusters: clone
    groups collapse to min-id clusters."""
    from med_doi_feature_extraction_spark.operators.dedup import (
        dedup_decisions,
    )
    from pyspark.sql import functions as F

    rng = random.Random(23)
    body = _rand_words(rng, 60, "c")
    rows = (
        [(i, body + f" tail{i}") for i in range(4)]  # clone group
        + [(10 + i, _rand_words(rng, 60, f"u{i}")) for i in range(3)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = winnow_pairs(df, "doc_id", "text", k=K, w=W).filter(
        F.col("containment_est") >= 0.8
    )
    out = dedup_decisions(
        df, "doc_id", pairs.select("id_a", "id_b")
    ).collect()
    by = {r["doc_id"]: r for r in out}
    assert all(by[i]["cluster_id"] == 0 for i in range(4))
    assert by[0]["keep"] and not any(by[i]["keep"] for i in (1, 2, 3))
    assert all(by[10 + i]["keep"] for i in range(3))
