"""Quality-aware dedup survivors and the hashing-trick vectorizer."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from med_doi_feature_extraction_spark.operators.dedup import (
    dedup_decisions_by,
)
from med_doi_feature_extraction_spark.operators.feateng import feature_hash


def test_dedup_decisions_by_prefers_quality(spark):
    docs = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 50), (7, 5), (9, 5)],
        "doc_id long, quality long",
    )
    # component {1,2,3}: survivor should be 2 (max quality), not min id
    # component {7,9}: quality tie -> id asc tiebreak keeps 7
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], "id_a long, id_b long"
    )
    out = {
        r["doc_id"]: (r["cluster_id"], r["keep"])
        for r in dedup_decisions_by(
            docs, "doc_id", pairs, prefer=[F.desc("quality")]
        ).collect()
    }
    assert out[2] == (1, True)
    assert out[1] == (1, False) and out[3] == (1, False)
    assert out[7] == (7, True) and out[9] == (7, False)


def test_dedup_decisions_by_singletons_keep_themselves(spark):
    docs = spark.createDataFrame([(5, 1)], "doc_id long, quality long")
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    row = dedup_decisions_by(docs, "doc_id", pairs, prefer=[F.desc("quality")]).collect()
    assert row == [(5, 5, True)] or (
        row[0]["doc_id"] == 5 and row[0]["cluster_id"] == 5 and row[0]["keep"]
    )


def _py_fh(token: str, dim: int, salt: str = "fh") -> tuple[int, int]:
    h = hashlib.sha256(f"{token}|{salt}".encode()).hexdigest()
    idx = int(h[:8], 16) % dim
    sign = 1 if int(h[8], 16) % 2 == 0 else -1
    return idx, sign


def test_feature_hash_matches_python_reference(spark):
    df = spark.createDataFrame(
        [(1, ["alpha", "beta", "alpha"]), (2, ["gamma"])],
        "id long, toks array<string>",
    )
    got = {
        (r["id"], r["idx"]): r["val"]
        for r in feature_hash(df, "id", "toks", dim=64).collect()
    }
    want: dict[tuple[int, int], int] = {}
    for i, toks in [(1, ["alpha", "beta", "alpha"]), (2, ["gamma"])]:
        for t in toks:
            idx, sign = _py_fh(t, 64)
            want[(i, idx)] = want.get((i, idx), 0) + sign
    assert got == want


def test_feature_hash_signed_collision_keeps_zero_row(spark):
    # find two tokens colliding on idx with opposite signs at tiny dim
    dim = 2
    toks, seen = [], {}
    i = 0
    while not toks:
        t = f"tok{i}"
        idx, sign = _py_fh(t, dim)
        if (idx, -sign) in seen:
            toks = [seen[(idx, -sign)], t]
        seen[(idx, sign)] = t
        i += 1
    df = spark.createDataFrame([(1, toks)], "id long, toks array<string>")
    out = feature_hash(df, "id", "toks", dim=dim).collect()
    cancelled = [r for r in out if r["val"] == 0]
    assert cancelled, "opposite-sign collision must surface as explicit 0"


def test_feature_hash_unsigned_counts(spark):
    df = spark.createDataFrame([(1, ["x", "x", "y"])], "id long, toks array<string>")
    out = feature_hash(df, "id", "toks", dim=8, signed=False).collect()
    assert sum(r["val"] for r in out) == 3
    assert all(r["val"] > 0 for r in out)
