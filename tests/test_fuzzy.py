"""fuzzy_join: SymSpell blocking exactness vs brute force, caps, edges."""

from __future__ import annotations

import itertools

import pandas as pd
import pytest

from med_doi_feature_extraction_spark.operators.fuzzy import (
    deletion_variants,
    fuzzy_join,
)
from pyspark.sql import functions as F


def _lev(a: str, b: str) -> int:
    # classic DP oracle
    m, n = len(a), len(b)
    d = list(range(n + 1))
    for i in range(1, m + 1):
        prev, d[0] = d[0], i
        for j in range(1, n + 1):
            prev, d[j] = d[j], min(
                d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1])
            )
    return d[n]


WORDS = [
    "spark", "spa rk", "sprak", "spark!", "park", "sparkle", "shark",
    "", "s", "sp", "query", "quary", "qury", "queryy", "qwerty",
]


@pytest.mark.parametrize("k", [1, 2])
def test_fuzzy_join_equals_brute_force(spark, k):
    df = spark.createDataFrame(
        pd.DataFrame({"id": range(len(WORDS)), "key": WORDS})
    )
    got = fuzzy_join(
        df, df, "id", "id", "key", "key", max_distance=k, max_bucket=None
    ).filter(F.col("id_l") < F.col("id_r"))
    got_pairs = {(r.id_l, r.id_r, r.dist) for r in got.collect()}
    exp = {
        (i, j, _lev(a, b))
        for (i, a), (j, b) in itertools.combinations(enumerate(WORDS), 2)
        if _lev(a, b) <= k
    }
    assert got_pairs == exp


def test_deletion_variants_identity(spark):
    df = spark.createDataFrame(pd.DataFrame({"key": ["abc", "", "x"]}))
    got = df.select(deletion_variants(F.col("key"), 2).alias("v")).collect()
    assert sorted(got[0].v) == sorted(["abc", "ab", "ac", "bc", "a", "b", "c"])
    assert got[1].v == [""]
    assert sorted(got[2].v) == ["", "x"]


def test_fuzzy_join_null_keys_never_match(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"id": [0, 1, 2], "key": ["abc", None, "abd"]})
    )
    got = fuzzy_join(df, df, "id", "id", "key", "key", 1, None).filter(
        F.col("id_l") < F.col("id_r")
    ).collect()
    assert {(r.id_l, r.id_r) for r in got} == {(0, 2)}


def test_fuzzy_join_hot_bucket_cap(spark):
    # 5 identical keys: with a cap of 2 every variant bucket (size 5)
    # is dropped → no pairs; with cap None → all C(5,2) pairs
    df = spark.createDataFrame(
        pd.DataFrame({"id": range(5), "key": ["same"] * 5})
    )
    full = fuzzy_join(df, df, "id", "id", "key", "key", 1, None).filter(
        F.col("id_l") < F.col("id_r")
    )
    assert full.count() == 10
    capped = fuzzy_join(df, df, "id", "id", "key", "key", 1, 2).filter(
        F.col("id_l") < F.col("id_r")
    )
    assert capped.count() == 0
