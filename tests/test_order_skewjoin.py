"""global_row_number / skip_limit_ranged / skew_join / snapshot_diff.

global_row_number is checked against the single-reducer window it
replaces (the semantic oracle), including layout independence and a
duplicate-sort-key totality guard; skew_join against the plain join
under an adversarial 40%-hot-key fixture incl. NULL keys and the left
variant; snapshot_diff against hand-computed statuses.
"""

from __future__ import annotations

from collections import Counter

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from med_doi_feature_extraction_spark.operators.order import (
    global_row_number,
    skip_limit_ranged,
)
from med_doi_feature_extraction_spark.operators.skew import (
    detect_hot_keys,
    skew_join,
)
from med_doi_feature_extraction_spark.operators.upsert import snapshot_diff


def _bag(df):
    return Counter(map(tuple, df.collect()))


@pytest.fixture(scope="module")
def vals(spark):
    # non-monotone values with a unique tiebreak id
    return spark.range(2000).select(
        F.col("id").alias("k"),
        ((F.col("id") * 37) % 501).alias("v"),
    ).cache()


def test_global_row_number_matches_single_reducer_window(vals):
    got = global_row_number(vals, ["v", "k"], name="rn")
    ref = vals.withColumn(
        "rn", F.row_number().over(Window.orderBy("v", "k")).cast("long")
    )
    assert sorted(map(tuple, got.select("k", "rn").collect())) == sorted(
        map(tuple, ref.select("k", "rn").collect())
    )


def test_global_row_number_layout_independent(vals):
    a = global_row_number(vals, ["v", "k"]).select("k", "rn")
    b = global_row_number(vals.repartition(13), ["v", "k"]).select("k", "rn")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_global_row_number_no_single_partition_exchange(vals):
    plan = global_row_number(vals, ["v", "k"])._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_skip_limit_ranged(vals):
    page = skip_limit_ranged(vals, ["v", "k"], skip=100, limit=25)
    rows = sorted(r.rn for r in page.collect())
    assert rows == list(range(101, 126))


def test_global_row_number_start_offset(spark):
    df = spark.range(5).select(F.col("id").alias("k"))
    out = global_row_number(df, ["k"], start=100)
    assert sorted(r.rn for r in out.collect()) == [100, 101, 102, 103, 104]


# ---------------------------------------------------------------- skew_join


@pytest.fixture(scope="module")
def skewed(spark):
    fact = spark.range(5000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 5 < 2, F.lit(7))  # 40% of rows on key 7
        .when(F.col("id") % 97 == 0, F.lit(None))
        .otherwise(F.col("id") % 200)
        .cast("long")
        .alias("k"),
    )
    dim = spark.range(150).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("tag")
    )
    return fact.cache(), dim.cache()


def test_skew_join_inner_parity(skewed):
    fact, dim = skewed
    got = skew_join(fact, dim, "k", hot_keys=[7])
    ref = fact.join(dim, "k")
    assert _bag(got) == _bag(ref)


def test_skew_join_left_parity_keeps_nulls(skewed):
    fact, dim = skewed
    got = skew_join(fact, dim, "k", hot_keys=[7], how="left")
    ref = fact.join(dim, "k", "left")
    assert got.count() == fact.count()
    assert _bag(got) == _bag(ref)


def test_skew_join_autodetect_and_empty_hotset(skewed):
    fact, dim = skewed
    hot = detect_hot_keys(fact, "k", threshold=500)
    assert hot == [7]
    got = skew_join(fact, dim, "k", hot_threshold=500)
    ref = fact.join(dim, "k")
    assert _bag(got) == _bag(ref)
    # no key above threshold -> falls back to the plain join
    none_hot = skew_join(fact, dim, "k", hot_threshold=10**9)
    assert none_hot.count() == ref.count()


def test_skew_join_hot_branch_is_broadcast(skewed):
    fact, dim = skewed
    plan = (
        skew_join(fact, dim, "k", hot_keys=[7])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_skew_join_rejects_outer(skewed):
    fact, dim = skewed
    with pytest.raises(ValueError):
        skew_join(fact, dim, "k", hot_keys=[7], how="full_outer")


# ------------------------------------------------------------ snapshot_diff


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [("a", "t1"), ("b", "t2"), ("c", None), ("d", "t4")],
        "doc_id string, text string",
    )
    new = spark.createDataFrame(
        [("a", "t1"), ("b", "t2-edited"), ("c", None), ("e", "t5")],
        "doc_id string, text string",
    )
    got = {
        r.doc_id: r.status
        for r in snapshot_diff(old, new, ["doc_id"], ["text"]).collect()
    }
    assert got == {
        "a": "unchanged",
        "b": "changed",
        "c": "unchanged",  # NULL <=> NULL is unchanged, not changed
        "d": "removed",
        "e": "added",
    }


def test_snapshot_diff_null_to_value_is_changed(spark):
    old = spark.createDataFrame([("a", None)], "doc_id string, text string")
    new = spark.createDataFrame([("a", "now")], "doc_id string, text string")
    (row,) = snapshot_diff(old, new, ["doc_id"], ["text"]).collect()
    assert row.status == "changed" and row.text_old is None and row.text_new == "now"
