"""salted_agg (operators/skew.py): output parity with the unsalted
groupBy, including an adversarial hot-key fixture (one key = 30% of
rows, mirroring tests/test_skew.py's join cases), decomposition
patterns (sum/count/max/collect_set/HLL), and the plan shape (two
exchanges, hot key spread over salt_factor stage-1 groups)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from med_doi_feature_extraction_spark.operators.skew import salted_agg


@pytest.fixture(scope="module")
def skewed(spark):
    """200k rows; key 'hot' takes 30%, the rest Zipf-ish over 50 keys."""
    n = 200_000
    df = spark.range(n).select(
        F.when(F.col("id") % 10 < 3, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 50).cast("string")))
        .alias("key"),
        (F.col("id") % 997).alias("v"),
        F.concat(F.lit("u"), (F.col("id") % 1213).cast("string")).alias("uid"),
    )
    return df.cache()


def test_sum_count_max_parity(spark, skewed):
    got = salted_agg(
        skewed, ["key"],
        partial={"s": F.sum("v"), "c": F.count(F.lit(1)), "m": F.max("v")},
        merge={"total": F.sum("s"), "n": F.sum("c"), "vmax": F.max("m")},
        salt_factor=8,
    )
    want = skewed.groupBy("key").agg(
        F.sum("v").alias("total"), F.count(F.lit(1)).alias("n"),
        F.max("v").alias("vmax"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_exact_distinct_via_collect_set(spark, skewed):
    got = salted_agg(
        skewed, ["key"],
        partial={"s": F.collect_set("uid")},
        merge={"n_uid": F.size(F.array_distinct(F.flatten(F.collect_list("s"))))},
        salt_factor=8,
    )
    want = skewed.groupBy("key").agg(F.countDistinct("uid").alias("n_uid"))
    assert sorted(map(tuple, got.collect())) == sorted(
        (r.key, int(r.n_uid)) for r in want.collect()
    )


def test_hll_sketch_decomposition(spark, skewed):
    """Sketch partials union to the SAME estimate as a one-shot
    sketch — salted HLL == unsalted HLL, bit-for-bit."""
    got = salted_agg(
        skewed, ["key"],
        partial={"sk": F.hll_sketch_agg("uid")},
        merge={"est": F.hll_sketch_estimate(F.hll_union_agg("sk", F.lit(True)))},
        salt_factor=8,
    )
    want = skewed.groupBy("key").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("uid")).alias("est")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_salt_factor_invariance(spark, skewed):
    outs = [
        sorted(map(tuple, salted_agg(
            skewed, ["key"],
            partial={"s": F.sum("v")}, merge={"total": F.sum("s")},
            salt_factor=sf,
        ).collect()))
        for sf in (2, 16, 64)
    ]
    assert outs[0] == outs[1] == outs[2]


def test_stage1_spreads_hot_key(spark, skewed):
    """The mechanism itself: stage 1 must produce salt_factor rows for
    the hot key (the hot reducer's work is divided by salt_factor)."""
    salted = skewed.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(8))
    )
    n_groups = (
        salted.filter(F.col("key") == "hot")
        .select("_salt").distinct().count()
    )
    assert n_groups == 8


def test_salt_factor_validation(spark, skewed):
    with pytest.raises(ValueError):
        salted_agg(skewed, ["key"], partial={}, merge={}, salt_factor=1)
