"""Z-order clustering key: hand-computed Morton interleave, clamping,
and the pruning property the layout exists for."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from med_doi_feature_extraction_spark.operators.layout import (
    cluster_by_zorder,
    normalize_to_bits,
    zorder_key,
)


def _morton2(x: int, y: int, bits: int) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_zorder_hand_computed(spark):
    rows = [(0b101, 0b011), (0, 0), (7, 7), (1, 6)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = df.select(
        "x", "y", zorder_key([F.col("x"), F.col("y")], bits=3).alias("z")
    ).collect()
    for r in out:
        assert r.z == _morton2(r.x, r.y, 3), (r.x, r.y)


def test_normalize_clamps_and_scales(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (50.0,), (99.999,), (100.0,), (250.0,)], "v double"
    )
    out = [
        r.b
        for r in df.select(
            normalize_to_bits(F.col("v"), 0.0, 100.0, 8).alias("b")
        ).collect()
    ]
    # clamped below -> 0; above/at hi -> max cell 255; mid -> 128
    assert out == [0, 0, 128, 255, 255, 255]


def test_zorder_validation(spark):
    with pytest.raises(ValueError):
        zorder_key([F.col("x")], bits=8)
    with pytest.raises(ValueError):
        zorder_key([F.col("x"), F.col("y")], bits=32)
    with pytest.raises(ValueError):
        normalize_to_bits(F.col("x"), 1.0, 1.0, 8)


def test_cluster_by_zorder_prunes_both_dims(spark):
    """The point of the layout: after range-partitioning by the Morton
    key, a box predicate on EITHER dimension touches only a fraction
    of partitions (per-partition min/max of each dim stays compact)."""
    n_parts = 16
    df = spark.range(4096).select(
        (F.col("id") % 64).cast("double").alias("x"),
        (F.col("id") / 64).cast("double").alias("y"),
    )
    clustered = cluster_by_zorder(
        df, [("x", 0.0, 64.0), ("y", 0.0, 64.0)], bits=6,
        num_partitions=n_parts,
    ).withColumn("pid", F.spark_partition_id())
    stats = clustered.groupBy("pid").agg(
        F.min("x"), F.max("x"), F.min("y"), F.max("y")
    ).collect()
    assert len(stats) == n_parts
    # a predicate x in [0, 16) can skip every partition whose min(x)
    # >= 16 — require that at least half the partitions are skippable
    # on each dimension (unclustered row order gives ~0)
    skip_x = sum(1 for r in stats if r["min(x)"] >= 16)
    skip_y = sum(1 for r in stats if r["min(y)"] >= 16)
    assert skip_x >= n_parts // 2
    assert skip_y >= n_parts // 4
