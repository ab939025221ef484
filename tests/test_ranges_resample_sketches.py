"""Unit tests for the round-4 temporal/rollup additions:
bucketized interval joins (operators/ranges.py), time-grid resample
(operators/resample.py), and mergeable sketch aggregates
(operators/sketches.py).

Each test checks the operator against a brute-force reference built
with plain pandas/python over a small seeded fixture — independent of
the DuckDB contract oracles (which check the same semantics at
sf0.01 via __spark_entry__)."""

from __future__ import annotations

import datetime as dt
import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from med_doi_feature_extraction_spark.operators.ranges import (
    interval_join,
    overlap_join,
)
from med_doi_feature_extraction_spark.operators.resample import resample
from med_doi_feature_extraction_spark.operators.sketches import (
    approx_stats,
    group_sketch,
    rollup_sketch,
)

EPOCH = dt.datetime(2024, 1, 1)


def _ts(sec: float) -> dt.datetime:
    return EPOCH + dt.timedelta(seconds=sec)


@pytest.fixture(scope="module")
def point_interval_fixture(spark):
    """Seeded points + intervals with adversarial placements: spans
    shorter/longer than the bucket, boundary-exact timestamps, empty
    and inverted intervals, multi-key users."""
    rng = random.Random(7)
    points = [
        (u, i, _ts(rng.uniform(0, 200_000)))
        for u in range(5)
        for i in range(80)
    ]
    intervals = []
    iid = 0
    for u in range(5):
        for _ in range(30):
            s = rng.uniform(0, 200_000)
            span = rng.choice([60, 1800, 3600, 7200, 40_000])
            intervals.append((u, iid, _ts(s), _ts(s + span)))
            iid += 1
    # boundary exactness: interval starting exactly at a point ts and
    # ending exactly at another point ts (half-open: start in, end out)
    p0, p1 = points[0][2], points[1][2]
    lo, hi = min(p0, p1), max(p0, p1)
    intervals.append((points[0][0], iid, lo, hi)); iid += 1
    # empty + inverted intervals: must match nothing, not crash
    intervals.append((0, iid, _ts(100), _ts(100))); iid += 1
    intervals.append((0, iid, _ts(500), _ts(400))); iid += 1
    pts = spark.createDataFrame(points, "user_id long, point_id long, p_ts timestamp")
    ivs = spark.createDataFrame(
        intervals, "user_id long, iv_id long, s_ts timestamp, e_ts timestamp"
    )
    return points, intervals, pts, ivs


def _brute_pairs(points, intervals):
    return sorted(
        (p[1], iv[1])
        for p in points
        for iv in intervals
        if p[0] == iv[0] and iv[2] <= p[2] < iv[3]
    )


@pytest.mark.parametrize("bucket_sec", [600, 3600, 100_000])
def test_interval_join_matches_brute_force(
    spark, point_interval_fixture, bucket_sec
):
    points, intervals, pts, ivs = point_interval_fixture
    out = interval_join(
        pts, ivs, "p_ts", "s_ts", "e_ts", on=["user_id"], bucket_sec=bucket_sec
    )
    got = sorted((r.point_id, r.iv_id) for r in out.collect())
    assert got == _brute_pairs(points, intervals)
    # exactly-once: no dedup pass, so duplicates would show here
    assert len(got) == len(set(got))


def test_interval_join_no_keys(spark, point_interval_fixture):
    points, intervals, pts, ivs = point_interval_fixture
    out = interval_join(
        pts.drop("user_id"),
        ivs.drop("user_id"),
        "p_ts", "s_ts", "e_ts",
        bucket_sec=3600,
    )
    expected = sorted(
        (p[1], iv[1])
        for p in points
        for iv in intervals
        if iv[2] <= p[2] < iv[3]
    )
    got = sorted((r.point_id, r.iv_id) for r in out.collect())
    assert got == expected


@pytest.mark.parametrize("bucket_sec", [600, 3600, 100_000])
def test_overlap_join_matches_brute_force(
    spark, point_interval_fixture, bucket_sec
):
    _, intervals, _, ivs = point_interval_fixture
    a = ivs.select("user_id", F.col("iv_id").alias("id_a"),
                   F.col("s_ts").alias("sa"), F.col("e_ts").alias("ea"))
    b = ivs.select("user_id", F.col("iv_id").alias("id_b"),
                   F.col("s_ts").alias("sb"), F.col("e_ts").alias("eb"))
    out = overlap_join(
        a, b.filter(F.col("id_b") % 2 == 0),
        "sa", "ea", "sb", "eb", on=["user_id"], bucket_sec=bucket_sec,
    )
    got = sorted((r.id_a, r.id_b) for r in out.collect())
    expected = sorted(
        (x[1], y[1])
        for x in intervals
        for y in intervals
        if y[1] % 2 == 0 and x[0] == y[0]
        and x[2] < x[3] and y[2] < y[3]       # non-empty on both sides
        and x[2] < y[3] and y[2] < x[3]
    )
    assert got == expected
    assert len(got) == len(set(got))  # canonical-bucket exactly-once


def test_resample_grid_and_ffill(spark):
    rows = [
        (1, _ts(0), 10.0),
        (1, _ts(30), 20.0),          # same cell as above (freq=60)
        (1, _ts(200), 5.0),          # cells 1-2 are gaps
        (2, _ts(86_400), 7.0),       # second entity, disjoint span
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, v double")
    out = resample(
        df, "user_id", "ts", 60, aggs={"v_sum": F.sum("v")},
        ffill_cols=["v_sum"],
    ).orderBy("user_id", "cell_ts")
    got = [
        (r.user_id, r.cell_ts, r.is_gap, r.n_rows, r.v_sum, r.v_sum_ffill)
        for r in out.collect()
    ]
    assert got == [
        (1, _ts(0), False, 2, 30.0, 30.0),
        (1, _ts(60), True, 0, None, 30.0),
        (1, _ts(120), True, 0, None, 30.0),
        (1, _ts(180), False, 1, 5.0, 5.0),
        (2, _ts(86_400), False, 1, 7.0, 7.0),
    ]


def test_resample_gap_vs_null_agg(spark):
    """A cell whose rows all carry NULL values is NOT a gap — n_rows
    counts rows, is_gap keys off the count, and the agg stays NULL."""
    rows = [(1, _ts(0), None), (1, _ts(120), 3.0)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, v double")
    out = resample(df, "user_id", "ts", 60, aggs={"v_sum": F.sum("v")})
    got = {r.cell_ts: (r.is_gap, r.n_rows, r.v_sum) for r in out.collect()}
    assert got[_ts(0)] == (False, 1, None)
    assert got[_ts(60)] == (True, 0, None)
    assert got[_ts(120)] == (False, 1, 3.0)


def test_hll_estimate_accuracy_and_merge_identity(spark):
    """The property that makes the two-level pipeline trustworthy:
    unioning per-chunk sketches gives the SAME estimate as one global
    sketch, and the estimate sits within 5% of the exact count."""
    n = 20_000
    df = spark.range(n).select(
        (F.col("id") % 4).alias("g"),
        F.concat(F.lit("user_"), (F.col("id") % 7919).cast("string")).alias("uid"),
    )
    per_group = group_sketch(df, ["g"], "uid")
    direct = group_sketch(df, [], "uid").collect()[0].distinct_est
    merged = rollup_sketch(per_group, []).collect()[0].distinct_est
    assert merged == direct
    exact = 7919
    assert abs(merged - exact) <= 0.05 * exact


def test_approx_stats_bounds(spark):
    df = spark.range(10_000).select(
        (F.col("id") % 3).alias("g"),
        F.col("id").alias("uid"),
        (F.col("id") % 1000).cast("double").alias("v"),
    )
    out = approx_stats(df, ["g"], "uid", "v", quantiles=(0.5, 0.95))
    for r in out.collect():
        # ~3334 distinct uids per group; HLL within 5%
        assert abs(r.distinct_est - 10_000 / 3) <= 0.05 * 10_000 / 3
        # GK quantiles are actual group elements with tiny rank error
        assert 0 <= r.q50 <= 999 and r.q50 <= r.q95 <= 999
        assert abs(r.q50 - 500) <= 25 and r.q95 >= 900


# --------------------------------------------------- portable HLL


def test_portable_hll_merge_identity_exact(spark):
    """hll_merge(build(A) ∪ build(B)) == build(A ∪ B) REGISTER-exact
    (not just estimate-equal): the merge is a max over integer rhos,
    so partitioned builds are bit-identical to one-shot builds."""
    from med_doi_feature_extraction_spark.operators.sketches import (
        hll_build,
        hll_merge,
    )

    df = spark.range(30_000).select(
        (F.col("id") % 3).alias("g"),
        (F.col("id") % 4111).cast("string").alias("v"),
        F.col("id").alias("k"),
    )
    a, b = df.filter(F.col("k") % 2 == 0), df.filter(F.col("k") % 2 == 1)
    merged = hll_merge(
        hll_build(a, ["g"], "v").unionByName(hll_build(b, ["g"], "v")),
        ["g"],
    )
    oneshot = hll_build(df, ["g"], "v")
    got = {(r.g, r.idx): r.rho for r in merged.collect()}
    want = {(r.g, r.idx): r.rho for r in oneshot.collect()}
    assert got == want


def test_portable_hll_estimate_accuracy(spark):
    """Estimate within the 3.25% stderr bound (×2 for safety) of the
    exact distinct count, in both the raw and linear-counting regimes."""
    from med_doi_feature_extraction_spark.operators.sketches import (
        hll_build,
        hll_estimate,
    )

    # large regime: 50k distinct >> 2.5m (m=1024)
    big = spark.range(50_000).select(F.col("id").cast("string").alias("v"))
    est = hll_estimate(hll_build(big, [], "v"), []).collect()[0].distinct_est
    assert abs(est / 50_000 - 1.0) <= 0.065
    # small regime: 100 distinct << m → linear counting, near-exact
    small = spark.range(100).select(F.col("id").cast("string").alias("v"))
    est_s = hll_estimate(hll_build(small, [], "v"), []).collect()[0].distinct_est
    assert abs(est_s / 100 - 1.0) <= 0.05


def test_portable_hll_duckdb_register_parity(spark):
    """Every register (idx, rho) matches a from-scratch DuckDB
    recomputation — the property that makes sketch FILES portable
    artifacts any engine can verify or extend."""
    import duckdb

    from med_doi_feature_extraction_spark.operators.sketches import (
        hll_build,
    )

    vals = [f"doc_{i * 7}" for i in range(5_000)]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = {(r.idx, r.rho) for r in hll_build(df, [], "v").collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest(?) AS v", [vals])
    want = set(
        con.execute(
            """
            WITH h AS (
              SELECT ('0x' || substr(sha256(v || '|hll'), 1, 15))::UBIGINT::BIGINT AS h
              FROM t
            )
            SELECT h % 1024 AS idx,
                   max(CASE WHEN h // 1024 > 0
                            THEN 50 - (length(bin(h // 1024)) - 1)
                            ELSE 51 END) AS rho
            FROM h GROUP BY 1
            """
        ).fetchall()
    )
    assert got == want


# ------------------------------------- sampled quantile sketch


def test_quantile_sample_merge_identity_and_error(spark):
    """Union of per-shard sketches == one-shot sketch EXACTLY (hash
    membership is per-row, layout-independent), and the sample
    quantile lands within the ~sqrt(q(1-q)/s) rank-error band."""
    from med_doi_feature_extraction_spark.operators.sketches import (
        quantile_estimate,
        quantile_sample,
    )

    n = 40_000
    df = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") % 10_000).cast("double").alias("v")
    )
    a, b = df.filter(F.col("k") % 3 == 0), df.filter(F.col("k") % 3 != 0)
    merged = quantile_sample(a, [], "v", "k", 0.2).unionByName(
        quantile_sample(b, [], "v", "k", 0.2)
    )
    oneshot = quantile_sample(df, [], "v", "k", 0.2)
    assert sorted(r.v for r in merged.collect()) == sorted(
        r.v for r in oneshot.collect()
    )
    est = quantile_estimate(merged, [], "v", [0.5]).collect()[0].q50
    s = merged.count()
    # true median of v is ~4999.5; rank error 4 sigma
    sigma = (0.25 / s) ** 0.5
    assert abs(est - 4999.5) <= 4 * sigma * 10_000 + 1


def test_hll_overlap_matrix_accuracy(spark):
    from med_doi_feature_extraction_spark.operators.sketches import (
        hll_build,
        hll_overlap,
    )

    # planted overlaps: A = 0..4999, B = 2500..7499 (50% of each),
    # C = 100000..100999 (disjoint from both)
    rows = (
        [("A", i) for i in range(5000)]
        + [("B", i) for i in range(2500, 7500)]
        + [("C", i) for i in range(100_000, 101_000)]
    )
    df = spark.createDataFrame(rows, ["grp", "v"])
    regs = hll_build(df, ["grp"], "v", p=10)
    out = {
        (r["ga"], r["gb"]): r for r in hll_overlap(regs, "grp", p=10).collect()
    }
    assert set(out) == {("A", "B"), ("A", "C"), ("B", "C")}
    ab = out[("A", "B")]
    # true: |A∪B| = 7500, |A∩B| = 2500, J = 1/3 — HLL at p=10 is ~±5%,
    # inclusion-exclusion compounds both terms; allow a wide band
    assert abs(ab["est_union"] / 7500 - 1) < 0.1
    assert abs(ab["est_intersect"] / 2500 - 1) < 0.35
    assert 0.2 < ab["jaccard_est"] < 0.5
    # disjoint pairs: intersection clamps near zero
    for pair in (("A", "C"), ("B", "C")):
        r = out[pair]
        assert r["est_intersect"] <= 0.1 * r["est_union"]
        assert r["jaccard_est"] < 0.1
