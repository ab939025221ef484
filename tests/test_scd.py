"""SCD2 / gaps-and-islands tests (operators/scd.py): brute-force
parity on a seeded change stream, tiling invariants, and the
composition law with the interval join (a PIT lookup against the
collapsed dimension == the as-of answer)."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from med_doi_feature_extraction_spark.operators.ranges import interval_join
from med_doi_feature_extraction_spark.operators.scd import collapse_runs, scd2

EPOCH = dt.datetime(2024, 1, 1)


def _ts(sec: float) -> dt.datetime:
    return EPOCH + dt.timedelta(seconds=sec)


@pytest.fixture(scope="module")
def change_stream(spark):
    """Seeded per-entity snapshot stream with sticky values (runs),
    NULL values, and leading NULLs."""
    rng = random.Random(11)
    rows = []
    rid = 0
    for k in range(6):
        t = 0.0
        val = None if k % 2 == 0 else "v0"
        for _ in range(50):
            t += rng.uniform(1, 600)
            if rng.random() < 0.3:  # change point
                val = rng.choice([None, "v0", "v1", "v2"])
            rows.append((k, rid, _ts(t), val))
            rid += 1
    df = spark.createDataFrame(rows, "k long, rid long, ts timestamp, v string")
    return rows, df


def _brute_runs(rows):
    by_k: dict[int, list] = {}
    for k, rid, ts, v in sorted(rows, key=lambda r: (r[0], r[2], r[1])):
        by_k.setdefault(k, []).append((ts, v))
    runs = []
    for k, seq in by_k.items():
        cur = None
        for ts, v in seq:
            if cur is None or v != cur[1]:
                if cur is not None:
                    runs.append((k, cur[1], cur[0], ts, cur[2]))
                cur = (ts, v, 1)
            else:
                cur = (cur[0], cur[1], cur[2] + 1)
        runs.append((k, cur[1], cur[0], None, cur[2]))
    return sorted(runs, key=lambda r: (r[0], r[2]))


def test_collapse_runs_matches_brute_force(spark, change_stream):
    rows, df = change_stream
    out = collapse_runs(df, "k", "ts", ["v"], tiebreak=["rid"])
    got = sorted(
        ((r.k, r.v, r.valid_from, r.valid_to, r.n_snapshots) for r in out.collect()),
        key=lambda r: (r[0], r[2]),
    )
    assert got == _brute_runs(rows)


def test_runs_tile_the_timeline(spark, change_stream):
    rows, df = change_stream
    out = collapse_runs(df, "k", "ts", ["v"], tiebreak=["rid"]).collect()
    per_k: dict[int, list] = {}
    for r in out:
        per_k.setdefault(r.k, []).append(r)
    n_rows = 0
    for k, runs in per_k.items():
        runs.sort(key=lambda r: r.valid_from)
        firsts = min(ts for kk, _, ts, _ in rows if kk == k)
        assert runs[0].valid_from == firsts
        for a, b in zip(runs, runs[1:]):
            assert a.valid_to == b.valid_from  # no gaps, no overlaps
        assert runs[-1].valid_to is None
        n_rows += sum(r.n_snapshots for r in runs)
    assert n_rows == len(rows)  # every snapshot in exactly one run


def test_scd2_lead_and_end_of_time(spark):
    rows = [(1, _ts(0), "a"), (1, _ts(10), "b")]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v string")
    out = {r.ts: (r.valid_from, r.valid_to)
           for r in scd2(df, "k", "ts", end_of_time="2030-01-01").collect()}
    assert out[_ts(0)] == (_ts(0), _ts(10))
    assert out[_ts(10)] == (_ts(10), dt.datetime(2030, 1, 1))


def test_pit_lookup_composition(spark, change_stream):
    """interval_join(points, collapse_runs(dim)) == the latest
    snapshot value at each point — the materialized form of the as-of
    join, so the two engines must agree."""
    rows, df = change_stream
    dim = collapse_runs(
        df, "k", "ts", ["v"], tiebreak=["rid"], end_of_time="2030-01-01"
    ).select("k", F.col("v").alias("dim_v"), "valid_from", "valid_to")
    rng = random.Random(5)
    points = [(k, i, _ts(rng.uniform(0, 40_000))) for k in range(6) for i in range(40)]
    pts = spark.createDataFrame(points, "k long, pid long, p_ts timestamp")
    joined = interval_join(
        pts, dim, "p_ts", "valid_from", "valid_to", on=["k"], bucket_sec=3600
    )
    got = {(r.k, r.pid): r.dim_v for r in joined.collect()}
    # brute-force as-of
    for k, pid, pts_ in points:
        snaps = sorted(
            ((ts, v) for kk, _, ts, v in rows if kk == k and ts <= pts_),
        )
        expect = snaps[-1][1] if snaps else None
        assert got.get((k, pid)) == expect, (k, pid)
