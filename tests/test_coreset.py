"""Greedy k-center coreset selection vs a brute-force numpy greedy."""

from __future__ import annotations

import numpy as np
import pytest

from med_doi_feature_extraction_spark.operators.coreset import (
    kcenter_select,
)


def numpy_kcenter(vecs: dict[int, list[float]], k: int, scale: float):
    """Reference greedy farthest-point on mu-quantized integer vectors:
    seed = min id, then argmax running min-dist2 (ties -> min id)."""
    q = {
        i: np.array(
            [int(np.floor(abs(x) * scale + 0.5)) * int(np.sign(x)) for x in v],
            dtype=np.int64,
        )
        for i, v in vecs.items()
    }
    ids = sorted(q)
    sel = [(0, ids[0], 0)]
    mind = {i: int(((q[i] - q[ids[0]]) ** 2).sum()) for i in ids}
    for r in range(1, k):
        best = max(ids, key=lambda i: (mind[i], -i))
        sel.append((r, best, mind[best]))
        for i in ids:
            d = int(((q[i] - q[best]) ** 2).sum())
            if d < mind[i]:
                mind[i] = d
    return sel


def _run(spark, vecs, k, scale=1e3):
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id long, embedding array<double>",
    )
    out = kcenter_select(df, "vec_id", "embedding", k=k, scale=scale)
    return sorted(
        (r["pick"], r["vec_id"], r["dist2"]) for r in out.collect()
    )


class TestKCenterSelect:
    def test_matches_numpy_greedy(self, spark):
        rng = np.random.default_rng(7)
        vecs = {
            int(i): [float(x) for x in rng.normal(size=6)]
            for i in range(30)
        }
        got = _run(spark, vecs, k=5)
        assert got == numpy_kcenter(vecs, k=5, scale=1e3)

    def test_hand_line_picks_extremes(self, spark):
        # points on a line at 0, 1, 10: seed=id0(at 0), then the
        # farthest is id2 (at 10, dist2=1e8 at scale 1e3), then id1.
        vecs = {0: [0.0], 1: [1.0], 2: [10.0]}
        got = _run(spark, vecs, k=3)
        assert got == [
            (0, 0, 0),
            (1, 2, 100_000_000),
            (2, 1, 1_000_000),
        ]

    def test_tie_breaks_to_smaller_id(self, spark):
        # ids 1 and 2 are equidistant from the seed at id 0.
        vecs = {0: [0.0], 1: [2.0], 2: [-2.0]}
        got = _run(spark, vecs, k=2)
        assert got[1][1] == 1

    def test_k_past_n_repicks_covered(self, spark):
        vecs = {0: [0.0], 1: [3.0]}
        got = _run(spark, vecs, k=3)
        # third pick has nothing uncovered left: dist2 collapses to 0
        assert got[2][2] == 0

    def test_deterministic_across_runs(self, spark):
        rng = np.random.default_rng(11)
        vecs = {
            int(i): [float(x) for x in rng.normal(size=4)]
            for i in range(20)
        }
        assert _run(spark, vecs, k=4) == _run(spark, vecs, k=4)

    def test_rejects_bad_k(self, spark):
        df = spark.createDataFrame(
            [(0, [0.0])], "vec_id long, embedding array<double>"
        )
        with pytest.raises(ValueError):
            kcenter_select(df, "vec_id", "embedding", k=0)
