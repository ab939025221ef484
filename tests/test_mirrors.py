"""Mirror-site detection (operators/mirrors.py): normalization
grouping, hot-hash cap, pair metrics, planted-structure recovery."""

from __future__ import annotations

import pytest

from med_doi_feature_extraction_spark.operators.mirrors import (
    generate_mirror_pages,
    mirror_candidates,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "url string, text string")


class TestMirrorCandidates:
    def test_normalization_collapses_ws_and_case(self, spark):
        rows = [
            ("https://a.com/1", "Hello   World"),
            ("https://b.com/1", "  hello world "),
            ("https://a.com/2", "second shared doc"),
            ("https://b.com/2", "SECOND SHARED DOC"),
        ]
        (r,) = mirror_candidates(_df(spark, rows), min_shared=2).collect()
        assert (r["host_a"], r["host_b"]) == ("a.com", "b.com")
        assert r["n_shared"] == 2 and r["containment"] == 1.0
        assert r["jaccard"] == 1.0

    def test_hot_hash_excluded_from_pairs(self, spark):
        # boilerplate on 5 hosts > hot_cap=4 -> contributes nothing
        rows = [(f"https://h{i}.com/e", "parked page") for i in range(5)]
        rows += [
            ("https://h0.com/x", "real shared doc one"),
            ("https://h1.com/x", "real shared doc one"),
            ("https://h0.com/y", "real shared doc two"),
            ("https://h1.com/y", "real shared doc two"),
        ]
        out = mirror_candidates(
            _df(spark, rows), min_shared=1, hot_cap=4
        ).collect()
        assert len(out) == 1
        (r,) = out
        assert r["n_shared"] == 2  # parked page not counted
        # but sizes count the parked page: each host has 3 docs
        assert r["n_a"] == 3 and r["n_b"] == 3
        assert r["containment"] == pytest.approx(2 / 3, abs=1e-6)
        assert r["jaccard"] == pytest.approx(2 / 4, abs=1e-6)

    def test_min_shared_threshold(self, spark):
        rows = [
            ("https://a.com/1", "only one shared"),
            ("https://b.com/1", "only one shared"),
            ("https://a.com/2", "a unique"),
            ("https://b.com/2", "b unique"),
        ]
        assert mirror_candidates(_df(spark, rows), min_shared=2).count() == 0
        assert mirror_candidates(_df(spark, rows), min_shared=1).count() == 1

    def test_planted_fixture_recovered(self, spark):
        df = spark.createDataFrame(generate_mirror_pages())
        out = mirror_candidates(df, hot_cap=16).collect()
        pairs = {(r["host_a"], r["host_b"]) for r in out}
        assert pairs == {
            (f"m{i}a.example.com", f"m{i}b.example.com") for i in range(12)
        }
        for r in out:
            assert r["containment"] > 0.7
            assert r["n_shared"] == 16  # 20 docs, 80% mirrored

    def test_rejects_bad_args(self, spark):
        df = _df(spark, [("https://a.com/1", "x")])
        with pytest.raises(ValueError):
            mirror_candidates(df, min_shared=0)
        with pytest.raises(ValueError):
            mirror_candidates(df, hot_cap=1)
