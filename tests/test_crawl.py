"""Recrawl priority scheduler (operators/crawl.py). DuckDB twin: the
`crawl_priority` contract query (full churn+pagerank+formula
recompute)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_priority_formula_and_null_contracts(spark):
    from med_doi_feature_extraction_spark.operators.crawl import (
        crawl_priority,
    )

    churn = spark.createDataFrame(
        [
            # λ = 0.5/100 changes/sec, age = 200s → p = 1 - e^-1
            (1, 0.5, 100.0, "2024-01-01 00:00:00"),
            (2, None, None, None),            # singleton: undefined churn
            (3, 0.25, 50.0, "2024-01-01 00:03:20"),  # no authority row
        ],
        "node: long, change_rate: double, mean_gap_sec: double,"
        " last_change_ts: string",
    ).withColumn("last_change_ts", F.to_timestamp("last_change_ts"))
    authority = spark.createDataFrame(
        [(1, 0.4), (2, 0.1)], "node: long, rank: double"
    )
    out = {
        r["node"]: r
        for r in crawl_priority(
            churn, authority, as_of="2024-01-01 00:03:20"
        ).collect()
    }
    expect = 0.4 * (1 - math.exp(-(0.5 / 100.0) * 200))
    assert abs(out[1]["priority"] - round(expect, 6)) < 1e-9
    assert out[2]["priority"] is None          # undefined churn stays NULL
    assert out[3]["authority"] == 0.0 and out[3]["priority"] == 0.0


class TestPolitenessBudget:
    DIRS = [
        # host, directive, agent, value
        ("a.com", "crawl-delay", "goodbot", "5"),
        ("a.com", "crawl-delay", "*", "60"),      # loses: wildcard
        ("b.com", "crawl-delay", "*", "2.5"),
        ("b.com", "crawl-delay", "*", "10"),      # same pref: max wins
        ("c.com", "crawl-delay", "badbot", "30"),  # other agent: ignored
        ("d.com", "sitemap", "", "https://d.com/s.xml"),  # not a delay
        ("e.com", "crawl-delay", "*", "junk"),    # unparseable -> default
    ]
    FRONTIER = [
        ("a.com", 86400), ("b.com", 1000), ("c.com", 43200),
        ("d.com", 10), ("e.com", 5), ("f.com", 7 * 86400 + 1),
    ]

    def _run(self, spark, **kw):
        from med_doi_feature_extraction_spark.operators.crawl import (
            politeness_budget,
        )

        f = spark.createDataFrame(self.FRONTIER, "host string, n_urls long")
        d = spark.createDataFrame(
            self.DIRS, "host string, directive string, agent string, value string"
        )
        out = politeness_budget(f, d, agent="goodbot", **kw)
        return {r["host"]: r for r in out.collect()}

    def test_specificity_and_max_tiebreak(self, spark):
        got = self._run(spark)
        assert got["a.com"]["crawl_delay"] == 5.0   # exact beats wildcard
        assert got["b.com"]["crawl_delay"] == 10.0  # conservative max
        assert got["c.com"]["crawl_delay"] == 1.0   # other agent ignored
        assert got["d.com"]["crawl_delay"] == 1.0
        assert got["e.com"]["crawl_delay"] == 1.0   # junk -> default
        assert got["f.com"]["crawl_delay"] == 1.0   # no robots at all

    def test_capacity_and_backlog(self, spark):
        got = self._run(spark)
        a = got["a.com"]
        assert a["daily_capacity"] == 86400 // 5
        assert a["backlog_days"] == 5.0  # 86400 urls * 5 s / 86400
        assert a["feasible"] is True
        assert got["f.com"]["feasible"] is False  # 7d + 1s at 1 s/url
        assert got["d.com"]["feasible"] is True

    def test_horizon_parameter(self, spark):
        got = self._run(spark, horizon_days=5.0)
        assert got["a.com"]["feasible"] is True   # exactly 5 days
        got2 = self._run(spark, horizon_days=4.9)
        assert got2["a.com"]["feasible"] is False

    def test_rejects_bad_default(self, spark):
        import pytest as _pt

        from med_doi_feature_extraction_spark.operators.crawl import (
            politeness_budget,
        )

        f = spark.createDataFrame([("a", 1)], "host string, n_urls long")
        d = spark.createDataFrame(
            [], "host string, directive string, agent string, value string"
        )
        with _pt.raises(ValueError):
            politeness_budget(f, d, default_delay_sec=0)
