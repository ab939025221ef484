"""Wilson-bound quality rollups + markup density
(operators/domainstats.py)."""

from __future__ import annotations

import pytest

import math

from pyspark.sql import functions as F

from med_doi_feature_extraction_spark.operators.domainstats import (
    markup_stats,
    quality_rollup,
)


def py_wilson(k: int, n: int, z: float = 1.96) -> float:
    if n == 0:
        return 0.0
    p = k / n
    zz = z * z
    center = p + zz / (2.0 * n)
    margin = z * math.sqrt((p * (1.0 - p) + zz / (4.0 * n)) / n)
    lb = max((center - margin) / (1.0 + zz / n), 0.0)
    return math.floor(lb * 1e6 + 0.5) / 1e6


def test_wilson_vs_reference(spark):
    rows = []
    cases = [("a", 1, 1), ("b", 979, 1000), ("c", 0, 5), ("d", 50, 100)]
    for g, k, n in cases:
        rows += [(g, 1)] * k + [(g, 0)] * (n - k)
    df = spark.createDataFrame(rows, "grp string, keep int")
    out = {
        r.grp: r
        for r in quality_rollup(df, "grp", F.col("keep") == 1).collect()
    }
    for g, k, n in cases:
        assert out[g].n == n and out[g].n_keep == k
        assert abs(out[g].wilson_lb - py_wilson(k, n)) < 1e-9, g
    # the RANKING property: 979/1000 beats 1/1 despite lower raw rate
    assert out["b"].wilson_lb > out["a"].wilson_lb
    assert out["a"].keep_rate == 1.0 and out["b"].keep_rate < 1.0


def test_markup_stats_unit(spark):
    rows = [
        ("u1",
         "<html><head><script>var x=1;</script><style>.a{}</style>"
         "</head><body><p>hello</p><a href='x'>l</a></body></html>",
         "hello l"),
        ("u2", "", ""),
        ("u3", "<p>plain</p>", "plain"),
    ]
    df = spark.createDataFrame(rows, "url string, html string, text string")
    got = {r.url: r for r in markup_stats(df).collect()}
    u1 = got["u1"]
    assert u1.script_style_bytes == len("<script>var x=1;</script>") + len(
        "<style>.a{}</style>"
    )
    assert u1.n_anchors == 1
    assert u1.text_len == 7
    assert 0 < u1.text_ratio < 1
    assert got["u2"].html_len == 0 and got["u2"].text_ratio == 0.0
    assert got["u3"].n_tags == 2  # <p> and </p>
    assert got["u3"].script_style_bytes == 0


def test_markup_on_fixture(spark):
    from med_doi_feature_extraction_spark.operators.headmeta import (
        generate_head_pages,
    )

    pdf = generate_head_pages(n=100, seed=5)
    out = markup_stats(spark.createDataFrame(pdf)).toPandas()
    assert (out.html_len > out.text_len).all()
    assert ((out.text_ratio > 0) & (out.text_ratio < 1)).all()
    assert (out.n_tags >= 4).all()
    plan = (
        markup_stats(spark.createDataFrame(pdf))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan


class TestTemplateCensus:
    def _run(self, spark, rows):
        from med_doi_feature_extraction_spark.operators.domainstats import (
            template_census,
        )

        df = spark.createDataFrame(rows, "url string, html string")
        return {r["domain"]: r for r in template_census(df).collect()}

    def test_same_layout_different_content_collapses(self, spark):
        t = "<html><body><div><p>{}</p></div></body></html>"
        rows = [
            (f"https://a.farm.com/{i}", t.format(f"article {i}"))
            for i in range(10)
        ] + [
            ("https://b.edit.com/1", "<html><body><p>x</p></body></html>"),
            ("https://b.edit.com/2", "<html><ul><li>y</li></ul></html>"),
        ]
        got = self._run(spark, rows)
        farm, edit = got["farm.com"], got["edit.com"]
        assert farm["n_templates"] == 1 and farm["top_template_share"] == 1.0
        assert farm["pages_per_template"] == 10.0
        assert edit["n_templates"] == 2 and edit["top_template_share"] == 0.5

    def test_attributes_ignored_closing_tags_ignored(self, spark):
        rows = [
            ("https://x.s.com/1", '<div class="a"><p id="z">one</p></div>'),
            ("https://x.s.com/2", "<div><p>two words here</p></div>"),
            ("https://x.s.com/3", "<DIV><P>upper</P></DIV>"),
        ]
        got = self._run(spark, rows)
        assert got["s.com"]["n_templates"] == 1


class TestHostReport:
    def test_rates_and_templates(self, spark):
        from med_doi_feature_extraction_spark.operators.domainstats import (
            host_report,
        )

        t = "<html><head>{}</head><body><p>{}</p></body></html>"
        rows = [
            ("https://a.com/1",
             t.format('<link rel="canonical" href="https://a.com/c">',
                      "long body " * 30), "long body " * 30),
            ("https://a.com/2", t.format("", "tiny"), "tiny"),
            ("https://a.com/3",
             t.format("<title>404 Not Found</title>", "gone"), "gone"),
            ("https://b.com/1", t.format("", "text " * 10), "text " * 10),
        ]
        df = spark.createDataFrame(rows, "url string, html string, text string")
        got = {r["host"]: r for r in host_report(df).collect()}
        a = got["a.com"]
        assert a["n_pages"] == 3
        assert a["canonical_rate"] == pytest.approx(1 / 3, abs=1e-6)
        assert a["soft404_rate"] == pytest.approx(1 / 3, abs=1e-6)
        # head tags differ (link/title) -> three distinct layouts
        assert a["n_templates"] == 3
        assert a["top_template_share"] == pytest.approx(1 / 3, abs=1e-6)
        assert 0 < a["avg_text_ratio"] < 1
        assert got["b.com"]["n_pages"] == 1
