"""Sitemap parsing (operators/sitemaps.py)."""

from __future__ import annotations

from med_doi_feature_extraction_spark.operators.sitemaps import (
    generate_sitemaps,
    sitemap_entries,
    sitemap_stats,
)


def test_entries_unit(spark):
    rows = [
        ("s1", '<?xml version="1.0"?><urlset>'
               "<url><loc>https://a.com/p1</loc>"
               "<lastmod>2024-01-02</lastmod></url>"
               "<url><loc>\n  https://a.com/p2 \n</loc></url>"
               "</urlset>"),
        ("s2", "<sitemapindex><sitemap>"
               "<loc>https://a.com/more.xml</loc></sitemap></sitemapindex>"),
        ("s3", "<urlset></urlset>"),
        # uppercase tags, loc attribute noise
        ("s4", "<URLSET><URL><LOC >https://b.com/x</LOC></URL></URLSET>"),
    ]
    df = spark.createDataFrame(rows, "sitemap_url string, xml string")
    got = sitemap_entries(df).collect()
    bym = {}
    for r in got:
        bym.setdefault(r.sitemap_url, []).append(r)
    assert {(r.loc, r.lastmod) for r in bym["s1"]} == {
        ("https://a.com/p1", "2024-01-02"),
        ("https://a.com/p2", ""),
    }
    assert not bym["s1"][0].is_index
    assert bym["s2"][0].loc == "https://a.com/more.xml"
    assert bym["s2"][0].is_index
    assert "s3" not in bym
    assert bym["s4"][0].loc == "https://b.com/x"


def test_fixture_and_stats(spark):
    pdf = generate_sitemaps(n=60, seed=3)
    df = spark.createDataFrame(pdf)
    ents = sitemap_entries(df).toPandas()
    assert ents.is_index.any() and (~ents.is_index).any()
    # whitespace-padded locs must come out trimmed
    assert not ents["loc"].str.contains(r"^\s|\s$", regex=True).any()
    st = sitemap_stats(sitemap_entries(df)).toPandas()
    assert (st.n_entries > 0).all()
    assert (st.n_lastmod <= st.n_entries).all()
    assert (st.n_hosts >= 1).all()
    # index sitemaps recurse: every loc is another .xml
    idx = ents[ents.is_index]
    assert idx["loc"].str.endswith(".xml").all()


def test_plan_no_udf(spark):
    pdf = generate_sitemaps(n=20, seed=1)
    df = spark.createDataFrame(pdf)
    plan = sitemap_entries(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    # xml payload pruned before explode output
    assert "Exchange" not in plan


class TestSitemapCoverage:
    def _run(self, spark, entries, crawled):
        from med_doi_feature_extraction_spark.operators.sitemaps import (
            sitemap_coverage,
        )

        e = spark.createDataFrame(
            entries, "sitemap_url string, loc string, is_index boolean"
        )
        c = spark.createDataFrame([(u,) for u in crawled], "url string")
        return {r["host"]: r for r in sitemap_coverage(e, c).collect()}

    def test_rates_and_outer_hosts(self, spark):
        entries = [
            ("https://a.com/s.xml", "https://a.com/1", False),
            ("https://a.com/s.xml", "https://a.com/2", False),
            ("https://a.com/s.xml", "https://a.com/3", False),
            ("https://a.com/s.xml", "https://a.com/4", False),
            # index entries must NOT count as declared pages
            ("https://a.com/s.xml", "https://a.com/more.xml", True),
            ("https://b.com/s.xml", "https://b.com/x", False),
        ]
        crawled = [
            "https://a.com/1", "https://a.com/2", "https://a.com/3",
            "https://a.com/trap?p=1",           # orphan
            "https://c.com/only-crawled",        # host with no sitemap
        ]
        got = self._run(spark, entries, crawled)
        a = got["a.com"]
        assert (a["n_sitemap"], a["n_crawled"], a["n_both"]) == (4, 4, 3)
        assert a["coverage"] == 0.75
        assert a["orphan_rate"] == 0.25
        b = got["b.com"]
        assert b["n_crawled"] == 0 and b["coverage"] == 0.0
        assert b["orphan_rate"] is None  # nothing crawled: undefined
        c = got["c.com"]
        assert c["n_sitemap"] == 0 and c["coverage"] is None
        assert c["orphan_rate"] == 1.0

    def test_duplicate_declarations_count_once(self, spark):
        entries = [
            ("https://a.com/s1.xml", "https://a.com/p", False),
            ("https://a.com/s2.xml", "https://a.com/p", False),
        ]
        got = self._run(spark, entries, ["https://a.com/p"])
        assert got["a.com"]["n_sitemap"] == 1
        assert got["a.com"]["coverage"] == 1.0
