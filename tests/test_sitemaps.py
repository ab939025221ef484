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
