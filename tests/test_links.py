"""Outlink extraction + anchor aggregation (operators/links.py).

Pins the documented extraction contract: resolution classes, drop
kinds, fragment strip, entity unescape order, and the host-level edge
table consumed by graph.pagerank. Also pins that the pages generator's
default rng stream is unchanged when link injection is off (golden
stability guard for every fixture seeded before link_frac existed).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from med_doi_feature_extraction_spark.operators.links import (
    anchor_stats,
    extract_links,
    link_edges,
)
from med_doi_feature_extraction_spark.sources.pages import generate_pages


def _links_df(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


def test_resolution_classes(spark):
    rows = [
        ("https://a.com/x", '<a href="https://b.com/p#frag">B</a>'),
        ("https://a.com/x", '<a href="//c.com/q">C</a>'),
        ("https://a.com/x", '<a href="/local">L</a>'),
        ("https://a.com/x", '<a href="mailto:z@b.com">M</a>'),
        ("https://a.com/x", '<a href="javascript:void(0)">J</a>'),
        ("https://a.com/x", '<a href="rel/path.html">R</a>'),
        ("https://a.com/x", '<a href="#top">F</a>'),
        ("https://a.com/x", '<a href="https://b.com/n"><b>nested</b></a>'),
    ]
    out = {
        r["dst"]: r["anchor"]
        for r in extract_links(_links_df(spark, rows)).collect()
    }
    # fragment stripped; protocol-relative takes src scheme; root-relative
    # takes src origin; mailto/javascript/path-relative/bare-fragment and
    # nested-markup anchors dropped
    assert out == {
        "https://b.com/p": "B",
        "https://c.com/q": "C",
        "https://a.com/local": "L",
    }


def test_entity_unescape_order_and_trim(spark):
    rows = [
        ("https://a.com/", '<a href="/p">  &amp;lt; &quot;x&#x27;  </a>'),
    ]
    (row,) = extract_links(_links_df(spark, rows)).collect()
    # &amp; last: &amp;lt; -> the literal "&lt;" the author wrote
    assert row["anchor"] == "&lt; \"x'"


def test_anchor_stats_and_edges(spark):
    rows = [
        ("https://a.com/1", '<a href="https://t.com/p">zz</a>'),
        ("https://a.com/2", '<a href="https://t.com/p">aa</a>'),
        ("https://b.com/1", '<a href="https://t.com/p"> </a>'),
        ("https://t.com/1", '<a href="https://t.com/p">self</a>'),
    ]
    links = extract_links(_links_df(spark, rows))
    (s,) = anchor_stats(links).filter(F.col("dst") == "https://t.com/p").collect()
    assert (s["in_links"], s["n_src"], s["n_src_hosts"]) == (4, 4, 3)
    # deterministic representative anchor = lexicographic min of non-empty
    assert s["top_anchor"] == "aa"
    edges = {(r["src"], r["dst"]): r["weight"] for r in link_edges(links).collect()}
    # t.com -> t.com self-loop dropped; a.com weight folds both pages
    assert edges == {("a.com", "t.com"): 2, ("b.com", "t.com"): 1}


def test_generator_default_stream_unchanged():
    # link_frac=0.0 must draw NOTHING extra from the rng: byte-identical
    # to the pre-link generator output (golden stability guard).
    a = generate_pages(n_urls=10, seed=5, max_snapshots=2)
    b = generate_pages(n_urls=10, seed=5, max_snapshots=2, link_frac=0.0)
    assert a.equals(b)
    c = generate_pages(n_urls=10, seed=5, max_snapshots=2, link_frac=0.8)
    assert (c["html"].apply(lambda h: b"<a href=" in h)).any()


def test_extracted_text_unaffected_by_links(spark):
    # anchor word stays in extracted text: byte-identity contract holds
    generate_pages(n_urls=6, seed=9, max_snapshots=2, link_frac=0.9, validate=True)


def test_reciprocal_links_brute(spark):
    from med_doi_feature_extraction_spark.operators.links import (
        link_reciprocity,
        reciprocal_links,
    )

    edges = spark.createDataFrame(
        [
            ("a", "b", 3), ("b", "a", 1),          # reciprocal pair
            ("a", "c", 2),                          # one-way
            ("c", "d", 1), ("d", "c", 5),           # reciprocal pair
            ("e", "a", 4),                          # one-way into a
        ],
        "src string, dst string, weight long",
    )
    rec = {
        (r.host_a, r.host_b): (r.w_ab, r.w_ba)
        for r in reciprocal_links(edges).collect()
    }
    assert rec == {("a", "b"): (3, 1), ("c", "d"): (1, 5)}
    per = {r.host: r for r in link_reciprocity(edges).collect()}
    assert per["a"].out_deg == 2 and per["a"].in_deg == 2
    assert per["a"].n_reciprocal == 1
    assert abs(per["a"].reciprocity - 0.5) < 1e-12
    assert per["e"].out_deg == 1 and per["e"].n_reciprocal == 0
    # sink-only host appears with out_deg 0 via the full-outer union
    assert per["b"].in_deg == 1 and per["b"].out_deg == 1


def test_reciprocity_on_fixture(spark):
    from med_doi_feature_extraction_spark.operators.links import (
        extract_links,
        link_edges,
        link_reciprocity,
    )
    from med_doi_feature_extraction_spark.sources.pages import (
        generate_pages,
    )
    from pyspark.sql import functions as F

    pdf = generate_pages(n_urls=120, seed=77, max_snapshots=3, link_frac=0.7)
    pages = spark.createDataFrame(pdf).select(
        "url", F.col("html").cast("string").alias("html_str")
    )
    edges = link_edges(extract_links(pages, html_col="html_str"))
    per = link_reciprocity(edges).toPandas()
    assert (per.n_reciprocal <= per.out_deg).all()
    assert ((per.reciprocity >= 0) & (per.reciprocity <= 1)).all()
    assert per.n_reciprocal.sum() > 0  # 8-host fixture cross-links


def test_outlink_profile_brute(spark):
    from med_doi_feature_extraction_spark.operators.links import (
        outlink_profile,
    )

    links = spark.createDataFrame(
        [
            # page A on host a.com: 3 ext to b.com, 1 ext to c.com, 1 internal
            ("https://a.com/p", "https://b.com/1", ""),
            ("https://a.com/p", "https://b.com/2", ""),
            ("https://a.com/p", "https://b.com/3", ""),
            ("https://a.com/p", "https://c.com/1", ""),
            ("https://a.com/p", "https://a.com/other", ""),
            # page B: internal only
            ("https://d.com/q", "https://d.com/z", ""),
        ],
        "src string, dst string, anchor string",
    )
    got = {r.src: r for r in outlink_profile(links).collect()}
    a = got["https://a.com/p"]
    assert a.n_out == 5 and a.n_ext == 4 and a.n_hosts == 3
    assert abs(a.ext_ratio - 0.8) < 1e-9
    assert abs(a.top_ext_share - 0.75) < 1e-9  # 3 of 4 ext to b.com
    b = got["https://d.com/q"]
    assert b.n_ext == 0 and b.ext_ratio == 0.0 and b.top_ext_share == 0.0


def test_anchor_expansion(spark):
    from med_doi_feature_extraction_spark.operators.links import (
        anchor_expansion,
    )

    links = spark.createDataFrame(
        [("s1", "t1", "zebra"), ("s2", "t1", "apple"), ("s3", "t1", "apple"),
         ("s4", "t1", ""), ("s5", "t2", "")]
        + [(f"s{i}", "hot", f"w{i:02d}") for i in range(10)],
        "src string, dst string, anchor string",
    )
    got = {r.dst: r for r in anchor_expansion(links, k=5).collect()}
    assert got["t1"].anchor_text == "apple | zebra"  # distinct + sorted
    assert got["t1"].n_anchors == 2
    assert "t2" not in got  # empty-anchor-only target dropped
    hot = got["hot"]
    assert hot.n_anchors == 5  # capped
    assert hot.anchor_text == "w00 | w01 | w02 | w03 | w04"


def test_subdomain_census(spark):
    from med_doi_feature_extraction_spark.operators.hygiene import (
        generate_subdomain_urls,
    )
    from med_doi_feature_extraction_spark.operators.urls import (
        subdomain_census,
    )

    df = spark.createDataFrame(generate_subdomain_urls())
    out = {r.domain: r for r in subdomain_census(df).collect()}
    assert len(out) == 8
    for d in range(3):  # farms: 80 hosts, explosion rate high
        r = out[f"farm{d}-net.org"]
        assert r.n_hosts == 80
        assert r.hosts_per_100_urls > 50
    r0 = out["legit0-site.com"]
    assert r0.n_hosts <= 3 and r0.hosts_per_100_urls < 10
    # multi-label public suffix keeps the brand as the registrable key
    assert "brand.co.uk" in out and out["brand.co.uk"].n_hosts == 2


class TestLinkChurn:
    def _run(self, spark, rows):
        from med_doi_feature_extraction_spark.operators.links import (
            link_churn,
        )

        df = spark.createDataFrame(
            rows, "src string, warc_ts string, dst string"
        )
        return {
            (r["src"], r["ts"]): r for r in link_churn(df).collect()
        }

    def test_added_removed_kept(self, spark):
        rows = [
            ("p", "t1", "a"), ("p", "t1", "b"), ("p", "t1", "b"),  # dup
            ("p", "t2", "b"), ("p", "t2", "c"), ("p", "t2", "d"),
            ("q", "t1", "x"),
        ]
        got = self._run(spark, rows)
        first = got[("p", "t1")]
        assert first["n_links"] == 2  # dup collapsed
        assert first["n_added"] is None and first["churn_rate"] is None
        second = got[("p", "t2")]
        assert (second["n_added"], second["n_removed"], second["n_kept"]) \
            == (2, 1, 1)
        # union = {a,b,c,d} -> (2+1)/4
        assert second["churn_rate"] == 0.75
        assert got[("q", "t1")]["n_links"] == 1

    def test_static_page_zero_churn(self, spark):
        rows = [
            ("p", "t1", "a"), ("p", "t2", "a"), ("p", "t3", "a"),
        ]
        got = self._run(spark, rows)
        assert got[("p", "t2")]["churn_rate"] == 0.0
        assert got[("p", "t3")]["n_kept"] == 1

    def test_full_rewrite(self, spark):
        rows = [("p", "t1", "a"), ("p", "t2", "b")]
        got = self._run(spark, rows)
        r = got[("p", "t2")]
        assert r["churn_rate"] == 1.0
        assert (r["n_added"], r["n_removed"], r["n_kept"]) == (1, 1, 0)
