"""Head-metadata extraction + soft-404 (operators/headmeta.py)."""

from __future__ import annotations

from med_doi_feature_extraction_spark.operators.headmeta import (
    SOFT404_MAX_LEN,
    extract_head_meta,
    generate_head_pages,
    soft404_features,
)


def test_head_meta_unit(spark):
    rows = [
        ("u1", '<head><title>A &amp; B</title>'
               '<meta name="description" content="dsc1">'
               '<link rel="canonical" href="https://x/c1"></head>'),
        # reversed attribute order + single quotes
        ("u2", "<head><title>T2</title>"
               "<meta content='dsc2' name='description'>"
               "<link href='https://x/c2' rel='canonical'></head>"),
        # multiline title, og:title, no description
        ("u3", "<head><title>\n  Multi\n  Line\n</title>"
               "<meta property='og:title' content='OG3'></head>"),
        # uppercase tags (case-insensitive flag)
        ("u4", '<HEAD><TITLE>T4</TITLE>'
               '<META NAME="DESCRIPTION" CONTENT="dsc4"></HEAD>'),
        ("u5", "<head></head>"),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    got = {r.url: r for r in extract_head_meta(df).collect()}
    assert got["u1"].title == "A & B"
    assert got["u1"].meta_description == "dsc1"
    assert got["u1"].canonical_href == "https://x/c1"
    assert got["u1"].has_canonical
    assert got["u2"].meta_description == "dsc2"
    assert got["u2"].canonical_href == "https://x/c2"
    assert got["u3"].title == "Multi Line"
    assert got["u3"].og_title == "OG3"
    assert got["u4"].meta_description == "dsc4"
    assert got["u5"].title == "" and not got["u5"].has_canonical


def test_soft404_semantics(spark):
    rows = [
        ("dead", "<title>404 Not Found</title>", "Sorry, gone."),
        # long article that QUOTES a marker — must stay admitted
        ("quote", "<title>News</title>",
         "The server replied page not found once. " * 20),
        ("fine", "<title>News</title>", "Regular body text here."),
        ("denied", "<title>x</title>", "access denied"),
    ]
    df = spark.createDataFrame(rows, "url string, html string, text string")
    got = {r.url: r for r in soft404_features(df).collect()}
    assert got["dead"].is_soft404 and got["dead"].marker_hit
    assert got["quote"].marker_hit and not got["quote"].is_soft404
    assert got["quote"].text_len >= SOFT404_MAX_LEN
    assert not got["fine"].marker_hit
    assert got["denied"].is_soft404


def test_fixture_strata(spark):
    pdf = generate_head_pages(n=160, seed=3)
    df = spark.createDataFrame(pdf)
    meta = extract_head_meta(df).toPandas()
    assert (meta.title_len > 0).sum() > 100
    assert (meta.meta_description != "").any()
    assert meta.has_canonical.any()
    assert (meta.og_title != "").any()
    # entity titles unescaped
    assert meta.title.str.contains("&", regex=False).any()
    assert not meta.title.str.contains("&amp;", regex=False).any()
    s4 = soft404_features(df).toPandas()
    assert s4.is_soft404.sum() == (pdf.index % 8 == 7).sum()


def test_plan_scan_stage_only(spark):
    pdf = generate_head_pages(n=60, seed=5)
    df = spark.createDataFrame(pdf)
    for op in (extract_head_meta, soft404_features):
        plan = op(df)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "Exchange" not in plan  # no shuffle: per-row battery


def test_canonical_groups(spark):
    from med_doi_feature_extraction_spark.operators.headmeta import (
        canonical_groups,
        generate_head_pages,
    )

    pdf = generate_head_pages(n=120, seed=7)
    meta = extract_head_meta(spark.createDataFrame(pdf))
    g = canonical_groups(meta).toPandas()
    assert g.n_pages.sum() == len(pdf)
    # canonical triples collapse: multi-page groups exist
    assert (g.n_pages > 1).any()
    assert (g.n_self <= g.n_pages).all()
    # representative is a member-min: deterministic
    multi = g[g.n_pages > 1]
    assert (multi.rep_url.str.startswith("https://")).all()
    # pages without canonical are singleton groups keyed on themselves
    single_self = g[(g.n_pages == 1) & (g.canonical_key == g.rep_url)]
    assert len(single_self) > 0


class TestStructuredData:
    def _run(self, spark, html):
        from med_doi_feature_extraction_spark.operators.headmeta import (
            structured_data_census,
        )

        df = spark.createDataFrame(
            [("u", html)], "url string, html string"
        )
        return structured_data_census(df).collect()[0]

    def test_jsonld_multi_block_nested_types(self, spark):
        html = (
            "<script type='application/ld+json'>"
            '{"@type":"Recipe","author":{"@type":"Person"}}</script>'
            '<script type="application/ld+json">{"@type":"Article"}'
            "</script>"
        )
        r = self._run(spark, html)
        assert r["n_jsonld"] == 2
        assert r["jsonld_types"] == "Article,Person,Recipe"
        assert r["has_structured"]

    def test_decoy_script_not_counted(self, spark):
        html = '<script type="text/javascript">\'{"@type":"X"}\'</script>'
        r = self._run(spark, html)
        assert r["n_jsonld"] == 0 and r["jsonld_types"] == ""
        assert not r["has_structured"]

    def test_og_type_both_orders(self, spark):
        a = self._run(spark, '<meta property="og:type" content="article">')
        b = self._run(spark, '<meta content="video" property="og:type">')
        assert a["og_type"] == "article" and b["og_type"] == "video"
        assert a["has_structured"] and b["has_structured"]

    def test_microdata(self, spark):
        html = (
            '<div itemscope itemtype="https://schema.org/Product"></div>'
            '<span itemscope itemtype="https://schema.org/Offer"></span>'
        )
        r = self._run(spark, html)
        assert r["n_itemscope"] == 2
        assert (
            r["microdata_types"]
            == "https://schema.org/Offer,https://schema.org/Product"
        )


class TestCanonicalChains:
    def _run(self, spark, pairs, doublings=4):
        from med_doi_feature_extraction_spark.operators.headmeta import (
            resolve_canonical_chains,
        )

        df = spark.createDataFrame(
            pairs, "url string, canonical_href string"
        )
        return {
            r["url"]: (r["final_target"], r["resolved"])
            for r in resolve_canonical_chains(df, doublings).collect()
        }

    def test_chain_collapses_to_terminal(self, spark):
        got = self._run(
            spark,
            [("a", "b"), ("b", "c"), ("c", ""), ("d", "")],
        )
        assert got["a"] == ("c", True)
        assert got["b"] == ("c", True)
        assert got["c"] == ("c", True)
        assert got["d"] == ("d", True)

    def test_target_outside_crawl_is_fixpoint(self, spark):
        got = self._run(spark, [("a", "https://elsewhere/x")])
        assert got["a"] == ("https://elsewhere/x", True)

    def test_self_canonical_is_fixpoint(self, spark):
        got = self._run(spark, [("a", "a")])
        assert got["a"] == ("a", True)

    def test_two_cycle_marked_unresolved(self, spark):
        got = self._run(spark, [("a", "b"), ("b", "a")])
        # pointer doubling oscillates on a 2-cycle; neither endpoint
        # is a fixpoint -> resolved False for both
        assert got["a"][1] is False and got["b"][1] is False
        assert got["a"][0] in ("a", "b")

    def test_long_chain_within_horizon(self, spark):
        n = 12  # 12 < 2^4
        pairs = [(f"p{i}", f"p{i + 1}") for i in range(n)] + [
            (f"p{n}", "")
        ]
        got = self._run(spark, pairs)
        assert all(v == (f"p{n}", True) for v in got.values())

    def test_rejects_zero_doublings(self, spark):
        from med_doi_feature_extraction_spark.operators.headmeta import (
            resolve_canonical_chains,
        )

        df = spark.createDataFrame(
            [("a", "")], "url string, canonical_href string"
        )
        import pytest as _pt

        with _pt.raises(ValueError):
            resolve_canonical_chains(df, 0)


def test_itemscope_empty_value_serialization(spark):
    from med_doi_feature_extraction_spark.operators.headmeta import (
        structured_data_census,
    )

    df = spark.createDataFrame(
        [("u", '<div itemscope="" itemtype="https://schema.org/X"></div>'
               "<span itemscope></span>")],
        "url string, html string",
    )
    r = structured_data_census(df).collect()[0]
    assert r["n_itemscope"] == 2 and r["has_structured"]


def test_canonical_chain_snapshot_duplicates_collapse(spark):
    from med_doi_feature_extraction_spark.operators.headmeta import (
        resolve_canonical_chains,
    )

    df = spark.createDataFrame(
        [("u1", "u2"), ("u2", "u3"), ("u2", "u3"), ("u3", "")],
        "url string, canonical_href string",
    )
    rows = resolve_canonical_chains(df).collect()
    assert len(rows) == 3  # one row per url, snapshot dup collapsed
    assert all(r["final_target"] == "u3" for r in rows)
