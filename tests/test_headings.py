"""h1-h6 extraction + outline stack (operators/headings.py)."""

from __future__ import annotations

from med_doi_feature_extraction_spark.operators.headings import (
    extract_headings,
    headings_outline,
)


def _outline(spark, html):
    df = spark.createDataFrame([("u", html)], "url string, html string")
    rows = (
        headings_outline(extract_headings(df)).orderBy("pos").collect()
    )
    return [
        (r["level"], r["heading"], r["parent"], r["path_depth"])
        for r in rows
    ]


class TestExtract:
    def test_markup_entities_case_and_empty(self, spark):
        html = (
            '<H1 id="a">Tom &amp; <b>Jerry</b></H1>'
            "<h3>  spaced\n out  </h3><h2></h2>"
        )
        df = spark.createDataFrame(
            [("u", html)], "url string, html string"
        )
        got = [
            (r["pos"], r["level"], r["heading"])
            for r in extract_headings(df).orderBy("pos").collect()
        ]
        # empty h2 dropped, positions renumbered
        assert got == [(0, 1, "Tom & Jerry"), (1, 3, "spaced out")]


class TestOutlineStack:
    def test_basic_nesting_and_sibling(self, spark):
        got = _outline(
            spark,
            "<h1>T</h1><h2>A</h2><h3>A1</h3><h2>B</h2><h4>B-deep</h4>",
        )
        assert got == [
            (1, "T", None, 1),
            (2, "A", "T", 2),
            (3, "A1", "A", 3),
            (2, "B", "T", 2),
            (4, "B-deep", "B", 3),  # skipped h3: parent is B, depth 3
        ]

    def test_h1_reset_pops_stack(self, spark):
        got = _outline(
            spark, "<h1>One</h1><h2>Old</h2><h1>Two</h1><h3>New</h3>"
        )
        assert got[-1] == (3, "New", "Two", 2)  # Old is popped

    def test_orphan_deep_heading_is_root(self, spark):
        got = _outline(spark, "<h4>Lonely</h4><h2>Later</h2>")
        assert got[0] == (4, "Lonely", None, 1)
        assert got[1] == (2, "Later", None, 1)

    def test_deeper_then_shallower_sibling(self, spark):
        got = _outline(
            spark, "<h1>T</h1><h5>Five</h5><h4>Four</h4><h5>Again</h5>"
        )
        # h4 pops the h5; the new h5 parents to h4
        assert got[2] == (4, "Four", "T", 2)
        assert got[3] == (5, "Again", "Four", 3)

    def test_no_headings_page_empty(self, spark):
        df = spark.createDataFrame(
            [("u", "<p>plain</p>")], "url string, html string"
        )
        assert headings_outline(extract_headings(df)).count() == 0
