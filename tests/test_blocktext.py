"""Block-level main-content extraction (operators/blocktext.py):
segmentation, every context-free class branch, the neighbor
resolution pass, and the per-doc rebuild."""

from __future__ import annotations

import pytest

from med_doi_feature_extraction_spark.operators.blocktext import (
    LENGTH_LOW,
    classify_blocks,
    main_content,
    split_blocks,
)

PROSE = (
    "This is the part of the page that a reader actually came for, "
    "and it is written in plain prose with the usual function words "
    "that signal running text to the classifier over many sentences. "
)


def _pages(spark, htmls):
    return spark.createDataFrame(
        [(f"u{i}", h) for i, h in enumerate(htmls)], "url string, html string"
    )


def _blocks(spark, html):
    rows = (
        split_blocks(_pages(spark, [html]))
        .orderBy("pos")
        .collect()
    )
    return rows


class TestSplit:
    def test_scripts_styles_and_empties_dropped(self, spark):
        html = (
            "<html><body><script>var x = 'prose prose';</script>"
            "<style>p { color: red }</style>"
            "<p>first block</p><div></div><p>second block</p></body></html>"
        )
        rows = _blocks(spark, html)
        assert [r["text"] for r in rows] == ["first block", "second block"]
        assert [r["pos"] for r in rows] == [0, 1]  # gaps renumbered

    def test_inline_tags_do_not_split(self, spark):
        rows = _blocks(spark, "<p>one <b>two</b> three</p>")
        assert [r["text"] for r in rows] == ["one two three"]

    def test_link_chars_and_entities(self, spark):
        rows = _blocks(
            spark, '<p>go <a href="/x">here &amp; now</a> ok</p>'
        )
        (r,) = rows
        assert r["text"] == "go here & now ok"
        assert r["link_chars"] == len("here &amp; now")
        assert 0 < r["link_density"] < 1

    def test_word_and_stopword_counts(self, spark):
        (r,) = _blocks(spark, "<p>The cat, the hat!</p>")
        assert r["n_words"] == 4
        assert r["stop_density"] == pytest.approx(0.5)  # the, the


class TestContextFree:
    def _cls(self, spark, html):
        out = classify_blocks(split_blocks(_pages(spark, [html])))
        return [r["cls"] for r in out.orderBy("pos").collect()]

    def test_link_dense_is_bad(self, spark):
        html = '<div><a href="/a">All of this block is anchor text here</a></div>'
        assert self._cls(spark, html) == ["bad"]

    def test_copyright_is_bad(self, spark):
        assert self._cls(spark, f"<p>© {PROSE * 3}</p>") == ["bad"]

    def test_short_plain_vs_short_linked(self, spark):
        plain = "<p>He said it was so.</p>"
        linked = '<p>See <a href="/m">more</a>.</p>'
        assert self._cls(spark, plain) == ["short"]
        assert self._cls(spark, linked) == ["bad"]

    def test_prose_good_and_neargood_by_length(self, spark):
        assert self._cls(spark, f"<p>{PROSE * 3}</p>") == ["good"]
        # stopword-rich but between length_low and length_high
        mid = "<p>It was the best of all the things that he had seen.</p>" \
              .replace("seen.", "seen in the town. " * 3)
        txt = mid[3:-4]
        assert LENGTH_LOW <= len(txt.strip()) <= 200
        assert self._cls(spark, mid) == ["neargood"]

    def test_stuffing_is_bad(self, spark):
        html = "<div>" + "cheap widgets best widgets sale " * 8 + "</div>"
        assert self._cls(spark, html) == ["bad"]


class TestContextSensitive:
    def _final(self, spark, html):
        out = classify_blocks(split_blocks(_pages(spark, [html])))
        return [
            (r["cls"], r["final_cls"])
            for r in out.orderBy("pos").collect()
        ]

    def test_short_between_goods_resolves_good(self, spark):
        html = (
            f"<p>{PROSE * 3}</p><p>He said it was so.</p><p>{PROSE * 3}</p>"
        )
        got = self._final(spark, html)
        assert got[1] == ("short", "good")

    def test_short_at_edge_sees_bad_boundary(self, spark):
        html = f"<p>He said it was so.</p><p>{PROSE * 3}</p>"
        got = self._final(spark, html)
        assert got[0] == ("short", "bad")  # prev boundary is bad

    def test_neargood_one_good_side_resolves_good(self, spark):
        stuffing = "<div>" + "cheap widgets best widgets sale " * 8 + "</div>"
        teaser = (
            "<p>More of the story is told in the next part of the "
            "series about the town and the people in it.</p>"
        )
        html = f"<p>{PROSE * 3}</p>{teaser}{stuffing}"
        got = self._final(spark, html)
        assert got[1] == ("neargood", "good")
        html2 = f"{stuffing}{teaser}{stuffing}"
        got2 = self._final(spark, html2)
        assert got2[1] == ("neargood", "bad")


class TestMainContent:
    def test_rebuild_order_and_ratio(self, spark):
        html = (
            f"<p>{PROSE * 3}Alpha.</p><div>"
            '<a href="/a">nav nav nav nav nav nav</a></div>'
            f"<p>{PROSE * 3}Omega.</p>"
        )
        (row,) = main_content(
            classify_blocks(split_blocks(_pages(spark, [html])))
        ).collect()
        assert row["content"].count("\n") == 1
        first, second = row["content"].split("\n")
        assert first.endswith("Alpha.") and second.endswith("Omega.")
        assert row["n_blocks"] == 3 and row["n_good"] == 2
        assert row["kept_chars"] + 23 == row["total_chars"]
        assert 0.9 < row["kept_ratio"] < 1.0

    def test_all_boilerplate_page_keeps_nothing(self, spark):
        html = '<div><a href="/a">only nav here in this page</a></div>'
        (row,) = main_content(
            classify_blocks(split_blocks(_pages(spark, [html])))
        ).collect()
        assert row["content"] == "" and row["n_good"] == 0
        assert row["kept_ratio"] == 0.0


class TestCompositeKey:
    def test_snapshot_grain_preserved(self, spark):
        html_a = f"<p>{PROSE * 3}Alpha.</p>"
        html_b = '<div><a href="/a">only nav in the later crawl</a></div>'
        df = spark.createDataFrame(
            [("u", "t1", html_a), ("u", "t2", html_b)],
            "url string, warc_ts string, html string",
        )
        out = main_content(
            classify_blocks(
                split_blocks(df, key_cols=("url", "warc_ts"))
            )
        )
        rows = {r["warc_ts"]: r for r in out.collect()}
        assert len(rows) == 2
        assert rows["t1"]["n_good"] == 1 and rows["t2"]["n_good"] == 0
