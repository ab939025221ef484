"""Byte-identity of HTML→text across the Arrow boundary (north-star
invariant: sha256(spark output) == sha256(pandas oracle) per row)."""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from med_doi_feature_extraction_spark.kernels.html_text import (
    _extract_text_reference,
    extract_text,
    extract_text_series,
)


def _sha(s: str | None) -> str | None:
    return None if s is None else hashlib.sha256(s.encode("utf-8")).hexdigest()


def test_generator_ground_truth(pages_pdf):
    """Kernel recovers the generator's ground-truth text byte-for-byte
    wherever the text column is present."""
    present = pages_pdf[pages_pdf.text.notna()]
    extracted = extract_text_series(present.html)
    assert (extracted == present.text).all()


def test_spark_udf_byte_identical(spark, pages_pdf):
    udf = F.pandas_udf(extract_text_series, T.StringType())
    sdf = spark.createDataFrame(pages_pdf[["url", "warc_ts", "html"]])
    got = sdf.select("url", "warc_ts", udf("html").alias("text_extracted")).toPandas()
    oracle = extract_text_series(pages_pdf.html)
    merged = pages_pdf[["url", "warc_ts"]].copy()
    merged["oracle"] = oracle
    joined = got.merge(merged, on=["url", "warc_ts"], validate="1:1")
    assert len(joined) == len(pages_pdf)
    assert (joined.text_extracted.map(_sha) == joined.oracle.map(_sha)).all()


def test_edge_cases():
    assert extract_text(None) is None
    assert extract_text("") == ""
    assert extract_text(b"<p>a&amp;b</p>") == "a&b"
    assert extract_text("<script>x<p>hidden</p></script><p>ok</p>") == "ok"
    assert extract_text("<p>a<b>b</b>c</p>") == "abc"
    assert extract_text("<p>  a \n b  </p><div>c</div>") == "a b\nc"
    # malformed: never raises; unclosed inline tag contributes nothing,
    # a truncated tag surfaces as literal data (HTMLParser contract)
    assert extract_text("<p>x</p><b>") == "x"
    assert extract_text("<p>x</p><b unclosed") == "x\n<b unclosed"
    assert extract_text(b"\xff\xfe<p>bad utf8</p>") is not None
    # non-ascii round trip from bytes
    assert extract_text("café 中文".encode()) == "café 中文"


def test_fast_matches_reference_on_corpus(pages_pdf):
    """The fast scanner kernel is byte-identical to the stdlib
    HTMLParser reference on the seeded corpus (it also matched all
    60k sf0.1 bench docs and 600k+ adversarial fuzz docs offline)."""
    for h in pages_pdf.html:
        assert extract_text(h) == _extract_text_reference(h)


def test_fast_matches_reference_probe_cases():
    """Probe-derived html.parser recovery rules the scanner must
    replicate exactly (each was a real divergence candidate)."""
    cases = [
        # self-closing raw-text/skip tags must NOT enter cdata/skip
        "<script/>x</script>y", "<style/>x", "<template/>café", "<noscript/>a",
        # bare attr values eat a trailing '/': start tag + cdata mode
        "<script a=b/>x</script>y",
        # unterminated comment: data through first '>' (unescaped), then resume
        "<!-- u&amp;v>A<div>B", "<!-- unterminated", "<!-->",
        # bogus declarations drop through the NEXT '>' even past tags
        "<! u no-gt A<div>B", "<?pi>x", "<? unterminated x", "<!>x",
        # start-tag name may contain '<'; junk tags consume through '>'
        "a<case</pre>b", "<b unclosed <p>x</p>",
        # unterminated quotes: EOF fallback data through first '>'
        '<p a="x rest>Y', '<p a="x rest<div>Y',
        # end-tag tolerance vs bogus-comment asymmetry
        "</ div>a</div>b", "</ div x>a</div>b", "</ 3>a", "</>x", "</ unterminated",
        # cdata close is the STRICT pattern only
        "<script>a</scriptx>b</script>c", "<script>a</ script>b",
        "<script>a</script x>b", "<script>never closed",
        # marked sections: known keywords consume; unknown aborts the rest
        "<![CDATA[ x ]]>y", "<![if x]>y", "<![foo]>y<div>z", "<![CDATA[",
        # entity edges
        "<p>a&amp</p>", "&am x", "&#0;x", "A&ampB", "&#;",
        # misc tolerant forms
        "< div>x", "<3>a", "<a\"b>c", "<div =\"x\">y", "<p //>x", "<div/ >x",
        "<p\x00q>x", "a\x00b<div>c", "<p\x0bq>x",
    ]
    for c in cases:
        assert extract_text(c) == _extract_text_reference(c), repr(c)


def test_fast_matches_reference_fuzz():
    """Seeded differential fuzz (CI-sized slice of the 600k offline
    run): random concatenations of adversarial fragments."""
    import random

    from med_doi_feature_extraction_spark.kernels.html_text import (
        _BLOCK_TAGS,
    )

    rng = random.Random(20260817)
    tags = sorted(_BLOCK_TAGS)[:8] + [
        "b", "span", "script", "style", "noscript", "template", "DIV", "Script",
    ]
    frags = []
    for t in tags:
        frags += [
            f"<{t}>", f"</{t}>", f"<{t}/>", f'<{t} a="v>x" b>', f"</ {t}>",
            f"<{t} unterminated", f"<{t} a=it's>", f"</{t} x>", f"<{t}",
            f"<{t} a=b/>",
        ]
    frags += [
        "text", "a&amp;b", "&#65;", "&amp", "&#;", "<!-- c -->",
        "<!-- unterminated", "<!-->", "<!doctype html>", "<?pi ?>", "</>",
        "< div>", "<", ">", '"', "'", "\n", "\x00", "\xa0", "<!>", "</",
        "mixed<case", "-->", "]]>", "<![CDATA[ x ]]>", "<![foo]>",
        "<![if x]>", '<p a="x rest', "<p a=", "<p =", "<p /", '<div ="x">',
        '<a"b>', "<div/ >", "<p //>", "café", "&#128169;",
    ]
    for _ in range(5000):
        doc = "".join(rng.choice(frags) for _ in range(rng.randint(1, 12)))
        assert extract_text(doc) == _extract_text_reference(doc), repr(doc)


def test_null_handling_series():
    s = pd.Series([b"<p>x</p>", None, "<p>y</p>"])
    out = extract_text_series(s)
    assert out[0] == "x" and out[2] == "y" and out[1] is None
