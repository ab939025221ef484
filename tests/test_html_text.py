"""Byte-identity of HTML→text across the Arrow boundary (north-star
invariant: sha256(spark output) == sha256(pandas oracle) per row)."""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from med_doi_feature_extraction_spark.kernels.html_text import (
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


def test_null_handling_series():
    s = pd.Series([b"<p>x</p>", None, "<p>y</p>"])
    out = extract_text_series(s)
    assert out[0] == "x" and out[2] == "y" and out[1] is None
