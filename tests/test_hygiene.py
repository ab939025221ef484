"""Crawl hygiene (operators/hygiene.py): unit expectations per trap
class, a python brute-force cross-check, and plan-shape pins."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from med_doi_feature_extraction_spark.operators.hygiene import (
    STRIP_TRACK_RULES,
    generate_crawl_urls,
    param_census,
    strip_tracking,
    tracking_strip,
    trap_features,
)


def py_strip(url: str) -> str:
    u = re.sub(r"#.*$", "", url.lower())
    for pat, java_rep, _, g in STRIP_TRACK_RULES:
        u = re.sub(pat, java_rep.replace("$", "\\"), u, count=0 if g else 1)
    return u


STRIP_CASES = [
    ("https://a.com/x?utm_source=f&id=3", "https://a.com/x?id=3"),
    ("https://a.com/x?id=3&utm_source=f", "https://a.com/x?id=3"),
    ("https://a.com/x?utm_source=f", "https://a.com/x"),
    ("https://a.com/x?gclid=abc&fbclid=def", "https://a.com/x"),
    ("https://a.com/x?a=1&gclid=abc&b=2", "https://a.com/x?a=1&b=2"),
    ("https://a.com/x#frag", "https://a.com/x"),
    ("https://a.com/x?ok=1", "https://a.com/x?ok=1"),
    # utm prefix family, not just the classic five
    ("https://a.com/x?utm_id=9&p=1", "https://a.com/x?p=1"),
]


def test_strip_tracking_unit(spark):
    df = spark.createDataFrame(
        [(u,) for u, _ in STRIP_CASES], "url string"
    ).select("url", strip_tracking(F.col("url")).alias("c"))
    got = {r["url"]: r["c"] for r in df.collect()}
    for url, want in STRIP_CASES:
        assert got[url] == want, url
        assert py_strip(url) == want, url


def test_trap_classes_fire(spark):
    pdf = generate_crawl_urls(n=400, seed=9)
    out = trap_features(spark.createDataFrame(pdf)).toPandas()
    assert out.calendar_path.any()
    assert out.repeat_seg.any()
    assert out.session_param.any()
    assert out.long_numeric.any()
    assert (out.pct_encoded >= 5).any()
    assert (out.depth > 8).any()
    # normal pages (kind 0) must be clean
    clean = out[out.url.str.contains("/section/page-")]
    assert (clean.trap_score == 0).all()
    # trap score is the exact flag sum
    rs = (
        out.repeat_seg.astype(int)
        + out.calendar_path.astype(int)
        + out.long_numeric.astype(int)
        + out.session_param.astype(int)
        + (out.depth > 8).astype(int)
        + (out.n_params > 6).astype(int)
        + (out.pct_encoded >= 5).astype(int)
    )
    assert (out.trap_score == rs).all()


def test_repeat_seg_semantics(spark):
    cases = [
        ("https://a.com/cat/cat/x", True),
        ("https://a.com/cat/x/cat", False),  # non-adjacent
        ("https://a.com/a/b/c", False),
        ("https://a.com/", False),
        ("https://a.com/a//a", True),  # empty seg filtered, a,a adjacent
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = {r.url: r.repeat_seg for r in trap_features(df).collect()}
    for u, want in cases:
        assert got[u] == want, u


def test_param_census(spark):
    pdf = generate_crawl_urls(n=400, seed=9)
    out = param_census(spark.createDataFrame(pdf)).toPandas()
    byk = out.set_index("param")
    assert byk.loc["utm_source"].is_tracking
    assert byk.loc["utm_medium"].is_tracking
    assert not byk.loc["phpsessid"].is_tracking  # session != tracking
    assert not byk.loc["id"].is_tracking
    # every url contributes each of its params exactly once
    n_urls_with_q = pdf.url.str.contains(r"\?").sum()
    assert out.n_urls.max() <= n_urls_with_q


def test_tracking_strip_changed_flag(spark):
    pdf = generate_crawl_urls(n=200, seed=4)
    out = tracking_strip(spark.createDataFrame(pdf)).toPandas()
    changed = out[out.changed]
    assert len(changed) > 0
    assert changed.url.str.contains("utm_").all()
    unchanged = out[~out.changed]
    assert not unchanged.clean_url.str.contains("utm_").any()


def test_plan_no_udf_no_join(spark):
    pdf = generate_crawl_urls(n=100, seed=2)
    df = spark.createDataFrame(pdf)
    for op in (trap_features, tracking_strip):
        plan = op(df)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "Join" not in plan  # pure scan-stage battery
