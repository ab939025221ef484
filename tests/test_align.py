"""CCAligned-style URL alignment (operators/align.py): unit
expectations for strip/detect, a full pandas brute-force cross-check
of align_pairs on the seeded fixture, and plan-shape pins."""

from __future__ import annotations

import re

import pandas as pd
import pytest
from pyspark.sql import functions as F

from med_doi_feature_extraction_spark.operators.align import (
    _DETECT_RULES,
    _STRIP_RULES,
    align_pairs,
    detect_url_lang,
    generate_multilingual_pages,
    strip_lang_url,
    url_lang_profile,
)


def py_strip(url: str) -> str:
    u = re.sub(r"#.*$", "", url.lower())
    for pat, java_rep, _, g in _STRIP_RULES:
        rep = java_rep.replace("$", "\\")
        u = re.sub(pat, rep, u, count=0 if g else 1)
    return u


def py_detect(url: str) -> str:
    u = re.sub(r"#.*$", "", url.lower())
    for pat, grp in _DETECT_RULES:
        m = re.search(pat, u)
        if m and m.group(grp):
            return m.group(grp)
    return ""


CASES = [
    # (url, stripped, lang)
    ("https://site.com/fr/a", "https://site.com/a", "fr"),
    ("https://FR.site.com/a", "https://site.com/a", "fr"),
    ("https://site.com/a_de.html", "https://site.com/a.html", "de"),
    ("https://site.com/a?lang=es&v=1", "https://site.com/a?v=1", "es"),
    ("https://site.com/a?v=1&hl=pt", "https://site.com/a?v=1", "pt"),
    ("https://site.com/a?lang=it", "https://site.com/a", "it"),
    ("https://site.com/about/ru", "https://site.com/about", "ru"),
    ("https://site.com/fr-ca/a", "https://site.com/a", "fr"),
    ("https://site.com/a#en", "https://site.com/a", ""),
    ("https://site.com/page/9", "https://site.com/page/9", ""),
    # subdomain beats path when both present
    ("https://de.site.com/fr/a", "https://site.com/a", "de"),
]


def test_strip_and_detect_unit(spark):
    df = spark.createDataFrame(
        [(u,) for u, _, _ in CASES], "url string"
    ).select(
        "url",
        strip_lang_url(F.col("url")).alias("k"),
        detect_url_lang(F.col("url")).alias("lg"),
    )
    got = {r["url"]: (r["k"], r["lg"]) for r in df.collect()}
    for url, key, lang in CASES:
        assert got[url] == (key, lang), url
    # python reference agrees (same rule tables)
    for url, key, lang in CASES:
        assert py_strip(url) == key, url
        assert py_detect(url) == lang, url


def brute_pairs(pdf: pd.DataFrame, pivot: str = "en") -> set:
    rows = []
    for _, r in pdf.iterrows():
        ul = py_detect(r.url)
        eff = ul if ul else (r.lang or "").lower()
        rows.append((py_strip(r.url), r.url, eff, len(r.text or "")))
    per: dict = {}
    for key, u, eff, tl in rows:
        cur = per.get((key, eff))
        if cur is None or (u, tl) < cur:
            per[(key, eff)] = (u, tl)
    out = set()
    for (key, eff), (u, tl) in per.items():
        if eff != pivot or eff == "":
            continue
        for (k2, e2), (u2, t2) in per.items():
            if k2 == key and e2 != pivot and e2 != "":
                ratio = (
                    round(t2 / tl, 6) if tl > 0 else 0.0
                )
                out.add((key, u, u2, e2, ratio))
    return out


def test_align_pairs_vs_brute(spark):
    pdf = generate_multilingual_pages(n_base=80, seed=5)
    df = spark.createDataFrame(pdf)
    got = {
        (r.align_key, r.src_url, r.tgt_url, r.tgt_lang, r.len_ratio)
        for r in align_pairs(df).collect()
    }
    want = brute_pairs(pdf)
    # compare keys exactly, ratios to 1e-9 (brute uses python round)
    assert {g[:4] for g in got} == {w[:4] for w in want}
    wmap = {w[:4]: w[4] for w in want}
    for g in got:
        assert abs(wmap[g[:4]] - g[4]) < 1e-9, g


def test_align_every_style_fires(spark):
    pdf = generate_multilingual_pages(n_base=100, seed=5)
    df = spark.createDataFrame(pdf)
    out = align_pairs(df).toPandas()
    assert len(out) > 20
    # every URL style must contribute pairs: path, subdomain,
    # suffix, query, final-segment
    keys = out.align_key
    assert keys.str.contains(r"\?v=1").any()          # query style
    assert keys.str.contains(r"\.html$").any()        # suffix style
    assert (out.tgt_lang != "en").all()
    assert (out.len_ratio > 0).all()


def test_url_lang_profile(spark):
    pdf = generate_multilingual_pages(n_base=60, seed=7)
    df = spark.createDataFrame(pdf)
    prof = url_lang_profile(df).toPandas()
    assert int(prof.n.sum()) == len(pdf)
    assert prof.mismatch.any()  # fixture injects ~10% mismatches
    # unmarked URLs land in url_lang = ''
    assert (prof.url_lang == "").any()


def test_plan_shape(spark):
    pdf = generate_multilingual_pages(n_base=40, seed=3)
    df = spark.createDataFrame(pdf)
    plan = align_pairs(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_hreflang_pairs_and_audit(spark):
    from med_doi_feature_extraction_spark.operators.align import (
        generate_hreflang_pages,
        hreflang_audit,
        hreflang_pairs,
    )

    pdf = generate_hreflang_pages(n_clusters=40, seed=9)
    df = spark.createDataFrame(pdf)
    pairs = hreflang_pairs(df).toPandas()
    assert len(pairs) > 50
    # both attribute orders parse: every cluster page declares every
    # cluster lang (minus the broken self-ref stratum)
    assert set(pairs.hreflang) >= {"en", "x-default"}
    # declared alternates point inside the same host
    import re as _re

    hosts_src = pairs.url.map(lambda u: _re.findall(r"://([^/]+)", u)[0])
    hosts_dst = pairs.alt_url.map(
        lambda u: _re.findall(r"://([^/]+)", u)[0]
    )
    assert (hosts_src == hosts_dst).all()
    audit = hreflang_audit(hreflang_pairs(df)).toPandas()
    assert audit.has_xdefault.any()
    assert audit.self_declared.any()
    # broken stratum exists: some pages lack the self-reference
    assert (~audit.self_declared).any()


def test_strip_idempotent_on_fixture(spark):
    """strip(strip(u)) == strip(u) over every fixture URL — stripped
    keys must be stable under re-canonicalization."""
    pdf = generate_multilingual_pages(n_base=60, seed=11)
    for u in pdf.url.unique():
        once = py_strip(u)
        assert py_strip(once) == once, u
