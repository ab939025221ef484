"""chi²/MI token–label feature selection (operators/featsel.py)."""

from __future__ import annotations

import math
import re

import pytest

from med_doi_feature_extraction_spark.operators.featsel import chi2_tokens

DOCS = [
    # positive class: "spam" vocabulary
    (1, "Buy cheap pills now! Cheap pills cheap deals."),
    (1, "Free money, free pills, click now."),
    (1, "Cheap deals and free money now."),
    (1, "Pills and deals. Click for money."),
    # negative class: "prose" vocabulary
    (0, "The committee reviewed the annual report today."),
    (0, "A quiet morning walk through the park."),
    (0, "The report discussed annual rainfall totals."),
    (0, "She reviewed the quiet park report."),
    (None, "cheap cheap cheap ignored because label is null"),
]


def _ref(min_df=2):
    rows = [(y, t) for y, t in DOCS if y is not None]
    n1 = sum(1 for y, _ in rows if y == 1)
    n0 = len(rows) - n1
    from collections import defaultdict

    pos, neg = defaultdict(int), defaultdict(int)
    for y, t in rows:
        for tok in set(re.findall(r"[a-z]+", t.lower())):
            if y == 1:
                pos[tok] += 1
            else:
                neg[tok] += 1

    def micro(x):
        m = math.floor(abs(x) * 1e6 + 0.5)
        return -m if x < 0 else m

    out = {}
    for tok in set(pos) | set(neg):
        a, b = pos.get(tok, 0), neg.get(tok, 0)
        if a + b < min_df:
            continue
        c, d = n1 - a, n0 - b
        n = float(n1 + n0)
        diff = float(a * d - b * c)
        denom = float(a + b) * float(c + d) * float(a + c) * float(b + d)
        chi2 = n * diff * diff / denom if denom > 0 else 0.0

        def t(cell, rowt, colt):
            if cell <= 0:
                return 0.0
            return cell / n * math.log(n * cell / (float(rowt) * float(colt)))

        mi = (
            t(a, a + b, a + c)
            + t(b, a + b, b + d)
            + t(c, c + d, a + c)
            + t(d, c + d, b + d)
        )
        out[tok] = (a, b, micro(chi2) / 1e6, micro(mi) / 1e6)
    return out


@pytest.fixture(scope="module")
def ranked(spark):
    df = spark.createDataFrame(DOCS, "y int, text string")
    return chi2_tokens(df, "text", "y", top_k=100, min_df=2).collect()


def test_matches_python_reference(ranked):
    ref = _ref()
    got = {r["token"]: r for r in ranked}
    assert set(got) == set(ref)
    for tok, (a, b, chi2, mi) in ref.items():
        r = got[tok]
        assert (r["df_pos"], r["df_neg"]) == (a, b), tok
        assert r["chi2"] == pytest.approx(chi2, abs=1e-12), tok
        assert r["mi"] == pytest.approx(mi, abs=1e-12), tok


def test_discriminative_tokens_rank_first(ranked):
    # perfectly-separating tokens (df 4/0 or 0/4) share the top chi2;
    # every one of them must outrank any mixed token
    top = [r["token"] for r in ranked[:4]]
    assert set(top) <= {
        "the", "cheap", "pills", "now", "money", "deals", "free",
    }
    assert ranked[0]["chi2"] == max(r["chi2"] for r in ranked)


def test_order_is_chi2_desc_then_token_asc(ranked):
    keys = [(-round(r["chi2"] * 1e6), r["token"]) for r in ranked]
    assert keys == sorted(keys)


def test_min_df_prunes(spark):
    df = spark.createDataFrame(DOCS, "y int, text string")
    loose = {
        r["token"]
        for r in chi2_tokens(df, "text", "y", top_k=1000, min_df=1).collect()
    }
    tight = {
        r["token"]
        for r in chi2_tokens(df, "text", "y", top_k=1000, min_df=3).collect()
    }
    assert "walk" in loose and "walk" not in tight  # df = 1
    assert tight < loose


def test_null_labels_dropped(ranked):
    # the null-label doc is pure "cheap" spam; if it leaked in,
    # cheap's df would exceed 2 (docs 1 and 3 only)
    got = {r["token"]: r for r in ranked}
    assert got["cheap"]["df_pos"] + got["cheap"]["df_neg"] == 2


def test_presence_not_counts(ranked):
    # "cheap" appears 3x in doc 1 but counts once per doc
    got = {r["token"]: r for r in ranked}
    assert got["cheap"]["df_pos"] == 2 and got["cheap"]["df_neg"] == 0


def test_no_python_udf_and_take_ordered(spark):
    df = spark.createDataFrame(DOCS, "y int, text string")
    plan = (
        chi2_tokens(df, "text", "y")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan
