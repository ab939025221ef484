"""Exact repeated-span dedup (k-gram anchors) vs hand-built docs."""

from __future__ import annotations

import pytest

from med_doi_feature_extraction_spark.operators.spans import (
    dedup_spans,
    repeated_gram_stats,
)

SPAN = "a b c d e f g h"  # exactly k=8 tokens

DOCS = [
    (1, f"{SPAN} x y"),                 # owner (min id) — keeps everything
    (2, f"p q {SPAN} r"),               # loses the span, keeps p q r
    (3, "z w v"),                        # no shared grams
    (4, "a b c d e f g extra"),          # only 7 shared tokens: below k
    (5, f"{SPAN} i"),                     # 9-token overlap with doc 6
    (6, f"{SPAN} i tail"),                # two overlapping shared grams
    (7, "   "),                           # all-whitespace doc must survive
]


@pytest.fixture(scope="module")
def span_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_repeated_gram_stats(spark, span_df):
    stats = repeated_gram_stats(span_df, "doc_id", "text", k=8).collect()
    # shared grams: SPAN itself (docs 1,2,5,6) and "b..i" (docs 5,6)
    by_owner = {(r["owner_id"], r["n_docs"]) for r in stats}
    assert (1, 4) in by_owner      # SPAN appears in docs 1,2,5,6
    assert (5, 2) in by_owner      # the b-through-i gram in docs 5,6
    assert len(stats) == 2


def test_dedup_spans_removal_policy(spark, span_df):
    out = {r["doc_id"]: r for r in dedup_spans(span_df, "doc_id", "text", k=8).collect()}
    assert out[1]["clean_text"] == f"{SPAN} x y"          # owner untouched
    assert out[1]["removed_tokens"] == 0
    assert out[2]["clean_text"] == "p q r"
    assert out[2]["removed_tokens"] == 8
    assert out[3]["clean_text"] == "z w v"
    assert out[4]["clean_text"] == "a b c d e f g extra"  # sub-k span kept
    # doc 5 owns the b..i gram but NOT the SPAN gram (owner 1):
    # tokens a..h covered by SPAN; token i covered only by the b..i
    # gram whose owner IS 5 -> kept
    assert out[5]["clean_text"] == "i"
    assert out[5]["removed_tokens"] == 8
    # doc 6 owns nothing: SPAN covers a..h, b..i covers through i;
    # "tail" is outside every shared gram
    assert out[6]["clean_text"] == "tail"
    assert out[6]["removed_tokens"] == 9
    assert out[7]["clean_text"] == "" and out[7]["n_tokens"] == 0


def test_dedup_spans_no_duplicates_noop(spark):
    df = spark.createDataFrame(
        [(1, "one two three four five six seven eight nine")],
        "doc_id long, text string",
    )
    row = dedup_spans(df, "doc_id", "text", k=8).collect()[0]
    assert row["removed_tokens"] == 0
    assert row["clean_text"].startswith("one two")
