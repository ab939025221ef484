"""Gopher word-statistics rules (operators/gopher.py).

The `gopher_rules` contract query hash-checks the whole battery over
the planted corpus; these pin each rule in isolation, the rules the
corpus mix can't reach (bullet fraction, mean word length bounds,
max words), and the bounds-override plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from med_doi_feature_extraction_spark.operators.gopher import (
    DEFAULT_BOUNDS,
    gopher_gate,
    gopher_stats,
)

PROSE = (
    "The results have shown that models trained with better data be"
    " stronger, and that careful filtering of the corpus can have a"
    " large effect on the final quality of the model overall today."
)


def _gate(spark, text, **bounds):
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    return gopher_gate(df, "text", **bounds).first()


def test_clean_prose_keeps(spark):
    r = _gate(spark, PROSE, min_words=20)
    assert r["gopher_keep"] is True and r["fail_reasons"] == []
    assert r["n_stopwords"] >= 5  # the/be/to?/of?/and/that/have/with subset
    assert 3.0 <= r["mean_word_len"] <= 10.0
    assert r["alpha_frac"] == 1.0


def test_bullet_fraction_rule(spark):
    text = "\n".join(["- bullet item here"] * 9 + ["One prose line."])
    r = _gate(spark, text, min_words=1, min_stopwords=0)
    assert r["bullet_frac"] == 0.9
    r2 = _gate(
        spark, text + "\n- one more", min_words=1, min_stopwords=0
    )
    assert r2["bullet_frac"] > 0.9
    assert "bullet_lines" in r2["fail_reasons"]


def test_mean_word_len_bounds(spark):
    short = " ".join(["a b c d"] * 30)  # mean length 1
    r = _gate(spark, short, min_words=1, min_stopwords=0)
    assert r["mean_word_len"] == 1.0
    assert "mean_word_len" in r["fail_reasons"]
    longw = " ".join(["supercalifragilistic"] * 30)  # mean length 20
    r = _gate(spark, longw, min_words=1, min_stopwords=0)
    assert "mean_word_len" in r["fail_reasons"]


def test_word_count_bounds(spark):
    r = _gate(spark, PROSE, max_words=10)
    assert "too_many_words" in r["fail_reasons"]
    r = _gate(spark, "Tiny.", min_stopwords=0)
    assert "too_few_words" in r["fail_reasons"]


def test_symbol_and_ellipsis(spark):
    spam = PROSE + " # # # # # # # # # # # # # # # # # # # #"
    r = _gate(spark, spam, min_words=10)
    assert r["symbol_ratio"] > 0.1
    assert "symbol_ratio" in r["fail_reasons"]
    trail = "\n".join(["It goes on and on..."] * 4 + ["One solid line."])
    r = _gate(spark, trail, min_words=1, min_stopwords=0)
    assert r["ellipsis_frac"] == 0.8
    assert "ellipsis_lines" in r["fail_reasons"]


def test_stopword_and_alpha_rules(spark):
    nums = " ".join(str(i) for i in range(60))
    r = _gate(spark, nums)
    assert r["alpha_frac"] == 0.0 and r["n_stopwords"] == 0
    assert "alpha_words" in r["fail_reasons"]
    assert "stopwords" in r["fail_reasons"]
    # distinct stopword COUNT, not occurrences: 'the the the' counts 1
    r = _gate(spark, "the " * 60, min_words=1)
    assert r["n_stopwords"] == 1
    assert "stopwords" in r["fail_reasons"]


def test_reason_order_and_empty(spark):
    r = _gate(spark, "")
    assert r["n_words"] == 0 and r["mean_word_len"] == 0.0
    # fixed rule order: too_few_words precedes mean_word_len? empty doc
    # fails words + mean bound + alpha + stopwords, in declaration order
    assert r["fail_reasons"] == [
        "too_few_words", "mean_word_len", "alpha_words", "stopwords",
    ]


def test_unknown_bound_rejected(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        gopher_gate(df, "text", min_wordz=5)


def test_stats_match_manual(spark):
    text = "Alpha beta gamma.\n- bullet line\nTrailing away..."
    stats = gopher_stats(F.lit(text))
    row = (
        spark.range(1)
        .select(*(v.alias(k) for k, v in stats.items()))
        .first()
    )
    assert row["n_words"] == 8
    # non-ws chars 41 / 8 words
    assert row["mean_word_len"] == pytest.approx(41 / 8, abs=1e-4)
    assert row["bullet_frac"] == pytest.approx(1 / 3, abs=1e-4)
    assert row["ellipsis_frac"] == pytest.approx(1 / 3, abs=1e-4)
