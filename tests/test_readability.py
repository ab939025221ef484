"""Readability battery (operators/readability.py): exact stats vs a
pure-Python reference, hand-checked goldens, null/empty discipline,
and gate-bound semantics."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from med_doi_feature_extraction_spark.operators.readability import (
    DEFAULT_BOUNDS,
    readability_features,
    readability_gate,
)


def _py_ref(text):
    t = text or ""
    words = re.findall(r"[A-Za-z]+", t)
    n_words = len(words)
    n_sent = max(len(re.findall(r"[.!?]+", t)), 1)
    n_syll = sum(
        max(len(re.findall(r"[aeiouy]+", w.lower())), 1) for w in words
    )
    if n_words == 0:
        return dict(
            n_words=0, n_sentences=n_sent, n_syllables=0,
            words_per_sentence=None, syllables_per_word=None,
            mean_word_len=None, long_word_frac=None,
            type_token_ratio=None, flesch=None, fk_grade=None,
        )

    def r4(x):
        # the module's portable round: the IDENTICAL IEEE sequence
        # the Spark/DuckDB expressions execute (+ 0.0 kills -0.0)
        m = math.floor(abs(x) * 10000.0 + 0.5) / 10000.0
        return (-m if x < 0 else m) + 0.0

    wps = n_words / n_sent
    spw = n_syll / n_words
    return dict(
        n_words=n_words,
        n_sentences=n_sent,
        n_syllables=n_syll,
        words_per_sentence=r4(wps),
        syllables_per_word=r4(spw),
        mean_word_len=r4(sum(len(w) for w in words) / n_words),
        long_word_frac=r4(
            sum(1 for w in words if len(w) >= 7) / n_words
        ),
        type_token_ratio=r4(
            len({w.lower() for w in words}) / n_words
        ),
        flesch=r4(206.835 - 1.015 * wps - 84.6 * spw),
        fk_grade=r4(0.39 * wps + 11.8 * spw - 15.59),
    )


TEXTS = [
    "The cat sat on the mat.",
    "A complicated, multisyllabic dissertation! Obviously "
    "incomprehensible terminology precedes understanding?",
    "one two three four five six seven eight nine ten. "
    "The quick brown fox jumps over the lazy dog. It works!",
    "",
    None,
    "no sentence punctuation here just words drifting along",
    "Ellipsis... and question?! Mixed!? Bang!!",
    "x",
    "café déjà-vu — only ASCII letter runs count: cafe caf",
]


@pytest.fixture(scope="module")
def feats(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    rows = (
        readability_features(df).orderBy("doc_id").collect()
    )
    return rows


def test_matches_python_reference(feats):
    for row in feats:
        ref = _py_ref(TEXTS[row["doc_id"]])
        for k, v in ref.items():
            got = row[k]
            if v is None:
                assert got is None, (row["doc_id"], k, got)
            elif isinstance(v, float):
                assert got == pytest.approx(v, abs=1e-9), (
                    row["doc_id"], k, got, v,
                )
            else:
                assert got == v, (row["doc_id"], k, got, v)


def test_golden_simple_sentence(feats):
    row = feats[0]  # "The cat sat on the mat."
    assert row["n_words"] == 6
    assert row["n_sentences"] == 1
    assert row["n_syllables"] == 6
    assert row["flesch"] == pytest.approx(116.145)
    assert row["fk_grade"] == pytest.approx(-1.45)
    # "the" repeats: 5 distinct / 6
    assert row["type_token_ratio"] == pytest.approx(0.8333)


def test_empty_and_null(feats):
    for i in (3, 4):
        row = feats[i]
        assert row["n_words"] == 0
        assert row["n_sentences"] == 1  # floored
        assert row["n_syllables"] == 0
        assert row["flesch"] is None
        assert row["type_token_ratio"] is None


def test_syllable_floor_consonant_word(spark):
    # "xyz" has one vowel-group run ("y"); "tsk tsk brr" has none ->
    # floor each word at 1 syllable
    row = (
        readability_features(
            spark.createDataFrame([("tsk brr xyz",)], "text string")
        )
        .collect()[0]
    )
    assert row["n_syllables"] == 3


def test_gate_bounds_and_null_fail(spark):
    df = spark.createDataFrame(
        [
            (0, " ".join(["a readable plain sentence."] * 10)),
            (1, None),
            (2, "short."),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r for r in readability_gate(df).collect()
    }
    assert out[1]["readable"] is False  # null text never passes
    assert out[2]["readable"] is False  # under min_words
    # loosening every bound flips doc 2 (but never the null doc)
    loose = {
        r["doc_id"]: r
        for r in readability_gate(
            df, min_words=1, min_flesch=-1000, max_fk_grade=1000,
            min_ttr=0.0,
        ).collect()
    }
    assert loose[2]["readable"] is True
    assert loose[1]["readable"] is False


def test_gate_checks_rounded_values(spark):
    # ttr of "a a a a b" = 2/5 = 0.4 exactly; bound 0.4 passes,
    # 0.4001 fails - the gate compares the 4-dp-rounded statistic
    df = spark.createDataFrame([("a a a a b.",)], "text string")
    keep = readability_gate(
        df, min_words=1, min_flesch=-1000, max_fk_grade=1000, min_ttr=0.4
    ).collect()[0]
    drop = readability_gate(
        df, min_words=1, min_flesch=-1000, max_fk_grade=1000,
        min_ttr=0.4001,
    ).collect()[0]
    assert keep["readable"] is True and drop["readable"] is False


def test_default_bounds_are_the_module_constants():
    assert set(DEFAULT_BOUNDS) == {
        "min_words", "min_flesch", "max_fk_grade", "min_ttr",
    }


def test_single_codegen_scan_no_shuffle(spark):
    df = spark.createDataFrame([("hello world.",)], "text string")
    plan = (
        readability_features(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_whole_text_counts_match_per_word_reference(spark):
    """The whole-text regex-count rewrite must equal the per-word
    definition on adversarial inputs: all-consonant words, 7-letter
    boundaries, and Unicode letters whose lower() would mint new
    ASCII letters (Kelvin sign, dotted capital I) — the reason the
    syllable counter uses (?i) on the raw text, never lower(text)."""
    import re

    import pandas as pd

    from med_doi_feature_extraction_spark.operators.readability import (
        readability_features,
    )

    texts = [
        "nth rhythm myths b",            # all-consonant words
        "Lengthy seventy-one letters",   # 7-letter boundary words
        "café aéa xKx",   # é splits; K (Kelvin) lowers to 'k'
        "xİx aIIoUY bcd",           # İ lowers to i + combining dot
        "", "   ", None, "...", "A.b?C!d",
    ]
    df = spark.createDataFrame(pd.DataFrame({"text": texts}))
    got = {
        r["text"]: r
        for r in readability_features(df, "text").collect()
    }

    def ref(t):
        t = t or ""
        words = re.findall(r"[A-Za-z]+", t)
        syll = sum(
            max(1, len(re.findall(r"[aeiouy]+", w.lower()))) for w in words
        )
        return (
            len(words),
            syll,
            sum(len(w) for w in words),
            sum(1 for w in words if len(w) >= 7),
        )

    for t in texts:
        r = got[t]
        n_words, syll, tot, longw = ref(t)
        assert r["n_words"] == n_words, t
        assert r["n_syllables"] == syll, t
        if n_words:
            assert abs(r["mean_word_len"] - round(tot / n_words, 4)) < 1e-9, t
            assert (
                abs(r["long_word_frac"] - round(longw / n_words, 4)) < 1e-9
            ), t
