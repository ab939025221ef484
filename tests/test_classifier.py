"""Multinomial NB classifier: hand-computed golden, edge paths,
fixture-corpus sanity.

The golden case pins every arithmetic branch against math.log
by hand: priors, add-one likelihoods, in-vocab-but-unseen-in-class
(NULL pivot cell → class OOV floor via coalesce), true OOV token,
empty document (prior-only scores, predicted = highest prior),
deterministic label-ascending argmax tie-break, and top-two margin.
"""

from __future__ import annotations

import math

import pytest

from med_doi_feature_extraction_spark.operators.classifier import (
    nb_score,
    train_nb,
)


@pytest.fixture(scope="module")
def model_and_scores(spark):
    labeled = spark.createDataFrame(
        [
            (1, "a b", "ham"),
            (2, "a a", "ham"),
            (3, "b c c c", "spam"),
        ],
        "doc_id long, text string, label string",
    )
    model = train_nb(labeled, "text", "label")
    docs = spark.createDataFrame(
        [
            (10, "a c"),       # mixed: each class sees one unseen token
            (11, ""),          # empty: prior-only
            (12, "zzz"),       # pure OOV
            (13, "c c"),       # clear spam
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in nb_score(docs, model, "doc_id", "text").collect()
    }
    return model, out


def test_train_constants(model_and_scores):
    model, _ = model_and_scores
    by_label = {c.label: c for c in model.classes}
    # V=3 shared vocab; T_ham=4, T_spam=4; priors 2/3 vs 1/3
    assert by_label["ham"].prior_logp == pytest.approx(math.log(2 / 3))
    assert by_label["spam"].prior_logp == pytest.approx(math.log(1 / 3))
    assert by_label["ham"].oov_logp == pytest.approx(math.log(1 / 7))
    assert by_label["spam"].oov_logp == pytest.approx(math.log(1 / 7))
    vocab = {r["token"]: r.asDict() for r in model.vocab.collect()}
    assert vocab["a"]["logp_ham"] == pytest.approx(math.log(4 / 7))
    assert vocab["a"]["logp_spam"] is None  # unseen in spam → floor at score time
    assert vocab["b"]["logp_ham"] == pytest.approx(math.log(2 / 7))
    assert vocab["b"]["logp_spam"] == pytest.approx(math.log(2 / 7))
    assert vocab["c"]["logp_spam"] == pytest.approx(math.log(4 / 7))


def test_score_golden(model_and_scores):
    _, out = model_and_scores
    r = out[10]  # "a c" — normalized by n_tokens=2
    want_ham = (math.log(2 / 3) + math.log(4 / 7) + math.log(1 / 7)) / 2
    want_spam = (math.log(1 / 3) + math.log(1 / 7) + math.log(4 / 7)) / 2
    assert r["score_ham"] == pytest.approx(round(want_ham, 6), abs=1e-9)
    assert r["score_spam"] == pytest.approx(round(want_spam, 6), abs=1e-9)
    assert r["predicted"] == "ham"
    assert r["margin"] == pytest.approx(round(math.log(2) / 2, 6), abs=1e-5)
    assert r["n_tokens"] == 2


def test_empty_and_oov(model_and_scores):
    _, out = model_and_scores
    empty = out[11]
    assert empty["n_tokens"] == 0
    assert empty["score_ham"] == pytest.approx(round(math.log(2 / 3), 6))
    assert empty["predicted"] == "ham"  # prior decides
    oov = out[12]
    assert oov["n_tokens"] == 1
    # both floors equal here, so prior decides and margin = prior gap
    assert oov["predicted"] == "ham"
    assert oov["margin"] == pytest.approx(round(math.log(2), 6), abs=1e-5)
    assert oov["score_ham"] == pytest.approx(
        round(math.log(2 / 3) + math.log(1 / 7), 6), abs=1e-9
    )
    spam = out[13]
    assert spam["predicted"] == "spam"


def test_tie_breaks_label_ascending(spark):
    labeled = spark.createDataFrame(
        [(1, "x", "b"), (2, "x", "a")],
        "doc_id long, text string, label string",
    )
    model = train_nb(labeled, "text", "label")
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    [r] = nb_score(docs, model, "doc_id", "text").collect()
    # perfectly symmetric classes: every score ties → smallest label
    assert r["predicted"] == "a"
    assert r["margin"] == 0.0


def test_min_count_prunes_vocab_not_normalizer(spark):
    labeled = spark.createDataFrame(
        [(1, "a a a rare", "x"), (2, "b b b", "y")],
        "doc_id long, text string, label string",
    )
    full = train_nb(labeled, "text", "label")
    pruned = train_nb(labeled, "text", "label", min_count=2)
    toks = {r["token"] for r in pruned.vocab.collect()}
    assert toks == {"a", "b"}
    # constants must not move when hapaxes are pruned
    assert pruned.classes == full.classes
    full_a = {r["token"]: r["logp_x"] for r in full.vocab.collect()}["a"]
    pruned_a = {r["token"]: r["logp_x"] for r in pruned.vocab.collect()}["a"]
    assert pruned_a == pytest.approx(full_a)


def test_heldout_lang_recovery(spark):
    """Trained on the seeded per-language corpus (the lang_trigram
    fixture generator — real cross-language token distributions; the
    driver's documents table deliberately decouples text from its
    lang label, so it can't test recovery), NB must classify a
    disjoint held-out sample well above chance."""
    from pyspark.sql import functions as F

    from med_doi_feature_extraction_spark.kernels.lang_trigram import (
        generate_lang_corpus,
    )

    train = spark.createDataFrame(generate_lang_corpus(800, 1234))
    held_pdf = generate_lang_corpus(400, 5678)
    held = spark.createDataFrame(held_pdf)
    model = train_nb(train, "text", "lang")
    scored = nb_score(held, model, "doc_id", "text").join(
        held.select("doc_id", "lang"), "doc_id"
    )
    n = scored.count()
    ok = scored.filter(F.col("predicted") == F.col("lang")).count()
    assert n == 400
    assert ok / n > 0.9, f"held-out lang accuracy {ok}/{n}"
