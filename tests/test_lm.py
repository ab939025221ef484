"""Unigram LM quality scoring: hand-computed probabilities, OOV
floor, smoothing normalizer invariance under pruning, empty docs."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from med_doi_feature_extraction_spark.operators.lm import (
    lm_quality_score,
    oov_logp,
    train_unigram_lm,
)


@pytest.fixture(scope="module")
def ref(spark):
    # corpus: "a a b" + "a c" -> counts a=3 b=1 c=1, total=5, V=3
    return spark.createDataFrame(
        [("r1", "a a b"), ("r2", "a c")], "doc_id string, text string"
    ).cache()


def test_train_hand_computed(ref):
    lm = {r.token: r.logp for r in train_unigram_lm(ref, "text").collect()}
    denom = 5 + 3 + 1
    assert lm["a"] == pytest.approx(math.log(4 / denom))
    assert lm["b"] == pytest.approx(math.log(2 / denom))
    assert lm["c"] == pytest.approx(math.log(2 / denom))


def test_oov_floor_below_every_token(ref):
    lm = train_unigram_lm(ref, "text")
    floor = oov_logp(lm)
    assert floor == pytest.approx(math.log(1 / 9))
    assert all(r.logp > floor for r in lm.collect())


def test_score_hand_computed_and_oov(spark, ref):
    lm = train_unigram_lm(ref, "text")
    docs = spark.createDataFrame(
        [("d1", "a b"), ("d2", "zz zz"), ("d3", "")],
        "doc_id string, text string",
    )
    got = {r.doc_id: r for r in lm_quality_score(docs, lm, "doc_id", "text").collect()}
    denom = 9
    exp_d1 = (math.log(4 / denom) + math.log(2 / denom)) / 2
    assert got["d1"].logp_per_token == pytest.approx(round(exp_d1, 6))
    assert got["d1"].n_tokens == 2
    # all-OOV doc sits exactly on the floor
    assert got["d2"].logp_per_token == pytest.approx(round(math.log(1 / denom), 6))
    # empty doc keeps NULL metrics (a gate must SEE it)
    assert got["d3"].n_tokens is None and got["d3"].logp_per_token is None
    # reference-like text scores strictly better than OOV noise
    assert got["d1"].logp_per_token > got["d2"].logp_per_token
    assert got["d1"].ppl < got["d2"].ppl
    assert got["d1"].ppl == pytest.approx(
        round(math.exp(-got["d1"].logp_per_token), 3)
    )


def test_min_count_prunes_without_renormalizing(ref):
    full = {r.token: r.logp for r in train_unigram_lm(ref, "text").collect()}
    pruned = {
        r.token: r.logp
        for r in train_unigram_lm(ref, "text", min_count=2).collect()
    }
    assert set(pruned) == {"a"}  # b, c are hapax
    assert pruned["a"] == pytest.approx(full["a"])  # same normalizer


def test_oov_logp_empty_lm_raises(spark):
    empty = spark.createDataFrame([("x", "")], "doc_id string, text string")
    with pytest.raises(ValueError):
        oov_logp(train_unigram_lm(empty, "text"))


def test_vocab_shift_hand_computed(spark):
    from med_doi_feature_extraction_spark.operators.lm import (
        corpus_divergence,
        vocab_shift,
    )

    a = spark.createDataFrame([(0, "x x y")], ["doc_id", "text"])
    b = spark.createDataFrame([(1, "x y y z")], ["doc_id", "text"])
    shift = vocab_shift(a, b, "text")
    rows = {r["token"]: r for r in shift.collect()}
    # union vocab V=3; ta=3 → denom 6; tb=4 → denom 7
    assert rows["x"]["c_a"] == 2 and rows["x"]["c_b"] == 1
    assert rows["z"]["c_a"] == 0 and rows["z"]["c_b"] == 1
    assert rows["x"]["logp_a"] == pytest.approx(math.log(3 / 6), abs=1e-6)
    assert rows["x"]["log_ratio"] == pytest.approx(
        math.log((2 / 7) / (3 / 6)), abs=1e-6
    )
    assert rows["z"]["log_ratio"] == pytest.approx(
        math.log((2 / 7) / (1 / 6)), abs=1e-6
    )
    # smoothed p_b over the union vocab sums to exactly 1 → KL terms
    # are a true distribution's contributions
    kl_hand = (
        (2 / 7) * math.log((2 / 7) / (3 / 6))
        + (3 / 7) * math.log((3 / 7) / (2 / 6))
        + (2 / 7) * math.log((2 / 7) / (1 / 6))
    )
    div = corpus_divergence(shift)
    assert div["kl_b_from_a"] == pytest.approx(kl_hand, abs=1e-4)
    assert div["js"] >= 0
    # identical corpora → ~zero everywhere
    same = corpus_divergence(vocab_shift(a, a, "text"))
    assert same["kl_b_from_a"] == pytest.approx(0.0, abs=1e-5)
    assert same["js"] == pytest.approx(0.0, abs=1e-5)


# --------------------------------------------------------------- bigram


@pytest.fixture(scope="module")
def bi_ref(spark):
    # bigrams: "a b" x2, "b c" x1, "a c" x1
    # contexts: c(a·)=3, c(b·)=1
    return spark.createDataFrame(
        [("r1", "a b c"), ("r2", "a b"), ("r3", "a c")],
        "doc_id string, text string",
    ).cache()


def test_train_bigram_hand_computed(bi_ref):
    from med_doi_feature_extraction_spark.operators.lm import train_bigram_lm

    lm = {r.gram: r.logp2 for r in train_bigram_lm(bi_ref, "text").collect()}
    assert lm["a b"] == pytest.approx(math.log(2 / 3))
    assert lm["b c"] == pytest.approx(math.log(1 / 1))
    assert lm["a c"] == pytest.approx(math.log(1 / 3))
    assert set(lm) == {"a b", "b c", "a c"}


def test_bigram_score_backoff_paths(spark, bi_ref):
    from med_doi_feature_extraction_spark.operators.lm import (
        bigram_quality_score,
        train_bigram_lm,
    )

    lm2 = train_bigram_lm(bi_ref, "text")
    lm1 = train_unigram_lm(bi_ref, "text")
    floor = oov_logp(lm1)
    uni = {r.token: r.logp for r in lm1.collect()}
    docs = spark.createDataFrame(
        [
            ("d1", "a b"),    # first tok unigram(a), then seen bigram a b
            ("d2", "c a"),    # unseen transition c->a: ln(.4)+uni(a)
            ("d3", "zz b"),   # OOV first token -> floor; zz->b backoff
            ("d4", ""),       # empty -> NULL metrics
        ],
        "doc_id string, text string",
    )
    out = {
        r.doc_id: r
        for r in bigram_quality_score(docs, lm2, lm1, "doc_id", "text").collect()
    }
    exp_d1 = (uni["a"] + math.log(2 / 3)) / 2
    assert out["d1"].logp_per_token == pytest.approx(exp_d1, abs=1e-6)
    exp_d2 = (uni["c"] + math.log(0.4) + uni["a"]) / 2
    assert out["d2"].logp_per_token == pytest.approx(exp_d2, abs=1e-6)
    exp_d3 = (floor + math.log(0.4) + uni["b"]) / 2
    assert out["d3"].logp_per_token == pytest.approx(exp_d3, abs=1e-6)
    assert out["d4"].logp_per_token is None and out["d4"].n_tokens is None
    assert out["d1"].ppl == pytest.approx(round(math.exp(-round(exp_d1, 6)), 3))


def test_bigram_broadcast_flag_parity(spark, bi_ref):
    from med_doi_feature_extraction_spark.operators.lm import (
        bigram_quality_score,
        train_bigram_lm,
    )

    lm2 = train_bigram_lm(bi_ref, "text")
    lm1 = train_unigram_lm(bi_ref, "text")
    docs = spark.createDataFrame(
        [("d1", "a b c zz"), ("d2", "b a")], "doc_id string, text string"
    )
    a = bigram_quality_score(docs, lm2, lm1, "doc_id", "text", broadcast_bigrams=True)
    b = bigram_quality_score(docs, lm2, lm1, "doc_id", "text", broadcast_bigrams=False)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# ------------------------------------------------------------ js_divergence


def test_js_divergence_identical_corpora_zero(spark):
    from med_doi_feature_extraction_spark.operators.lm import js_divergence

    a = spark.createDataFrame(
        [("the cat sat",), ("a dog ran fast",)], "text string"
    )
    row = js_divergence(a, a, "text").collect()[0]
    assert row["jsd"] == 0.0 and row["jsd_norm"] == 0.0
    assert row["kl_b_from_a"] == 0.0 and row["kl_a_from_b"] == 0.0


def test_js_divergence_symmetric_and_bounded(spark):
    from med_doi_feature_extraction_spark.operators.lm import js_divergence

    a = spark.createDataFrame(
        [("alpha beta gamma",), ("alpha alpha beta",)], "text string"
    )
    b = spark.createDataFrame(
        [("delta epsilon",), ("delta zeta eta theta",)], "text string"
    )
    ab = js_divergence(a, b, "text").collect()[0]
    ba = js_divergence(b, a, "text").collect()[0]
    assert ab["jsd"] == ba["jsd"]
    assert ab["kl_b_from_a"] == ba["kl_a_from_b"]
    assert 0.0 < ab["jsd_norm"] <= 1.0
    # disjoint vocabularies diverge more than a shifted variant of
    # the same corpus (add-one smoothing flattens tiny corpora, so
    # the absolute value stays well below 1 here — the ORDER is the
    # invariant)
    shifted = spark.createDataFrame(
        [("alpha beta gamma",), ("alpha gamma gamma",)], "text string"
    )
    near = js_divergence(a, shifted, "text").collect()[0]
    assert ab["jsd_norm"] > near["jsd_norm"]


def test_js_divergence_matches_float_reference(spark):
    """Nano-quantized sums track the pytest-pinned float summary
    within the documented V*1e-9/2 bias envelope."""
    from med_doi_feature_extraction_spark.operators.lm import (
        corpus_divergence,
        js_divergence,
        vocab_shift,
    )

    a = spark.createDataFrame(
        [(f"tok{i % 7} tok{i % 3} filler",) for i in range(40)],
        "text string",
    )
    b = spark.createDataFrame(
        [(f"tok{i % 5} tok{i % 3} drift",) for i in range(40)],
        "text string",
    )
    row = js_divergence(a, b, "text").collect()[0]
    ref = corpus_divergence(vocab_shift(a, b, "text"))
    # corpus_divergence runs on 6dp-rounded logp columns; tolerance
    # reflects that rounding, not the nano quantization
    assert row["jsd"] == pytest.approx(ref["js"], abs=1e-4)
    assert row["kl_b_from_a"] == pytest.approx(
        ref["kl_b_from_a"], abs=1e-4
    )


def test_js_divergence_counts(spark):
    from med_doi_feature_extraction_spark.operators.lm import js_divergence

    a = spark.createDataFrame([("x y",)], "text string")
    b = spark.createDataFrame([("y z z",)], "text string")
    row = js_divergence(a, b, "text").collect()[0]
    assert row["v"] == 3  # union vocab {x, y, z}
    assert row["total_a"] == 2 and row["total_b"] == 3


class TestCCNetBuckets:
    def _run(self, spark, rows):
        from med_doi_feature_extraction_spark.operators.lm import (
            ccnet_buckets,
            train_unigram_lm,
        )

        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string"
        )
        lm = train_unigram_lm(docs, "text")
        out = ccnet_buckets(docs, lm, "doc_id", "text", "lang")
        return {r["doc_id"]: r for r in out.collect()}

    def test_terciles_by_threshold(self, spark):
        # Nine docs, one lang, strictly increasing ppl (rarer tokens
        # score worse under the corpus's own unigram LM): buckets
        # must split 3/3/3 in ppl order.
        common = "a a a a a a a a a"
        rows = [
            (i, common + " " + " ".join(f"r{i}_{j}" for j in range(i)), "en")
            for i in range(9)
        ]
        got = self._run(spark, rows)
        by_ppl = sorted(got.values(), key=lambda r: r["ppl"])
        assert [r["bucket"] for r in by_ppl] == (
            ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
        )

    def test_ties_share_a_bucket(self, spark):
        # four identical docs + two worse ones: the tied mass crosses
        # the n/3 cutoff together, so head holds all four.
        rows = [(i, "a a a", "en") for i in range(4)] + [
            (4, "zz qq ww", "en"),
            (5, "zz qq vv uu", "en"),
        ]
        got = self._run(spark, rows)
        assert [got[i]["bucket"] for i in range(4)] == ["head"] * 4

    def test_per_language_independent_cuts(self, spark):
        rows = [
            (0, "a a a", "en"),
            (1, "a b b", "en"),
            (2, "a b c z", "en"),
            (10, "x x x", "fr"),
            (11, "x y y", "fr"),
            (12, "x y w v", "fr"),
        ]
        got = self._run(spark, rows)
        for base in (0, 10):
            bks = [got[base + i]["bucket"] for i in range(3)]
            assert bks == ["head", "middle", "tail"]

    def test_empty_doc_is_unscored_and_null_lang_kept(self, spark):
        rows = [(0, "a a", "en"), (1, "", None), (2, "a b", "en")]
        got = self._run(spark, rows)
        assert got[1]["bucket"] == "unscored"
        assert got[1]["lang"] == ""
        assert got[1]["ppl"] is None
        assert len(got) == 3


class TestKneserNey:
    # corpus bigrams: "a b" x2, "b c" x1, "a c" x1
    # c(a·)=3 n1f(a)=2; c(b·)=1 n1f(b)=1
    # continuations: n1b(b)=1, n1b(c)=2; N1+(··)=3
    D = 0.75

    def _model(self, spark, bi_ref):
        from med_doi_feature_extraction_spark.operators.lm import (
            train_kn_bigram_lm,
        )

        bg, cx, co = train_kn_bigram_lm(bi_ref, "text", discount=self.D)
        return (
            {r["gram"]: r["logp"] for r in bg.collect()},
            {r["prev"]: r["log_lambda"] for r in cx.collect()},
            {r["token"]: r["log_pcont"] for r in co.collect()},
        )

    def test_hand_computed_tables(self, spark, bi_ref):
        bg, cx, co = self._model(spark, bi_ref)
        d = self.D
        assert co["b"] == pytest.approx(math.log(1 / 3))
        assert co["c"] == pytest.approx(math.log(2 / 3))
        assert cx["a"] == pytest.approx(math.log(d * 2 / 3))
        assert cx["b"] == pytest.approx(math.log(d * 1 / 1))
        assert bg["a b"] == pytest.approx(
            math.log((2 - d) / 3 + d * 2 / 3 * (1 / 3))
        )
        assert bg["b c"] == pytest.approx(
            math.log((1 - d) / 1 + d * 1 / 1 * (2 / 3))
        )
        assert bg["a c"] == pytest.approx(
            math.log((1 - d) / 3 + d * 2 / 3 * (2 / 3))
        )

    def test_probabilities_normalize_per_context(self, spark, bi_ref):
        # sum over seen continuations + lambda mass on unseen = 1:
        # for context a: P(b|a) + P(c|a) + lambda(a)*(mass of tokens
        # never following a under P_cont) -- with full vocab {b, c}
        # both follow a, so P(b|a) + P(c|a) = 1 exactly
        bg, cx, co = self._model(spark, bi_ref)
        total = math.exp(bg["a b"]) + math.exp(bg["a c"])
        assert total == pytest.approx(1.0, abs=1e-12)

    def test_scoring_paths(self, spark, bi_ref):
        from med_doi_feature_extraction_spark.operators.lm import (
            kn_quality_score,
            train_kn_bigram_lm,
        )

        bg, cx, co = train_kn_bigram_lm(bi_ref, "text", discount=self.D)
        docs = spark.createDataFrame(
            [
                (1, "a b"),     # first-token cont + seen bigram
                (2, "b a"),     # seen context b, unseen bigram "b a":
                                # lambda(b) + pcont(a)->floor (a never
                                # a continuation)
                (3, "zz c"),    # unseen first token -> floor; unseen
                                # context -> pcont(c)
                (4, ""),        # empty -> NULLs
            ],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: r
            for r in kn_quality_score(
                docs, bg, cx, co, "doc_id", "text"
            ).collect()
        }
        d = self.D
        floor = math.log(1 / 3)  # |conts|=2 -> ln(1/(2+1))
        s1 = (math.log(1 / 3) + math.log((2 - d) / 3 + d * 2 / 3 / 3)) / 2
        assert got[1]["logp_per_token"] == pytest.approx(
            round(s1, 6), abs=1e-6
        )
        s2 = (math.log(1 / 3) + (math.log(d) + floor)) / 2
        assert got[2]["logp_per_token"] == pytest.approx(
            round(s2, 6), abs=1e-6
        )
        s3 = (floor + math.log(2 / 3)) / 2
        assert got[3]["logp_per_token"] == pytest.approx(
            round(s3, 6), abs=1e-6
        )
        assert got[4]["ppl"] is None

    def test_rejects_bad_discount(self, spark, bi_ref):
        from med_doi_feature_extraction_spark.operators.lm import (
            train_kn_bigram_lm,
        )

        with pytest.raises(ValueError):
            train_kn_bigram_lm(bi_ref, "text", discount=1.0)
