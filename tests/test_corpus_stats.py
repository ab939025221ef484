"""Vocabulary growth / Heaps-law and Zipf-MLE fits
(operators/corpus_stats.py)."""

from __future__ import annotations

import pytest

# --------------------------------------------------------------- vocab_growth


class TestVocabGrowth:
    def _run(self, spark, rows):
        from med_doi_feature_extraction_spark.operators.corpus_stats import (
            vocab_growth,
        )

        df = spark.createDataFrame(rows, "bucket long, text string")
        return vocab_growth(df, "bucket", "text").collect()

    def test_hand_computed_curve(self, spark):
        rows = [
            (0, "a b c"),
            (0, "a b"),
            (1, "a d"),       # one new type: d
            (2, "e f a a"),   # two new: e, f
        ]
        out = self._run(spark, rows)
        assert [r["bucket"] for r in out] == [0, 1, 2]
        assert [r["new_types"] for r in out] == [3, 1, 2]
        assert [r["cum_types"] for r in out] == [3, 4, 6]
        assert [r["cum_tokens"] for r in out] == [5, 7, 11]
        assert out[0]["n_docs"] == 2

    def test_type_counted_at_first_bucket_only(self, spark):
        rows = [(0, "x"), (1, "x x x"), (2, "x")]
        out = self._run(spark, rows)
        assert [r["new_types"] for r in out] == [1, 0, 0]
        assert out[-1]["cum_types"] == 1

    def test_heaps_beta_on_synthetic_powerlaw(self, spark):
        """V = N^0.5 exactly -> fitted beta ~ 0.5."""
        import math

        rows = []
        # craft buckets where cum_types ~ sqrt(cum_tokens):
        # bucket k adds (2k+1) brand-new types as singleton tokens
        # plus filler repeats of type 't0' to make cum_tokens = (k+1)^4
        tok = 0
        cumtok = 0
        for k in range(8):
            new = []
            for _ in range(2 * k + 1):
                new.append(f"n{tok}")
                tok += 1
            target = (k + 1) ** 4
            filler = target - cumtok - len(new)
            cumtok = target
            words = new + ["t0"] * (filler - (1 if k == 0 else 0))
            if k == 0:
                words.append("t0")
            rows.append((k, " ".join(words)))
        out = self._run(spark, rows)
        # cum_types = (k+1)^2 (+1 for t0), cum_tokens = (k+1)^4
        beta = out[0]["heaps_beta"]
        assert 0.45 < beta < 0.55

    def test_degenerate_single_bucket_null_fit(self, spark):
        out = self._run(spark, [(0, "a b c")])
        assert out[0]["heaps_beta"] is None


# ------------------------------------------------------------------ zipf_fit


class TestZipfFit:
    def _run(self, spark, rows, **kw):
        from med_doi_feature_extraction_spark.operators.corpus_stats import (
            zipf_fit,
        )

        df = spark.createDataFrame(rows, "lang string, text string")
        return {
            r["group"]: r
            for r in zipf_fit(df, "text", group_col="lang", **kw).collect()
        }

    def test_matches_hand_mle(self, spark):
        import math as m

        # freqs: a=4, b=2, c=1 -> tail (fmin=2) = {a:4, b:2}
        rows = [("en", "a a a a b b c")]
        got = self._run(spark, rows)["en"]
        s = int(m.floor(m.log(4 / 1.5) * 1e6 + 0.5)) + int(
            m.floor(m.log(2 / 1.5) * 1e6 + 0.5)
        )
        want = 1.0 + 2 / (s / 1e6)
        assert got["n_types"] == 3 and got["tail_types"] == 2
        assert got["n_tokens"] == 7
        assert got["zipf_alpha"] == pytest.approx(want, abs=2e-6)

    def test_heavier_tail_lower_alpha(self, spark):
        # all types at fmin = fastest possible decay = max alpha;
        # a fat head of very frequent types pulls alpha down
        fast = [("f", " ".join(f"w{i} w{i}" for i in range(50)))]
        fat = [("s", "x " * 200 + " ".join(f"w{i} w{i}" for i in range(5)))]
        a_fast = self._run(spark, fast)["f"]["zipf_alpha"]
        a_fat = self._run(spark, fat)["s"]["zipf_alpha"]
        assert a_fat < a_fast
        assert a_fast == pytest.approx(1 + 1 / __import__("math").log(2 / 1.5), abs=1e-5)

    def test_no_tail_gives_null(self, spark):
        got = self._run(spark, [("en", "each word appears once only")])
        assert got["en"]["zipf_alpha"] is None
        assert got["en"]["tail_types"] == 0

    def test_rejects_fmin_below_two(self, spark):
        from med_doi_feature_extraction_spark.operators.corpus_stats import (
            zipf_fit,
        )

        df = spark.createDataFrame([("en", "a a")], "lang string, text string")
        with pytest.raises(ValueError):
            zipf_fit(df, "text", group_col="lang", fmin=1)
