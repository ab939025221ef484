"""Vocabulary growth / Heaps-law fit (operators/corpus_stats.py)."""

from __future__ import annotations

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
