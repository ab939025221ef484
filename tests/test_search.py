"""Positional phrase search (operators/search.py)."""

from __future__ import annotations

import pytest

from med_doi_feature_extraction_spark.operators.search import (
    phrase_search,
    token_positions,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestTokenPositions:
    def test_positions_align_with_tokenizer(self, spark):
        df = _docs(spark, [(1, "  The Quick  brown fox ")])
        got = sorted(
            (r["pos"], r["token"])
            for r in token_positions(df, "doc_id", "text").collect()
        )
        assert got == [(0, "the"), (1, "quick"), (2, "brown"), (3, "fox")]

    def test_empty_doc_yields_nothing(self, spark):
        df = _docs(spark, [(1, "   "), (2, "")])
        assert token_positions(df, "doc_id", "text").count() == 0


class TestPhraseSearch:
    DOCS = [
        (1, "the quick brown fox jumps"),
        (2, "quick brown shoes and a quick brown hat"),
        (3, "brown quick inverted order"),
        (4, "quick not-adjacent x brown"),
        (5, "QUICK BROWN upper case"),
    ]

    def _run(self, spark, phrase):
        return {
            r["doc"]: (r["n_matches"], r["first_pos"])
            for r in phrase_search(
                _docs(spark, self.DOCS), "doc_id", "text", phrase
            ).collect()
        }

    def test_adjacency_and_case(self, spark):
        got = self._run(spark, "quick brown")
        assert got == {1: (1, 1), 2: (2, 0), 5: (1, 0)}

    def test_overlapping_matches_counted(self, spark):
        df = _docs(spark, [(9, "a a a a")])
        (r,) = phrase_search(df, "doc_id", "text", "a a").collect()
        assert (r["n_matches"], r["first_pos"]) == (3, 0)

    def test_repeated_term_phrase(self, spark):
        df = _docs(spark, [(9, "x a b a b a y")])
        (r,) = phrase_search(df, "doc_id", "text", "a b a").collect()
        assert (r["n_matches"], r["first_pos"]) == (2, 1)

    def test_single_token_phrase(self, spark):
        got = self._run(spark, "brown")
        assert got[2] == (2, 1) and got[3] == (1, 0)
        assert got[1] == (1, 2) and got[4] == (1, 3)

    def test_rejects_empty_phrase(self, spark):
        with pytest.raises(ValueError):
            phrase_search(_docs(spark, self.DOCS), "doc_id", "text", "   ")
