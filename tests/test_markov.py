"""Markov transition matrix (operators/markov.py)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from med_doi_feature_extraction_spark.operators.markov import (
    transition_matrix,
)


def _df(spark, seqs):
    """seqs: dict uid -> list of types (None allowed)."""
    base = datetime(2024, 1, 1)
    rows = []
    for uid, types in seqs.items():
        for i, t in enumerate(types):
            rows.append((uid, base + timedelta(seconds=i), i, t))
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, et string"
    )


def _cells(spark, seqs):
    out = transition_matrix(
        _df(spark, seqs), ["user_id"], "ts", "et",
        tiebreak=["event_id"],
    ).collect()
    return {(r["prev_type"], r["next_type"]): r for r in out}


def test_hand_computed_probabilities(spark):
    by = _cells(spark, {1: ["a", "b", "a", "b", "a", "c"]})
    # transitions: a->b x2, b->a x2, a->c x1
    assert by[("a", "b")]["n"] == 2
    assert by[("a", "b")]["p"] == pytest.approx(2 / 3, abs=1e-6)
    assert by[("a", "c")]["p"] == pytest.approx(1 / 3, abs=1e-6)
    assert by[("b", "a")]["p"] == 1.0
    # row-conditional p sums to 1 per prev
    assert by[("a", "b")]["p"] + by[("a", "c")]["p"] == pytest.approx(
        1.0, abs=2e-6
    )


def test_no_cross_entity_transitions(spark):
    by = _cells(spark, {1: ["a"], 2: ["b"], 3: ["a", "a"]})
    # only 3's self-transition exists; no a->b from entity boundary
    assert set(by) == {("a", "a")}
    assert by[("a", "a")]["n"] == 1


def test_null_breaks_chain(spark):
    by = _cells(spark, {1: ["a", None, "b"]})
    # a->None and None->b both dropped
    assert by == {}


def test_lift_vs_base_rate(spark):
    # c always follows a; c is rare overall -> lift >> 1
    seqs = {i: ["a", "c", "b", "b", "b", "b"] for i in range(5)}
    by = _cells(spark, seqs)
    assert by[("a", "c")]["p"] == 1.0
    assert by[("a", "c")]["lift"] > 3.0
    assert by[("b", "b")]["lift"] == pytest.approx(
        by[("b", "b")]["p"] / by[("b", "b")]["p_next"], abs=1e-5
    )


# --------------------------------------------------------------- session_paths


class TestSessionPaths:
    def _run(self, spark, seqs, **kw):
        from med_doi_feature_extraction_spark.operators.markov import (
            session_paths,
        )

        return session_paths(
            _df(spark, seqs), ["user_id"], "ts", "et",
            tiebreak=["event_id"], **kw,
        ).collect()

    def test_counts_and_order(self, spark):
        seqs = {
            1: ["a", "b"], 2: ["a", "b"], 3: ["a", "b"],
            4: ["x"], 5: ["x"], 6: ["z", "q"],
        }
        out = self._run(spark, seqs, k=10)
        assert out[0]["path"] == "a>b" and out[0]["n_sessions"] == 3
        assert out[0]["share"] == 0.5
        assert out[1]["path"] == "x" and out[1]["n_sessions"] == 2
        # tie between 1-count paths -> path ASC
        assert out[2]["path"] == "z>q"

    def test_truncation_flag_and_cap(self, spark):
        seqs = {1: ["s"] * 9}
        out = self._run(spark, seqs, max_len=4, k=5)
        assert out[0]["path"] == "s>s>s>s"
        assert out[0]["truncated"] and out[0]["n_steps"] == 9

    def test_null_types_skipped(self, spark):
        seqs = {1: ["a", None, "b"], 2: [None, None]}
        out = self._run(spark, seqs, k=5)
        assert len(out) == 1
        assert out[0]["path"] == "a>b" and out[0]["share"] == 1.0

    def test_k_limits_output(self, spark):
        seqs = {i: [f"t{i}"] for i in range(20)}
        out = self._run(spark, seqs, k=7)
        assert len(out) == 7
        # deterministic page: lexicographically first 7 singleton paths
        assert [r["path"] for r in out] == sorted(
            f"t{i}" for i in range(20)
        )[:7]
