"""Column-entropy profiler (operators/profile.py column_entropy)."""

from __future__ import annotations

import math

import pytest

from med_doi_feature_extraction_spark.operators.profile import (
    column_entropy,
)


def _ent_ref(values):
    vals = [v for v in values if v is not None]
    n = len(vals)
    from collections import Counter

    ent_u = 0
    counts = Counter(str(v) for v in vals)
    for c in counts.values():
        p = c / n
        ent_u += math.floor(abs(-(p * math.log(p))) * 1e6 + 0.5)
    return ent_u / 1e6, len(counts), len(values) - n


ROWS = [
    (1, "a", 10),
    (2, "a", 10),
    (3, "b", 10),
    (4, "b", None),
    (5, "c", None),
    (5, "c", 10),
]


@pytest.fixture(scope="module")
def ent(spark):
    df = spark.createDataFrame(ROWS, "id long, s string, k long")
    return {
        r["column"]: r
        for r in column_entropy(df, ["id", "s", "k"]).collect()
    }


def test_matches_python_reference(ent):
    cols = list(zip(*ROWS))
    for name, vals in zip(("id", "s", "k"), cols):
        e, nd, nn = _ent_ref(vals)
        row = ent[name]
        assert row["entropy"] == pytest.approx(e, abs=1e-12), name
        assert row["n_distinct"] == nd and row["n_nulls"] == nn, name
        assert row["n_rows"] == len(vals) - nn


def test_constant_column_zero_entropy_null_norm(ent):
    assert ent["k"]["entropy"] == 0.0
    assert ent["k"]["entropy_norm"] is None  # n_distinct = 1


def test_norm_is_entropy_over_ln_distinct(ent):
    row = ent["s"]
    want = row["entropy"] / math.log(row["n_distinct"])
    got = row["entropy_norm"]
    assert got == pytest.approx(want, abs=1e-6)
    assert 0.0 < got <= 1.0


def test_uniform_column_norm_is_one(spark):
    df = spark.createDataFrame([(i,) for i in range(64)], "u long")
    row = column_entropy(df, ["u"]).collect()[0]
    assert row["entropy_norm"] == pytest.approx(1.0, abs=1e-5)


def test_all_null_column_omitted(spark):
    df = spark.createDataFrame(
        [(1, None), (2, None)], "a long, b string"
    )
    out = {r["column"] for r in column_entropy(df).collect()}
    assert out == {"a"}


def test_no_python_udf(spark):
    df = spark.createDataFrame(ROWS, "id long, s string, k long")
    plan = (
        column_entropy(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ------------------------------------------------------------- group_entropy


class TestGroupEntropy:
    def _run(self, spark, rows):
        from med_doi_feature_extraction_spark.operators.profile import (
            group_entropy,
        )

        df = spark.createDataFrame(rows, "uid long, v string")
        out = group_entropy(df, ["uid"], "v")
        return {r["uid"]: r for r in out.collect()}

    def test_hand_computed(self, spark):
        import math

        rows = (
            [(1, "a")] * 2 + [(1, "b")] * 2  # uniform over 2 -> ln 2
            + [(2, "x")] * 4                 # constant -> 0
            + [(3, "p"), (3, "q"), (3, "q"), (3, "q")]
        )
        by = self._run(spark, rows)
        assert by[1]["entropy"] == pytest.approx(math.log(2), abs=1e-6)
        assert by[1]["entropy_norm"] == pytest.approx(1.0, abs=1e-5)
        assert by[2]["entropy"] == 0.0
        assert by[2]["entropy_norm"] is None  # single level
        h3 = -(0.25 * math.log(0.25) + 0.75 * math.log(0.75))
        assert by[3]["entropy"] == pytest.approx(h3, abs=2e-6)
        assert by[3]["n_rows"] == 4 and by[3]["n_distinct"] == 2

    def test_nulls_excluded_and_all_null_entity_absent(self, spark):
        rows = [(1, "a"), (1, None), (2, None)]
        by = self._run(spark, rows)
        assert by[1]["n_rows"] == 1
        assert 2 not in by  # no non-null values -> no distribution

    def test_uniform_mix_max_normalized(self, spark):
        rows = [(1, f"v{i % 5}") for i in range(25)]
        by = self._run(spark, rows)
        assert by[1]["n_distinct"] == 5
        assert by[1]["entropy_norm"] == pytest.approx(1.0, abs=1e-5)
