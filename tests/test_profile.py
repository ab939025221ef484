"""Table profiler tests (operators/profile.py): exact stats against
hand-computed values (nulls, empty strings, all-null columns), HLL
approx path error bounds, and the one-scan plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from med_doi_feature_extraction_spark.operators.profile import profile


@pytest.fixture(scope="module")
def small(spark):
    rows = [
        (1, "a", 10.0, None),
        (2, "bb", None, None),
        (3, None, 30.0, None),
        (4, "a", 20.0, None),
    ]
    return spark.createDataFrame(
        rows, "id long, s string, v double, dead string"
    )


def test_profile_exact(spark, small):
    got = {r.column: r for r in profile(small, approx=False).collect()}
    assert set(got) == {"id", "s", "v", "dead"}
    assert all(r.n_rows == 4 for r in got.values())

    assert got["id"].n_nulls == 0 and got["id"].n_distinct == 4
    assert (got["id"].min_num, got["id"].max_num, got["id"].mean) == (1.0, 4.0, 2.5)
    assert got["id"].min_len is None  # not a string

    assert got["s"].n_nulls == 1 and got["s"].null_frac == 0.25
    assert got["s"].n_distinct == 2  # nulls not counted
    assert (got["s"].min_len, got["s"].max_len, got["s"].avg_len) == (1.0, 2.0, 4 / 3)
    assert got["s"].min_num is None

    assert got["v"].n_nulls == 1 and got["v"].n_distinct == 3
    assert (got["v"].min_num, got["v"].max_num, got["v"].mean) == (10.0, 30.0, 20.0)

    assert got["dead"].n_nulls == 4 and got["dead"].null_frac == 1.0
    assert got["dead"].n_distinct == 0
    assert got["dead"].avg_len is None  # avg over zero values


def test_profile_column_subset_prunes_scan(spark, small):
    out = profile(small, ["id", "v"], approx=False)
    assert [r.column for r in out.collect()] == ["id", "v"]


def test_profile_approx_bounds(spark):
    df = spark.range(50_000).select(
        F.col("id"),
        F.concat(F.lit("k"), (F.col("id") % 9973).cast("string")).alias("s"),
    )
    got = {r.column: r for r in profile(df, approx=True).collect()}
    # rsd defaults to 0.02; allow 3 sigma
    assert abs(got["id"].n_distinct - 50_000) <= 0.06 * 50_000
    assert abs(got["s"].n_distinct - 9973) <= 0.06 * 9973
    # exact stats stay exact on the approx path
    assert got["id"].mean == (50_000 - 1) / 2
    assert got["id"].n_nulls == 0


def test_profile_single_scan_plan(spark, small):
    """approx path: one aggregate over one scan — no Expand, no join,
    no extra scans (the whole profile rides a single pass)."""
    plan = profile(small, approx=True)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan") <= 1
    assert "Expand" not in plan
    # exact path trades one Expand for exact distincts, still one scan
    plan_exact = profile(small, approx=False)._jdf.queryExecution().executedPlan().toString()
    assert plan_exact.count("Scan") <= 1


class TestDataContracts:
    def test_fd_violations_hand_case(self, spark):
        from med_doi_feature_extraction_spark.operators.profile import (
            fd_violations,
        )

        df = spark.createDataFrame(
            [
                ("u1", "a"), ("u1", "a"),           # holds
                ("u2", "a"), ("u2", "b"), ("u2", "c"), ("u2", "d"),
                ("u3", None), ("u3", "x"),          # null + value
            ],
            "k: string, v: string",
        )
        got = {r["k"]: r for r in fd_violations(df, "k", "v", sample=2).collect()}
        assert "u1" not in got
        u2 = got["u2"]
        assert u2["n_rows"] == 4 and u2["n_values"] == 4
        assert u2["examples"] == "a,b"  # sorted prefix, capped at 2
        # countDistinct ignores NULL: u3 has 1 distinct value → holds
        assert "u3" not in got

    def test_fk_orphans_nulls_and_counts(self, spark):
        from med_doi_feature_extraction_spark.operators.profile import (
            fk_orphans,
        )

        fact = spark.createDataFrame(
            [(1,), (1,), (2,), (99,), (None,)], "fk: long"
        )
        dim = spark.createDataFrame([(1,), (2,)], "pk: long")
        got = {
            r["fk"]: r["n_orphans"]
            for r in fk_orphans(fact, dim, "fk", "pk").collect()
        }
        assert got == {99: 1, None: 1}


# ------------------------------------------------------------------ uniqueness


class TestUniquenessAudit:
    def test_hand_computed(self, spark):
        from med_doi_feature_extraction_spark.operators.profile import (
            uniqueness_audit,
        )

        rows = (
            [("a", 1)] * 3 + [("b", 1)] * 3  # two keys of size 3
            + [("c", 1), ("d", 1)]            # two singletons
            + [("e", None)]                   # null key -> excluded
        )
        df = spark.createDataFrame(rows, "k string, v int")
        out = uniqueness_audit(df, ["k", "v"]).collect()
        by = {r["group_size"]: r for r in out}
        assert by[1]["n_keys"] == 2 and by[1]["n_rows_in"] == 2
        assert by[3]["n_keys"] == 2 and by[3]["n_rows_in"] == 6
        assert by[1]["row_share"] == 0.25 and by[3]["row_share"] == 0.75
        assert [r["group_size"] for r in out] == [1, 3]

    def test_true_key_all_singletons(self, spark):
        from med_doi_feature_extraction_spark.operators.profile import (
            uniqueness_audit,
        )

        df = spark.createDataFrame(
            [(i,) for i in range(10)], "k long"
        )
        out = uniqueness_audit(df, ["k"]).collect()
        assert len(out) == 1
        assert out[0]["group_size"] == 1 and out[0]["row_share"] == 1.0

    def test_k_anonymity_reading(self, spark):
        """Share of rows in groups below k is the re-identifiable mass."""
        from med_doi_feature_extraction_spark.operators.profile import (
            uniqueness_audit,
        )

        rows = [("q1",)] * 5 + [("q2",)] * 4 + [("q3",)]
        df = spark.createDataFrame(rows, "q string")
        out = uniqueness_audit(df, ["q"]).collect()
        below_3 = sum(
            r["row_share"] for r in out if r["group_size"] < 3
        )
        assert below_3 == 0.1  # the lone q3 row


# -------------------------------------------------------------- pattern_census


class TestPatternCensus:
    def test_shape_classification(self, spark):
        from med_doi_feature_extraction_spark.operators.profile import (
            pattern_census,
        )

        rows = [
            ("42", "https://x.org/a"),
            ("-7", "mailto-ish"),
            ("3.14", None),
            ("", "http://y.net"),
            (None, "2024-01-02"),
        ]
        df = spark.createDataFrame(rows, "a string, b string")
        out = {r["column"]: r for r in pattern_census(df, ["a", "b"]).collect()}
        a = out["a"]
        assert a["n_rows"] == 4 and a["n_nulls"] == 1
        assert a["p_int_share"] == 0.5      # 42, -7
        assert a["p_float_share"] == 0.25   # 3.14
        assert a["p_empty_share"] == 0.25   # ""
        assert a["other_share"] == 0.0
        b = out["b"]
        assert b["p_url_share"] == 0.5
        assert b["p_date_share"] == 0.25
        assert b["other_share"] == 0.25     # mailto-ish

    def test_all_null_column_null_shares(self, spark):
        from med_doi_feature_extraction_spark.operators.profile import (
            pattern_census,
        )

        df = spark.createDataFrame([(None,), (None,)], "a string")
        r = pattern_census(df, ["a"]).collect()[0]
        assert r["n_rows"] == 0 and r["n_nulls"] == 2
        assert r["p_int_share"] is None and r["other_share"] is None

    def test_uuid_email_datetime(self, spark):
        from med_doi_feature_extraction_spark.operators.profile import (
            pattern_census,
        )

        rows = [
            ("550e8400-e29b-41d4-a716-446655440000",),
            ("user@example.com",),
            ("2024-03-01 12:30",),
        ]
        df = spark.createDataFrame(rows, "a string")
        r = pattern_census(df, ["a"]).collect()[0]
        for k in ("p_uuid_share", "p_email_share", "p_datetime_share"):
            assert r[k] == pytest.approx(1 / 3, abs=1e-6)


class TestWeightedQuantiles:
    def _run(self, spark, rows, **kw):
        from med_doi_feature_extraction_spark.operators.profile import (
            weighted_quantiles,
        )

        df = spark.createDataFrame(rows, "g string, v double, w double")
        return {
            r["group"]: r
            for r in weighted_quantiles(df, "v", "w", **kw).collect()
        }

    def test_hand_computed_type1(self, spark):
        # values 1,2,3 with weights 1,1,8 -> cum 1,2,10 of 10
        rows = [("a", 1.0, 1.0), ("a", 2.0, 1.0), ("a", 3.0, 8.0)]
        got = self._run(spark, rows, qs=(0.1, 0.2, 0.21, 0.5, 1.0))["all"]
        assert got["q10"] == 1.0   # cw(1)=1 >= 1.0
        assert got["q20"] == 2.0   # cw(2)=2 >= 2.0
        assert got["q21"] == 3.0   # 2 < 2.1 -> next value
        assert got["q50"] == 3.0
        assert got["q100"] == 3.0

    def test_groups_and_tie_collapse(self, spark):
        rows = [("a", 5.0, 2.0), ("a", 5.0, 3.0), ("b", 1.0, 1.0)]
        got = self._run(spark, rows, qs=(0.5,), group_col="g")
        assert got["a"]["q50"] == 5.0 and got["b"]["q50"] == 1.0

    def test_nonpositive_weights_excluded(self, spark):
        rows = [("a", 1.0, 0.0), ("a", 2.0, -3.0), ("a", 9.0, 1.0)]
        got = self._run(spark, rows, qs=(0.5,))
        assert got["all"]["q50"] == 9.0

    def test_rejects_bad_q(self, spark):
        import pytest as _pt

        from med_doi_feature_extraction_spark.operators.profile import (
            weighted_quantiles,
        )

        df = spark.createDataFrame([("a", 1.0, 1.0)], "g string, v double, w double")
        with _pt.raises(ValueError):
            weighted_quantiles(df, "v", "w", qs=(0.0,))
        with _pt.raises(ValueError):
            weighted_quantiles(df, "v", "w", qs=())
