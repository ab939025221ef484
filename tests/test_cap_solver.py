"""Water-filling cap solver (operators/sampling.py cap_solver)."""

from __future__ import annotations

import pytest

# ------------------------------------------------------------------ cap_solver


class TestCapSolver:
    def _solve(self, spark, group_sizes, budget):
        """group_sizes: list of per-group row counts."""
        from med_doi_feature_extraction_spark.operators.sampling import (
            cap_solver,
        )

        rows = [
            (f"g{i}", j)
            for i, n in enumerate(group_sizes)
            for j in range(n)
        ]
        df = spark.createDataFrame(rows, "g string, x long")
        return cap_solver(df, ["g"], budget).collect()[0]

    def _brute(self, sizes, budget):
        best = None
        for lam in range(0, max(sizes) + 1):
            kept = sum(min(c, lam) for c in sizes)
            if kept <= budget:
                best = (lam, kept)
        return best

    def test_matches_brute_force(self, spark):
        sizes = [1, 3, 3, 7, 20, 50]
        for budget in (0, 3, 6, 10, 25, 60, 83, 84, 100):
            row = self._solve(spark, sizes, budget)
            lam, kept = self._brute(sizes, budget)
            assert (row["lam"], row["kept_rows"]) == (lam, kept), budget
            assert row["kept_rows"] <= budget

    def test_budget_covers_everything(self, spark):
        sizes = [2, 5, 9]
        row = self._solve(spark, sizes, 100)
        assert row["lam"] == 9  # max size: no capping needed
        assert row["kept_rows"] == 16 and row["n_capped_groups"] == 0

    def test_budget_below_group_count(self, spark):
        sizes = [4, 4, 4, 4, 4]
        row = self._solve(spark, sizes, 3)
        assert row["lam"] == 0 and row["kept_rows"] == 0
        assert row["n_capped_groups"] == 5

    def test_optimality_greedy_property(self, spark):
        """lam+1 would exceed the budget (maximality)."""
        sizes = [10, 10, 10, 1]
        row = self._solve(spark, sizes, 20)
        lam = row["lam"]
        f = lambda L: sum(min(c, L) for c in sizes)
        assert f(lam) <= 20 < f(lam + 1)

    def test_negative_budget_raises(self, spark):
        from med_doi_feature_extraction_spark.operators.sampling import (
            cap_solver,
        )

        df = spark.createDataFrame([("a", 1)], "g string, x long")
        import pytest as _pt

        with _pt.raises(ValueError):
            cap_solver(df, ["g"], -1)


# ------------------------------------------------------------------- neyman


class TestNeymanAllocation:
    def _solve(self, spark, strata, budget):
        """strata: dict name -> list of values."""
        from med_doi_feature_extraction_spark.operators.sampling import (
            neyman_allocation,
        )

        rows = [
            (name, float(v)) for name, vals in strata.items()
            for v in vals
        ]
        df = spark.createDataFrame(rows, "s string, v double")
        out = neyman_allocation(df, ["s"], "v", budget).collect()
        return {r["s"]: r for r in out}

    def test_sum_exact_and_caps_respected(self, spark):
        strata = {
            "wild": [0, 100, 50, 200, 10, 90, 170, 30],
            "calm": [50, 51, 50, 49, 50, 50],
            "tiny": [1, 999],
        }
        for budget in (0, 1, 5, 9, 12, 15, 16, 100):
            by = self._solve(spark, strata, budget)
            total = sum(r["n_alloc"] for r in by.values())
            n_all = sum(len(v) for v in strata.values())
            assert total == min(budget, n_all), budget
            for name, r in by.items():
                assert 0 <= r["n_alloc"] <= len(strata[name])

    def test_variance_gets_the_budget(self, spark):
        import math

        strata = {
            "wild": [0, 1000] * 20,     # huge sigma, n=40
            "calm": [7.0] * 40,         # sigma 0, n=40
        }
        by = self._solve(spark, strata, 20)
        assert by["wild"]["n_alloc"] == 20
        assert by["calm"]["n_alloc"] == 0
        assert by["calm"]["sigma"] == 0.0
        assert by["wild"]["sigma"] == pytest.approx(500.0, abs=1e-3)

    def test_all_constant_falls_back_proportional(self, spark):
        strata = {"a": [5.0] * 30, "b": [9.0] * 10}
        by = self._solve(spark, strata, 8)
        assert by["a"]["n_alloc"] == 6 and by["b"]["n_alloc"] == 2

    def test_overflow_reflows(self, spark):
        # wild stratum only has 4 rows; its Neyman share would exceed
        # that — the excess must flow to the other stratum
        strata = {"wild": [0, 1000, 0, 1000], "mild": [0.0, 1.0] * 20}
        by = self._solve(spark, strata, 20)
        assert by["wild"]["n_alloc"] == 4
        assert by["mild"]["n_alloc"] == 16

    def test_negative_budget_raises(self, spark):
        from med_doi_feature_extraction_spark.operators.sampling import (
            neyman_allocation,
        )

        df = spark.createDataFrame([("a", 1.0)], "s string, v double")
        import pytest as _pt

        with _pt.raises(ValueError):
            neyman_allocation(df, ["s"], "v", -5)
