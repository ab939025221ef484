"""Water-filling cap solver (operators/sampling.py cap_solver)."""

from __future__ import annotations

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
