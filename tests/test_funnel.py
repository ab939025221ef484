"""Filter-funnel attribution vs hand-computed expectations."""

from __future__ import annotations

from pyspark.sql import functions as F

from med_doi_feature_extraction_spark.operators.funnel import (
    funnel_audit,
    funnel_summary,
    funnel_survivors,
)


def _df(spark):
    rows = [
        # id, n, lang: gate1 n>=10, gate2 lang=='en', gate3 n<=100
        (1, 50, "en"),    # survives all
        (2, 5, "en"),     # fails g1
        (3, 5, "de"),     # fails g1 (g2 would also fail — g1 blamed)
        (4, 50, "de"),    # fails g2
        (5, 500, "en"),   # fails g3
        (6, None, "en"),  # NULL predicate → fails g1 (NULL is not a pass)
    ]
    return spark.createDataFrame(rows, "id: long, n: long, lang: string")


def _stages():
    return [
        ("big_enough", F.col("n") >= 10),
        ("english", F.col("lang") == "en"),
        ("not_huge", F.col("n") <= 100),
    ]


class TestFunnel:
    def test_audit_first_failure_wins(self, spark):
        out = {
            r["id"]: (r["first_failed"], r["kept"])
            for r in funnel_audit(_df(spark), _stages()).collect()
        }
        assert out[1] == (None, True)
        assert out[2] == ("big_enough", False)
        assert out[3] == ("big_enough", False)  # not blamed on 'english'
        assert out[4] == ("english", False)
        assert out[5] == ("not_huge", False)
        assert out[6] == ("big_enough", False)  # NULL → fail

    def test_summary_hand_computed(self, spark):
        out = {
            r["stage"]: r
            for r in funnel_summary(_df(spark), _stages()).collect()
        }
        g1 = out["big_enough"]
        assert (g1["entering"], g1["dropped"], g1["surviving"]) == (6, 3, 3)
        g2 = out["english"]
        assert (g2["entering"], g2["dropped"], g2["surviving"]) == (3, 1, 2)
        g3 = out["not_huge"]
        assert (g3["entering"], g3["dropped"], g3["surviving"]) == (2, 1, 1)

    def test_survivors_matches_audit(self, spark):
        df = _df(spark)
        surv = sorted(
            r["id"] for r in funnel_survivors(df, _stages()).collect()
        )
        kept = sorted(
            r["id"]
            for r in funnel_audit(df, _stages())
            .where(F.col("kept"))
            .collect()
        )
        assert surv == kept == [1]

    def test_empty_input(self, spark):
        df = _df(spark).where(F.lit(False))
        rows = funnel_summary(df, _stages()).collect()
        assert [
            (r["entering"], r["dropped"], r["surviving"]) for r in rows
        ] == [(0, 0, 0)] * 3
