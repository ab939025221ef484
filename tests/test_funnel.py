"""Filter-funnel attribution vs hand-computed expectations."""

from __future__ import annotations

import pytest
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


# --------------------------------------------------------- session funnel


class TestSessionFunnel:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "sid long, ts timestamp, et string"
        )

    def test_ordered_matching_hand_computed(self, spark):
        from datetime import datetime

        from med_doi_feature_extraction_spark.operators.funnel import (
            session_funnel,
        )

        t = lambda s: datetime(2024, 1, 1, 0, 0, s)
        rows = [
            # session 1: full ordered chain
            (1, t(0), "click"), (1, t(5), "signup"), (1, t(9), "purchase"),
            # session 2: purchase BEFORE click -> depth 1 only
            (2, t(0), "purchase"), (2, t(3), "click"),
            # session 3: signup only, no click -> depth 0
            (3, t(0), "signup"),
        ]
        out = session_funnel(
            self._df(spark, rows), ["sid"], "ts", "et",
            ["click", "signup", "purchase"],
        ).orderBy("sid").collect()
        assert [r["funnel_depth"] for r in out] == [3, 1, 0]
        assert out[0]["t_purchase"] == t(9)
        assert out[1]["t_click"] == t(3) and out[1]["t_signup"] is None
        assert out[2]["t_click"] is None

    def test_same_timestamp_counts_as_conversion(self, spark):
        from datetime import datetime

        from med_doi_feature_extraction_spark.operators.funnel import (
            session_funnel,
        )

        t0 = datetime(2024, 1, 1)
        rows = [(1, t0, "click"), (1, t0, "signup")]
        out = session_funnel(
            self._df(spark, rows), ["sid"], "ts", "et",
            ["click", "signup"],
        ).collect()[0]
        assert out["funnel_depth"] == 2 and out["t_signup"] == t0

    def test_earliest_qualifying_timestamp_chosen(self, spark):
        from datetime import datetime

        from med_doi_feature_extraction_spark.operators.funnel import (
            session_funnel,
        )

        t = lambda s: datetime(2024, 1, 1, 0, 0, s)
        # signup at 1 (before click at 2, disqualified) and at 7
        rows = [
            (1, t(1), "signup"), (1, t(2), "click"),
            (1, t(7), "signup"), (1, t(4), "click"),
        ]
        out = session_funnel(
            self._df(spark, rows), ["sid"], "ts", "et",
            ["click", "signup"],
        ).collect()[0]
        assert out["t_click"] == t(2)  # earliest click
        assert out["t_signup"] == t(7)  # earliest signup >= t_click

    def test_summary_rates(self, spark):
        from datetime import datetime

        from med_doi_feature_extraction_spark.operators.funnel import (
            session_funnel,
            session_funnel_summary,
        )

        t = lambda s: datetime(2024, 1, 1, 0, 0, s)
        rows = [
            (1, t(0), "a"), (1, t(1), "b"),
            (2, t(0), "a"),
            (3, t(0), "x"),
            (4, t(0), "a"), (4, t(1), "b"),
        ]
        per = session_funnel(
            self._df(spark, rows), ["sid"], "ts", "et", ["a", "b"]
        )
        out = session_funnel_summary(per, ["a", "b"]).orderBy(
            "stage_idx"
        ).collect()
        assert out[0]["n_reached"] == 3  # sessions 1, 2, 4 clicked a
        assert out[0]["conv_from_start"] == 0.75  # of 4 sessions
        assert out[1]["n_reached"] == 2
        assert out[1]["conv_from_prev"] == pytest.approx(2 / 3, abs=1e-6)

    def test_empty_stage_list_raises(self, spark):
        from med_doi_feature_extraction_spark.operators.funnel import (
            session_funnel,
        )

        with pytest.raises(ValueError):
            session_funnel(self._df(spark, []), ["sid"], "ts", "et", [])
