"""Window operators vs a plain-pandas oracle on the pages table."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from med_doi_feature_extraction_spark.operators.windows import (
    dedupe_latest,
    forward_fill,
    rolling,
    session_features,
    sessionize,
    with_lag_lead,
)

GAP = 3600


def _prep(pages_pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pages_pdf.copy()
    pdf["text_len"] = pdf.text.str.len().fillna(0).astype("int64")
    return pdf.sort_values(["url", "warc_ts"], kind="stable").reset_index(drop=True)


def _spark_base(spark, pages_pdf):
    pdf = _prep(pages_pdf)
    return spark.createDataFrame(pdf[["url", "warc_ts", "text_len", "lang"]])


def test_lag_lead_delta(spark, pages_pdf):
    sdf = _spark_base(spark, pages_pdf)
    got = (
        with_lag_lead(sdf, "url", "warc_ts", {"text_len": "text_len"}, include_lead=True)
        .toPandas()
        .sort_values(["url", "warc_ts"], kind="stable")
        .reset_index(drop=True)
    )
    pdf = _prep(pages_pdf)
    g = pdf.groupby("url", sort=False)["text_len"]
    exp_lag = g.shift(1)
    exp_lead = g.shift(-1)
    assert np.allclose(got.text_len_lag1.astype(float), exp_lag, equal_nan=True)
    assert np.allclose(got.label_text_len_lead1.astype(float), exp_lead, equal_nan=True)
    assert np.allclose(
        got.text_len_delta1.astype(float), pdf.text_len - exp_lag, equal_nan=True
    )


def test_forward_fill(spark, pages_pdf):
    sdf = _spark_base(spark, pages_pdf)
    got = (
        forward_fill(sdf, "url", "warc_ts", ["lang"])
        .toPandas()
        .sort_values(["url", "warc_ts"], kind="stable")
        .reset_index(drop=True)
    )
    pdf = _prep(pages_pdf)
    exp = pdf.groupby("url", sort=False)["lang"].ffill()
    assert (got.lang_ffill.fillna("∅") == exp.fillna("∅")).all()


def _oracle_sessionize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.copy()
    prev = pdf.groupby("url", sort=False)["warc_ts"].shift(1)
    gap = (pdf.warc_ts - prev).dt.total_seconds()
    new = gap.isna() | (gap > GAP)
    pdf["gap_seconds"] = gap
    pdf["session_id"] = new.groupby(pdf.url, sort=False).cumsum().astype("int64")
    pdf["snap_rank"] = pdf.groupby("url", sort=False).cumcount() + 1
    pdf["session_seq"] = pdf.groupby(["url", "session_id"], sort=False).cumcount() + 1
    return pdf


def test_sessionize(spark, pages_pdf):
    sdf = _spark_base(spark, pages_pdf)
    got = (
        sessionize(sdf, "url", "warc_ts", GAP)
        .toPandas()
        .sort_values(["url", "warc_ts"], kind="stable")
        .reset_index(drop=True)
    )
    exp = _oracle_sessionize(_prep(pages_pdf))
    assert (got.session_id == exp.session_id).all()
    assert (got.session_seq == exp.session_seq).all()
    assert (got.snap_rank == exp.snap_rank).all()
    assert np.allclose(
        got.gap_seconds.astype(float), exp.gap_seconds.astype(float), equal_nan=True
    )


def test_sessionize_input_order_invariance(spark, pages_pdf):
    """Permutation invariance: shuffled input gives identical sessions."""
    pdf = _prep(pages_pdf)
    shuffled = pdf.sample(frac=1.0, random_state=7).reset_index(drop=True)
    a = (
        sessionize(spark.createDataFrame(pdf), "url", "warc_ts", GAP)
        .toPandas().sort_values(["url", "warc_ts"]).reset_index(drop=True)
    )
    b = (
        sessionize(spark.createDataFrame(shuffled), "url", "warc_ts", GAP)
        .toPandas().sort_values(["url", "warc_ts"]).reset_index(drop=True)
    )
    assert (a.session_id == b.session_id).all()


def test_session_features(spark, pages_pdf):
    sdf = _spark_base(spark, pages_pdf)
    sess = sessionize(sdf, "url", "warc_ts", GAP)
    feats = session_features(sess, "url", "warc_ts", ["text_len"]).toPandas()
    exp = _oracle_sessionize(_prep(pages_pdf))
    grp = exp.groupby(["url", "session_id"])
    exp_agg = grp.agg(
        n_events=("warc_ts", "size"), text_len_sum=("text_len", "sum")
    ).reset_index()
    merged = feats.merge(exp_agg, on=["url", "session_id"], suffixes=("", "_exp"))
    assert len(merged) == len(exp_agg)
    assert (merged.n_events == merged.n_events_exp).all()
    assert np.allclose(merged.text_len_sum, merged.text_len_sum_exp)


def test_rolling_rows(spark, pages_pdf):
    sdf = _spark_base(spark, pages_pdf)
    got = (
        rolling(sdf, "url", "warc_ts", "text_len", n_rows=3)
        .toPandas().sort_values(["url", "warc_ts"]).reset_index(drop=True)
    )
    pdf = _prep(pages_pdf)
    r = pdf.groupby("url", sort=False)["text_len"].rolling(3, min_periods=1)
    assert np.allclose(got.text_len_avg_r3, r.mean().reset_index(drop=True).round(6))
    assert np.allclose(got.text_len_sum_r3, r.sum().reset_index(drop=True))


def test_rolling_time_range(spark, pages_pdf):
    sdf = _spark_base(spark, pages_pdf)
    got = (
        rolling(sdf, "url", "warc_ts", "text_len", range_seconds=7200)
        .toPandas().sort_values(["url", "warc_ts"]).reset_index(drop=True)
    )
    pdf = _prep(pages_pdf)
    ts = pdf.warc_ts.astype("int64") // 1_000_000
    exp_cnt = []
    for url, t in zip(pdf.url, ts):
        m = (pdf.url == url) & (ts >= t - 7200) & (ts <= t)
        exp_cnt.append(int(m.sum()))
    assert (got.text_len_cnt_s7200 == np.array(exp_cnt)).all()


def test_dedupe_latest(spark, pages_pdf):
    sdf = _spark_base(spark, pages_pdf)
    got = dedupe_latest(sdf, ["url"], "warc_ts").toPandas()
    pdf = _prep(pages_pdf)
    exp = pdf.groupby("url", sort=False).tail(1)
    assert len(got) == pdf.url.nunique()
    merged = got.merge(exp[["url", "warc_ts"]], on="url", suffixes=("", "_exp"))
    assert (merged.warc_ts == merged.warc_ts_exp).all()


def test_leakage_deletion_invariance(spark, pages_pdf):
    """THE leakage test: for a cutoff url+ts, every serving feature is
    unchanged when all strictly-future rows of that url are deleted."""
    pdf = _prep(pages_pdf)
    url = pdf.url.value_counts().idxmax()
    rows = pdf[pdf.url == url]
    cutoff = rows.warc_ts.iloc[len(rows) // 2]

    def features(frame: pd.DataFrame) -> pd.DataFrame:
        sdf = spark.createDataFrame(frame[["url", "warc_ts", "text_len", "lang"]])
        out = sessionize(
            forward_fill(
                with_lag_lead(sdf, "url", "warc_ts", {"text_len": "text_len"}),
                "url", "warc_ts", ["lang"],
            ),
            "url", "warc_ts", GAP,
        )
        return out.filter(
            (F.col("url") == url) & (F.col("warc_ts") == cutoff)
        ).toPandas()

    full = features(pdf)
    truncated = features(pdf[(pdf.url != url) | (pdf.warc_ts <= cutoff)])
    assert len(full) == len(truncated) == 1
    serving_cols = [c for c in full.columns if not c.startswith("label_")]
    pd.testing.assert_frame_equal(
        full[serving_cols].reset_index(drop=True),
        truncated[serving_cols].reset_index(drop=True),
    )


class TestChangeRateFeatures:
    def test_hand_computed(self, spark):
        from med_doi_feature_extraction_spark.operators.windows import (
            change_rate_features,
        )

        rows = [
            # url A: a,a,b,b,c over 4x100s gaps → 2 changes / 4
            ("A", "2024-01-01 00:00:00", 1, "a"),
            ("A", "2024-01-01 00:01:40", 2, "a"),
            ("A", "2024-01-01 00:03:20", 3, "b"),
            ("A", "2024-01-01 00:05:00", 4, "b"),
            ("A", "2024-01-01 00:06:40", 5, "c"),
            # url B: singleton → NULL rate, NULL gap
            ("B", "2024-01-01 00:00:00", 6, "x"),
            # url C: NULL→NULL no change, NULL→v change
            ("C", "2024-01-01 00:00:00", 7, None),
            ("C", "2024-01-01 00:01:00", 8, None),
            ("C", "2024-01-01 00:02:00", 9, "v"),
        ]
        df = spark.createDataFrame(
            rows, "url: string, ts: string, sid: long, content: string"
        ).withColumn("ts", F.to_timestamp("ts"))
        out = {
            r["url"]: r
            for r in change_rate_features(
                df, "url", "ts", "content", tiebreak=["sid"]
            ).collect()
        }
        a = out["A"]
        assert a["n_snapshots"] == 5 and a["n_changes"] == 2
        assert a["change_rate"] == 0.5 and a["mean_gap_sec"] == 100.0
        assert str(a["last_change_ts"]) == "2024-01-01 00:06:40"
        b = out["B"]
        assert b["n_snapshots"] == 1 and b["n_changes"] == 0
        assert b["change_rate"] is None and b["mean_gap_sec"] is None
        assert b["last_change_ts"] is None
        c = out["C"]
        assert c["n_changes"] == 1 and c["change_rate"] == 0.5
        assert str(c["last_change_ts"]) == "2024-01-01 00:02:00"


class TestSnapshotDrift:
    def _df(self, spark):
        rows = [
            # url A: {a b c d} → {a b c} (j=3/4) → {x y} (j=0)
            ("A", "2024-01-01 00:00:00", "a b c d"),
            ("A", "2024-01-02 00:00:00", "a  B c"),   # ws+case normalize
            ("A", "2024-01-03 00:00:00", "x y"),
            # url B: singleton → NULL head only
            ("B", "2024-01-01 00:00:00", "solo"),
            # url C: two equal-drift rewrites → argmax tie → EARLIEST ts
            ("C", "2024-01-01 00:00:00", "a"),
            ("C", "2024-01-02 00:00:00", "b"),
            ("C", "2024-01-03 00:00:00", "c"),
        ]
        return spark.createDataFrame(
            rows, "url: string, ts: string, text: string"
        ).withColumn("ts", F.to_timestamp("ts"))

    def test_per_row_hand_computed(self, spark):
        from med_doi_feature_extraction_spark.operators.windows import (
            snapshot_drift,
        )

        out = {
            (r["url"], str(r["ts"])): (r["jaccard_prev"], r["drift"])
            for r in snapshot_drift(self._df(spark), "url", "ts", "text").collect()
        }
        assert out[("A", "2024-01-01 00:00:00")] == (None, None)
        assert out[("A", "2024-01-02 00:00:00")] == (0.75, 0.25)
        assert out[("A", "2024-01-03 00:00:00")] == (0.0, 1.0)
        assert out[("B", "2024-01-01 00:00:00")] == (None, None)
        assert out[("C", "2024-01-02 00:00:00")] == (0.0, 1.0)

    def test_summary_hand_computed(self, spark):
        from med_doi_feature_extraction_spark.operators.windows import (
            drift_summary,
        )

        out = {
            r["url"]: r
            for r in drift_summary(self._df(spark), "url", "ts", "text").collect()
        }
        a = out["A"]
        assert a["n_snapshots"] == 3
        assert a["mean_drift"] == 0.625 and a["max_drift"] == 1.0
        assert str(a["max_drift_ts"]) == "2024-01-03 00:00:00"
        b = out["B"]
        assert b["n_snapshots"] == 1
        assert b["mean_drift"] is None and b["max_drift"] is None
        assert b["max_drift_ts"] is None
        # tie on max drift → earliest rewrite wins in both engines
        assert str(out["C"]["max_drift_ts"]) == "2024-01-02 00:00:00"

    def test_leakage_deletion_invariance(self, spark):
        """Dropping FUTURE snapshots never changes a past row's drift."""
        from med_doi_feature_extraction_spark.operators.windows import (
            snapshot_drift,
        )

        df = self._df(spark)
        full = snapshot_drift(df, "url", "ts", "text")
        cut = F.to_timestamp(F.lit("2024-01-02 12:00:00"))
        trunc = snapshot_drift(df.where(F.col("ts") <= cut), "url", "ts", "text")
        f = sorted(map(tuple, full.where(F.col("ts") <= cut).collect()))
        t = sorted(map(tuple, trunc.collect()))
        assert f == t


class TestCumulativeDistinct:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_id long, v string"
        )

    def test_hand_computed(self, spark):
        from datetime import datetime

        from med_doi_feature_extraction_spark.operators.windows import (
            cumulative_distinct,
        )

        t = lambda s: datetime(2024, 1, 1, 0, 0, s)
        rows = [
            (1, t(0), 1, "a"),
            (1, t(1), 2, "b"),
            (1, t(2), 3, "a"),
            (1, t(3), 4, None),
            (1, t(4), 5, "c"),
            (2, t(0), 6, "a"),
        ]
        out = cumulative_distinct(
            self._df(spark, rows), "user_id", "ts", "v",
            tiebreak=["event_id"],
        ).orderBy("user_id", "ts").collect()
        assert [r["n_distinct_seen"] for r in out] == [1, 2, 2, 2, 3, 1]

    def test_null_rows_carry_count_not_increment(self, spark):
        from datetime import datetime

        from med_doi_feature_extraction_spark.operators.windows import (
            cumulative_distinct,
        )

        t = lambda s: datetime(2024, 1, 1, 0, 0, s)
        rows = [(1, t(0), 1, None), (1, t(1), 2, None), (1, t(2), 3, "x")]
        out = cumulative_distinct(
            self._df(spark, rows), "user_id", "ts", "v",
            tiebreak=["event_id"],
        ).orderBy("ts").collect()
        assert [r["n_distinct_seen"] for r in out] == [0, 0, 1]

    def test_final_row_equals_global_distinct(self, spark):
        from datetime import datetime

        from med_doi_feature_extraction_spark.operators.windows import (
            cumulative_distinct,
        )

        t = lambda s: datetime(2024, 1, 1, 0, 0, s)
        rows = [
            (1, t(i), i, f"v{(i * 3) % 5}") for i in range(20)
        ]
        out = cumulative_distinct(
            self._df(spark, rows), "user_id", "ts", "v",
            tiebreak=["event_id"],
        ).orderBy("ts").collect()
        assert out[-1]["n_distinct_seen"] == len(
            {r[3] for r in rows}
        )
        # monotone non-decreasing
        seq = [r["n_distinct_seen"] for r in out]
        assert seq == sorted(seq)

    def test_tiebreak_same_timestamp(self, spark):
        from datetime import datetime

        from med_doi_feature_extraction_spark.operators.windows import (
            cumulative_distinct,
        )

        t0 = datetime(2024, 1, 1)
        rows = [(1, t0, 2, "b"), (1, t0, 1, "a"), (1, t0, 3, "a")]
        out = cumulative_distinct(
            self._df(spark, rows), "user_id", "ts", "v",
            tiebreak=["event_id"],
        ).orderBy("event_id").collect()
        assert [r["n_distinct_seen"] for r in out] == [1, 2, 2]


class TestSnapshotEditDistance:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "url string, ts timestamp, text string"
        )

    def test_hand_computed(self, spark):
        from datetime import datetime

        from med_doi_feature_extraction_spark.operators.windows import (
            snapshot_edit_distance,
        )

        t = lambda d: datetime(2024, 1, d)
        rows = [
            ("u", t(1), "kitten"),
            ("u", t(2), "sitting"),
            ("u", t(3), "sitting"),
        ]
        out = snapshot_edit_distance(
            self._df(spark, rows), "url", "ts", "text"
        ).orderBy("ts").collect()
        assert out[0]["editdist"] is None
        assert out[0]["len_delta"] is None
        assert out[1]["editdist"] == 3
        assert out[1]["len_delta"] == 1
        assert out[1]["edit_ratio"] == pytest.approx(3 / 7, abs=1e-6)
        assert out[2]["editdist"] == 0 and out[2]["edit_ratio"] == 0.0

    def test_prefix_cap_bounds_distance(self, spark):
        from datetime import datetime

        from med_doi_feature_extraction_spark.operators.windows import (
            snapshot_edit_distance,
        )

        t = lambda d: datetime(2024, 1, d)
        # identical first 8 chars, wildly different tails
        rows = [
            ("u", t(1), "SAMEHEAD" + "x" * 500),
            ("u", t(2), "SAMEHEAD" + "y" * 900),
        ]
        out = snapshot_edit_distance(
            self._df(spark, rows), "url", "ts", "text", prefix=8
        ).orderBy("ts").collect()
        assert out[1]["editdist"] == 0  # prefix-capped view is equal
        assert out[1]["len_delta"] == 400  # full lengths still exact
        assert out[1]["n_chars"] == 908

    def test_token_blind_reordering_is_visible(self, spark):
        """The case snapshot_drift (token Jaccard) cannot see."""
        from datetime import datetime

        from med_doi_feature_extraction_spark.operators.windows import (
            snapshot_drift,
            snapshot_edit_distance,
        )

        t = lambda d: datetime(2024, 1, d)
        rows = [
            ("u", t(1), "alpha beta gamma"),
            ("u", t(2), "gamma beta alpha"),
        ]
        df = self._df(spark, rows)
        jac = snapshot_drift(df, "u" if False else "url", "ts", "text")
        j2 = jac.orderBy("ts").collect()[1]
        assert j2["jaccard_prev"] == 1.0  # same token set
        ed = snapshot_edit_distance(df, "url", "ts", "text")
        e2 = ed.orderBy("ts").collect()[1]
        assert e2["editdist"] > 0  # reorder is visible here


class TestRollingMedian:
    def _df(self, spark, vals, uid=1):
        from datetime import datetime, timedelta

        base = datetime(2024, 1, 1)
        rows = [
            (uid, base + timedelta(seconds=i), i, v)
            for i, v in enumerate(vals)
        ]
        return spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_id long, value double"
        )

    def test_matches_numpy_type7(self, spark):
        import numpy as np

        from med_doi_feature_extraction_spark.operators.windows import (
            rolling_median,
        )

        vals = [5.0, 1.0, 9.0, 3.0, 7.0, 2.0, 8.0, 4.0]
        out = rolling_median(
            self._df(spark, vals), "user_id", "ts", "value",
            n_rows=3, tiebreak=["event_id"], quantiles=(0.5, 0.9),
        ).orderBy("event_id").collect()
        for i, row in enumerate(out):
            window = vals[max(0, i - 2): i + 1]
            assert row["value_p50_r3"] == pytest.approx(
                float(np.quantile(window, 0.5)), abs=1e-6
            )
            assert row["value_p90_r3"] == pytest.approx(
                float(np.quantile(window, 0.9)), abs=1e-6
            )

    def test_nulls_excluded(self, spark):
        from med_doi_feature_extraction_spark.operators.windows import (
            rolling_median,
        )

        vals = [4.0, None, 10.0]
        out = rolling_median(
            self._df(spark, vals), "user_id", "ts", "value",
            n_rows=3, tiebreak=["event_id"],
        ).orderBy("event_id").collect()
        # third row's window = {4, 10} -> median 7
        assert out[2]["value_p50_r3"] == 7.0
        assert out[1]["value_p50_r3"] == 4.0

    def test_all_null_window_is_null(self, spark):
        from med_doi_feature_extraction_spark.operators.windows import (
            rolling_median,
        )

        out = rolling_median(
            self._df(spark, [None, None]), "user_id", "ts", "value",
            n_rows=2, tiebreak=["event_id"],
        ).orderBy("event_id").collect()
        assert all(r["value_p50_r2"] is None for r in out)

    def test_median_robust_to_spike_where_mean_is_not(self, spark):
        from med_doi_feature_extraction_spark.operators.windows import (
            rolling,
            rolling_median,
        )

        vals = [10.0, 10.0, 10.0, 10.0, 9000.0]
        df = self._df(spark, vals)
        med = rolling_median(
            df, "user_id", "ts", "value", n_rows=5,
            tiebreak=["event_id"],
        ).orderBy("event_id").collect()[-1]
        avg = rolling(
            df, "user_id", "ts", "value", n_rows=5,
            tiebreak=["event_id"],
        ).orderBy("event_id").collect()[-1]
        assert med["value_p50_r5"] == 10.0
        assert avg["value_avg_r5"] > 1000

    def test_invalid_params_raise(self, spark):
        from med_doi_feature_extraction_spark.operators.windows import (
            rolling_median,
        )

        df = self._df(spark, [1.0])
        with pytest.raises(ValueError):
            rolling_median(df, "user_id", "ts", "value", n_rows=0)
        with pytest.raises(ValueError):
            rolling_median(
                df, "user_id", "ts", "value", n_rows=2,
                quantiles=(1.5,),
            )
