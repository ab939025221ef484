"""Web admission pipeline (operators/admission.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from med_doi_feature_extraction_spark.operators.admission import (
    generate_admission_pages,
    web_admission_audit,
    web_admission_summary,
)


def test_every_gate_attributed(spark):
    pdf = generate_admission_pages(n=180, seed=3)
    df = spark.createDataFrame(pdf)
    out = web_admission_audit(df).toPandas()
    assert len(out) == len(pdf)
    ff = set(out.first_failed.dropna())
    assert ff == {"trap", "soft404", "thin", "lang", "canonical"}
    # strata map to their gate: kind = index % 9
    kind = out.url.map(
        lambda u: int(u.rstrip("/").split("-")[-1].split("/")[-1]) % 9
    )
    # kind 0/7/8 are clean; 1 trap; 2 soft404; 3/4 thin; 5 lang; 6 canonical
    assert (out[kind == 1].first_failed == "trap").all()
    assert (out[kind == 2].first_failed == "soft404").all()
    assert (out[kind == 3].first_failed == "thin").all()
    assert (out[kind == 4].first_failed == "thin").all()
    assert (out[kind == 5].first_failed == "lang").all()
    assert (out[kind == 6].first_failed == "canonical").all()
    assert out[kind.isin([0, 7, 8])].kept.all()


def test_summary_conservation(spark):
    pdf = generate_admission_pages(n=180, seed=3)
    df = spark.createDataFrame(pdf)
    s = web_admission_summary(df).orderBy("stage_idx").toPandas()
    assert list(s.stage) == ["trap", "soft404", "thin", "lang", "canonical"]
    assert s.iloc[0].entering == len(pdf)
    # entering chains: surviving[i] == entering[i+1]
    for i in range(len(s) - 1):
        assert s.iloc[i].surviving == s.iloc[i + 1].entering
    # total drops + final survivors == corpus
    audit = web_admission_audit(df).toPandas()
    assert s.dropped.sum() + int(s.iloc[-1].surviving) == len(pdf)
    assert int(s.iloc[-1].surviving) == int(audit.kept.sum())


def test_trap_score_col_matches_trap_features(spark):
    """The reusable Column and the battery table must agree — drift
    guard between hygiene.trap_score_col and hygiene.trap_features."""
    from med_doi_feature_extraction_spark.operators.hygiene import (
        generate_crawl_urls,
        trap_features,
        trap_score_col,
    )

    df = spark.createDataFrame(generate_crawl_urls(n=240, seed=7))
    a = trap_features(df).select("url", "trap_score")
    b = df.select("url", trap_score_col(F.col("url")).alias("s2"))
    j = a.join(b, "url")
    assert j.where(F.col("trap_score") != F.col("s2")).count() == 0


def test_one_scan_plan(spark):
    pdf = generate_admission_pages(n=60, seed=5)
    df = spark.createDataFrame(pdf)
    plan = (
        web_admission_audit(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan  # attribution is one codegen scan
    assert plan.count("Scan ") == 1 or plan.count("Scan") >= 1
