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


def test_filter_matches_audit(spark):
    from med_doi_feature_extraction_spark.operators.admission import (
        web_admission_filter,
    )

    pdf = generate_admission_pages(n=180, seed=9)
    df = spark.createDataFrame(pdf)
    survivors = web_admission_filter(df)
    audit = web_admission_audit(df)
    assert survivors.count() == audit.where("kept").count()
    assert set(survivors.columns) == set(df.columns)  # payload kept
    plan = survivors._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # one-scan conjunction, no self-join


def test_curate_cli_admission(spark, tmp_path):
    """CLI surface: the admission op inside cmd_curate drops exactly
    the audit's non-kept rows and records per-stage counters."""
    import argparse

    from med_doi_feature_extraction_spark.__main__ import cmd_curate

    pdf = generate_admission_pages(n=90, seed=13)
    pdf = pdf.assign(doc_id=range(len(pdf)))
    inp = str(tmp_path / "in.parquet")
    outp = str(tmp_path / "out.parquet")
    spark.createDataFrame(pdf).write.parquet(inp)
    args = argparse.Namespace(
        input=inp, output=outp, ops="admission", id_col="doc_id",
        text_col="text", master="local[4]", url_col="url",
        html_col="html", lang_col="lang", redact=False,
        max_dup_frac=None, jaccard=0.7, bench=None,
        bench_text_col=None, ngram=8, min_hits=1, min_words=50,
        min_lines=3, labels=None, label_col="label",
        label_text_col=None, keep_class=None, min_margin=None,
        sample_rate=0.5, salt="s", eval_frac=0.1, split_salt="t",
    )
    res = cmd_curate(args)
    kept = web_admission_audit(
        spark.createDataFrame(pdf)
    ).where("kept").count()
    assert res["rows_out"] == kept
    assert res["rows_in"] == len(pdf)
    assert res["ops"] == ["admission"]
    assert spark.read.parquet(outp).count() == kept
