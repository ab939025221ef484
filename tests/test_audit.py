"""Observation-based session audit (A1/A2) + YAML pipeline spec file."""

from __future__ import annotations

import json
import os

import pandas as pd
from pyspark.sql import functions as F

from med_doi_feature_extraction_spark.audit import SessionAudit
from med_doi_feature_extraction_spark.plans.config import load_pipeline_spec


def test_session_audit_counters(spark, tmp_path):
    df = spark.createDataFrame(
        pd.DataFrame(
            {"k": list("abcd"), "valid": [True, True, False, True], "cost": [0.1] * 4}
        )
    )
    audit = SessionAudit("s1")
    observed = audit.attach(df, valid_col="valid", cost_col="cost")
    observed.write.format("noop").mode("overwrite").save()  # the action
    path = audit.write_summary(str(tmp_path))
    summary = json.load(open(path))
    assert summary["total"] == 4
    assert summary["succeeded"] == 3
    assert summary["failed"] == 1
    assert abs(summary["cost_total"] - 0.4) < 1e-9
    assert summary["docs_per_sec"] > 0


def test_record_cost_unknown_tier_raises(spark):
    """ADVICE r2: a tier missing from the price table must fail loudly
    at execution, not contribute a silently-skipped NULL to sum()."""
    import pytest

    from med_doi_feature_extraction_spark.audit import record_cost

    df = spark.createDataFrame(
        pd.DataFrame({"tier": ["nano", "mini", "full"], "ti": [1e6] * 3, "to": [1e6] * 3})
    )
    ok = df.select(
        record_cost(F.col("tier"), F.col("ti"), F.col("to")).alias("c")
    ).toPandas()
    assert abs(sorted(ok.c)[0] - 0.45) < 1e-9  # nano: 0.05 + 0.40
    bad = spark.createDataFrame(
        pd.DataFrame({"tier": ["nano", "turbo"], "ti": [1e6] * 2, "to": [1e6] * 2})
    )
    with pytest.raises(Exception, match="tier not in price table"):
        bad.select(
            record_cost(F.col("tier"), F.col("ti"), F.col("to")).alias("c")
        ).collect()
    null_tier = spark.createDataFrame(
        pd.DataFrame({"tier": ["nano", None], "ti": [1e6] * 2, "to": [1e6] * 2})
    )
    with pytest.raises(Exception, match="tier not in price table"):
        null_tier.select(
            record_cost(F.col("tier"), F.col("ti"), F.col("to")).alias("c")
        ).collect()


def test_repo_pipeline_yaml_loads():
    os.environ["RUN_ID"] = "test-run"
    spec = load_pipeline_spec("config/pipelines/pages_features.yaml")
    assert spec.name == "pages_features"
    assert spec.run_id == "test-run"
    assert spec.execution.n_buckets == 64  # from include
    assert spec.window.session_gap_seconds == 3600
