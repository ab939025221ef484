"""Upsert, normalization, quality gates, retry routing."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from med_doi_feature_extraction_spark.operators.normalize import normalize
from med_doi_feature_extraction_spark.operators.quality import (
    blend_confidence,
    complexity_score,
    input_quality,
    quarantine_split,
    validate,
)
from med_doi_feature_extraction_spark.operators.retry import attach_input, route_retries
from med_doi_feature_extraction_spark.operators.upsert import skip_done, upsert


def test_upsert(spark):
    existing = spark.createDataFrame(
        pd.DataFrame({"key": ["a", "b", "c"], "v": [1, 2, 3]})
    )
    delta = spark.createDataFrame(pd.DataFrame({"key": ["b", "d"], "v": [20, 40]}))
    out = upsert(existing, delta, ["key"]).toPandas().set_index("key").v.to_dict()
    assert out == {"a": 1, "b": 20, "c": 3, "d": 40}


def test_skip_done(spark):
    pending = spark.createDataFrame(pd.DataFrame({"key": ["a", "b", "c"]}))
    done = spark.createDataFrame(pd.DataFrame({"key": ["b"]}))
    out = skip_done(pending, done, ["key"]).toPandas()
    assert set(out.key) == {"a", "c"}


def test_normalize_choices(spark):
    """Reference parser.py:36-63 semantics: trim/case-fold → canonical
    choice or synonym hit, else passthrough."""
    df = spark.createDataFrame(
        pd.DataFrame({"country": ["  USA ", "germany", "Deutschland", "Atlantis", "FRANCE"]})
    )
    out = normalize(
        df, "country",
        choices=["USA", "Germany", "France"],
        synonyms={"Germany": ["Deutschland", "DE"], "USA": ["United States"]},
    ).toPandas()
    assert list(out.country_norm) == ["USA", "Germany", "Germany", "Atlantis", "France"]


def test_quality_chain(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "abstract": ["", "x" * 100, "y" * 600, "z" * 2000],
                "title": ["t", None, "t", "t"],
                "model_conf": [0.9, 0.2, 0.6, 0.95],
            }
        )
    )
    df = df.withColumn("complexity", complexity_score(F.col("abstract")))
    df = df.withColumn(
        "input_q", input_quality({"abstract": 0.7, "title": 0.3})
    )
    df = df.withColumn("conf", blend_confidence(F.col("model_conf"), F.col("input_q")))
    errors, valid = validate(F.col("conf"), 0.5)
    df = df.withColumn("errors", errors).withColumn("valid", valid)
    pdf = df.toPandas()
    assert list(pdf.complexity) == [0.2, 0.4, 0.7, 0.9]
    assert list(pdf.input_q) == [0.3, 0.7, 1.0, 1.0]
    # blend: 0.6*conf + 0.4*input_q, clamped
    assert abs(pdf.conf[0] - (0.6 * 0.9 + 0.4 * 0.3)) < 1e-9
    assert list(pdf.valid) == [True, False, True, True]
    ok, bad = quarantine_split(df)
    assert ok.count() == 3 and bad.count() == 1
    assert bad.select(F.explode("errors")).first()[0] == "low_confidence"


def test_retry_routing(spark):
    failures = spark.createDataFrame(
        pd.DataFrame(
            {
                "key": ["k1", "k2", "k3", "k4"],
                "failure_category": ["parse", "timeout", "parse", "unknown_cat"],
                "retry_count": [0, 5, 3, 0],
            }
        )
    )
    routed = route_retries(failures, {"parse": 3, "timeout": 2}, default_max_retries=1)
    pdf = routed.toPandas().set_index("key")
    assert pdf.loc["k1"].eligible and pdf.loc["k1"].max_retries == 3
    assert not pdf.loc["k2"].eligible  # exceeded
    assert not pdf.loc["k3"].eligible  # 3 >= 3
    assert pdf.loc["k4"].eligible and pdf.loc["k4"].max_retries == 1

    input_df = spark.createDataFrame(
        pd.DataFrame({"key": ["k1", "k2", "k3"], "payload": ["a", "b", "c"]})
    )
    attached = attach_input(routed, input_df, "key").toPandas().set_index("key")
    assert attached.loc["k4"].failure_category == "missing_input"
    assert attached.loc["k1"].failure_category == "parse"
    assert attached.loc["k1"].payload == "a"


def test_retry_failures_end_to_end(spark):
    """Full reference `retry` semantics: recovered rows leave the
    failure manifest, still-failing rows bump retry_count, exhausted
    and missing-input rows persist unchanged."""
    from pyspark.sql import functions as F

    from med_doi_feature_extraction_spark.operators.retry import retry_failures

    failures = spark.createDataFrame(
        pd.DataFrame(
            {
                "key": ["k1", "k2", "k3", "k9"],
                "failure_category": ["parse", "parse", "timeout", "parse"],
                "retry_count": [0, 0, 5, 0],
            }
        )
    )
    input_df = spark.createDataFrame(
        pd.DataFrame({"key": ["k1", "k2", "k3"], "payload": [10, -1, 7]})
    )

    def kernel(df):
        # succeeds on positive payloads
        return df.withColumns(
            {"result": F.col("payload") * 2, "valid": F.col("payload") > 0}
        )

    recovered, new_failures = retry_failures(
        failures, input_df, "key", {"parse": 3, "timeout": 2}, kernel
    )
    rec = recovered.toPandas().set_index("key")
    nf = new_failures.toPandas().set_index("key")
    assert list(rec.index) == ["k1"] and rec.loc["k1"].result == 20
    assert set(nf.index) == {"k2", "k3", "k9"}
    assert nf.loc["k2"].retry_count == 1          # re-ran, still failing
    assert nf.loc["k3"].retry_count == 5          # exhausted, untouched
    assert nf.loc["k9"].failure_category == "missing_input"
