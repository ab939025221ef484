"""Kernel cascade (M2/M3) and reference-pipeline compilation (F4)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from med_doi_feature_extraction_spark.operators.cascade import (
    KernelTier,
    cascade,
    route_by_complexity,
)
from med_doi_feature_extraction_spark.plans.compile import (
    FieldSpec,
    RefPipelineSpec,
    compile_reference_pipeline,
    regex_doi_extractor,
)


def test_route_by_complexity(spark):
    df = spark.createDataFrame(pd.DataFrame({"c": [0.1, 0.5, 0.79, 0.9]}))
    out = df.withColumn("tier", route_by_complexity(F.col("c"))).toPandas()
    assert list(out.tier) == ["nano", "mini", "mini", "full"]


def test_cascade_early_stop(spark):
    """Cheap tier settles easy rows; expensive tier only sees the rest;
    unsolved rows keep last tier's output (quarantine-able)."""
    df = spark.createDataFrame(
        pd.DataFrame({"key": ["a", "b", "c"], "x": [10.0, 1.0, -5.0]})
    )
    cheap = KernelTier(
        "cheap",
        apply=lambda d: d.withColumn("y", F.col("x") * 2),
        confidence=lambda d: F.when(F.col("x") > 5, 0.9).otherwise(0.2),
    )
    expensive = KernelTier(
        "expensive",
        apply=lambda d: d.withColumn("y", F.col("x") * 3),
        confidence=lambda d: F.when(F.col("x") > 0, 0.8).otherwise(0.1),
    )
    out = cascade(df, [cheap, expensive], min_confidence=0.5, keys=["key"]).toPandas()
    out = out.set_index("key")
    assert out.loc["a"].kernel_used == "cheap" and out.loc["a"].y == 20
    assert out.loc["b"].kernel_used == "expensive" and out.loc["b"].y == 3
    # c fails both: carries last tier output + low confidence
    assert out.loc["c"].kernel_used == "expensive"
    assert out.loc["c"].kernel_confidence < 0.5


def test_compile_reference_pipeline(spark):
    """The reference's country/doi pipeline shape end-to-end: rename,
    key coalesce+sanitize, extract, normalize with synonyms, score,
    validate, quarantine."""
    raw = spark.createDataFrame(
        pd.DataFrame(
            {
                "doi_raw": ["10.1234/a/b", None, "10.9/x"],
                "Abstract": ["t " * 300, "see 10.5555/xyz.1 here", ""],
                "Country Raw": [" usa ", "Deutschland", "Nowhere"],
            }
        )
    )
    spec = RefPipelineSpec(
        name="country",
        column_map={"Country Raw": "country_text", "doi_raw": "DOI"},
        id_column="DOI",
        fields={
            "country": FieldSpec(
                choices=["USA", "Germany"],
                synonyms={"Germany": ["Deutschland"]},
            )
        },
        input_signals={"Abstract": 0.7, "country_text": 0.3},
        min_confidence_threshold=0.5,
    )

    def extractor(df):
        return df.withColumn("extracted_country", F.col("country_text"))

    valid, quarantined = compile_reference_pipeline(raw, spec, extractor)
    v = valid.toPandas().set_index("key")
    # row with null DOI dropped by require-key (reference S7)
    assert len(v) + quarantined.count() == 2
    assert "10.1234_a_b" in v.index  # key sanitized / -> _
    assert v.loc["10.1234_a_b"].normalized_country == "USA"
    assert v.loc["10.9_x"].normalized_country == "Nowhere"  # passthrough
    assert (v.confidence >= 0.5).all()


def test_regex_doi_extractor(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"DOI": ["k1", "k2"], "Abstract": ["see 10.1234/ab.1", "none"]})
    )
    out = regex_doi_extractor(["Abstract"])(df).toPandas()
    assert list(out.extracted_doi) == ["10.1234/ab.1", None]


def test_cascade_expensive_tier_runs_on_pending_only(spark):
    """VERDICT r1 #6: the expensive kernel must be applied exactly to
    the rows the cheap tier failed to settle — never re-run on the
    full input — and the cheap kernel must not be recomputed when the
    result is consumed (tier outputs are materialized between tiers)."""
    sc = spark.sparkContext
    cheap_calls = sc.accumulator(0)
    exp_calls = sc.accumulator(0)
    n = 1000

    df = spark.range(n).withColumn("x", (F.col("id") % 10).cast("double"))

    def counted(acc, factor):
        def apply(d):
            from pyspark.sql import types as T

            def fn(it):
                for pdf in it:
                    acc.add(len(pdf))
                    pdf = pdf.copy()
                    pdf["y"] = pdf["x"] * factor
                    yield pdf

            schema = T.StructType(
                d.schema.fields + [T.StructField("y", T.DoubleType())]
            )
            return d.mapInPandas(fn, schema)

        return apply

    cheap = KernelTier(
        "cheap", apply=counted(cheap_calls, 2.0),
        confidence=lambda d: F.when(F.col("x") >= 5, 0.9).otherwise(0.1),
    )
    expensive = KernelTier(
        "expensive", apply=counted(exp_calls, 3.0),
        confidence=lambda d: F.lit(0.8),
    )
    out = cascade(df, [cheap, expensive], min_confidence=0.5, keys=["id"])
    assert out.count() == n
    # x in {0..9}: half settle at the cheap tier, half escalate
    assert cheap_calls.value == n
    assert exp_calls.value == n // 2


def test_model_confidence_matches_reference_math(spark):
    """Column P15-P17 == a direct python port of the reference's
    _calculate_confidence (openai_provider.py:146-227)."""
    import math

    from med_doi_feature_extraction_spark.operators.quality import (
        model_confidence,
    )

    def ref_conf(avg_logprob, finish_reason, refusal, multiplier=0.95):
        if refusal:
            return 0.0
        if finish_reason == "length":
            fp = 0.7
        elif finish_reason == "content_filter":
            fp = 0.3
        elif finish_reason == "stop":
            fp = 1.0
        else:
            fp = 0.9
        lc = 1.0
        if avg_logprob is not None:
            p = math.exp(avg_logprob)
            if p >= 0.8:
                lc = 0.85 + (p - 0.8) * 0.75
            elif p >= 0.5:
                lc = 0.65 + (p - 0.5) * 0.67
            elif p >= 0.3:
                lc = 0.45 + (p - 0.3) * 1.0
            else:
                lc = p * 1.5
            lc = min(max(lc, 0.0), 1.0)
        return round(min(max(lc * fp * multiplier, 0.0), 1.0), 6)

    rows = []
    for i, lp in enumerate(
        [None, -0.01, -0.1, -0.223, -0.5, -0.69, -0.7, -1.2, -2.5, -5.0]
    ):
        for j, fr in enumerate(["stop", "length", "content_filter", "weird"]):
            rows.append(
                {"i": len(rows), "lp": lp, "fr": fr, "refusal": (i + j) % 7 == 0}
            )
    pdf = pd.DataFrame(rows)
    df = spark.createDataFrame(pdf)
    got = (
        df.withColumn(
            "conf",
            model_confidence(F.col("lp"), F.col("fr"), F.col("refusal"), 0.95),
        )
        .toPandas()
        .set_index("i")
    )
    for _, r in pdf.iterrows():
        exp = ref_conf(r.lp if pd.notna(r.lp) else None, r.fr, r.refusal)
        assert abs(got.loc[r.i, "conf"] - exp) < 1e-9, (r.lp, r.fr, r.refusal)
