"""Hot-domain skew: the full pipeline on a 30%-hot-domain distribution
completes and matches the unskewed semantics (SURVEY.md §5.2.4)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from med_doi_feature_extraction_spark.operators.asof import (
    asof_join_sorted,
    asof_join_window,
)
from med_doi_feature_extraction_spark.pipeline import FeatureConfig, page_features
from med_doi_feature_extraction_spark.sources.pages import (
    domain_of_url,
    generate_dim_snapshots,
    generate_pages,
)


@pytest.fixture(scope="module")
def hot_pdf():
    return generate_pages(n_urls=200, seed=11, hot_domain_frac=0.3)


def test_hot_domain_distribution(hot_pdf):
    domains = hot_pdf.url.map(domain_of_url)
    assert domains.value_counts(normalize=True).iloc[0] > 0.25


def test_pipeline_on_skewed_input(spark, hot_pdf):
    """Row preservation + per-key correctness on the skewed table: the
    features of a url must not depend on what other domains exist."""
    pages = spark.createDataFrame(hot_pdf)
    dim = spark.createDataFrame(generate_dim_snapshots(hot_pdf, seed=12))
    out = page_features(pages, dim=dim, cfg=FeatureConfig(run_id="skew")).toPandas()
    assert len(out) == len(hot_pdf)
    # cross-check: same url's features computed on ONLY that url's rows
    hot_domain = hot_pdf.url.map(domain_of_url).value_counts().idxmax()
    one_url = hot_pdf[hot_pdf.url.map(domain_of_url) == hot_domain].url.iloc[0]
    solo = page_features(
        spark.createDataFrame(hot_pdf[hot_pdf.url == one_url]),
        dim=dim, cfg=FeatureConfig(run_id="skew"),
    ).toPandas().sort_values("warc_ts").reset_index(drop=True)
    full_slice = (
        out[out.url == one_url].sort_values("warc_ts").reset_index(drop=True)
    )
    for col in ["session_id", "text_len", "lang_ffill", "rank_score"]:
        left = full_slice[col].fillna("∅") if full_slice[col].dtype == object else full_slice[col]
        right = solo[col].fillna("∅") if solo[col].dtype == object else solo[col]
        pd.testing.assert_series_equal(left, right, check_names=False)


def test_salted_asof_on_hot_keys(spark, hot_pdf):
    """Salting the left side of the hot bucket changes nothing in the
    result (already property-tested on uniform data; this pins the
    skewed case)."""
    dim_pdf = generate_dim_snapshots(hot_pdf, seed=12)
    left = spark.createDataFrame(
        hot_pdf[["url", "warc_ts"]].assign(
            domain=hot_pdf.url.map(domain_of_url)
        )
    )
    dim = spark.createDataFrame(dim_pdf)
    base = asof_join_window(
        left, dim, "domain", "warc_ts", "obs_ts", ["rank_score"],
        right_tiebreak=["rank_score"],
    ).toPandas().sort_values(["url", "warc_ts"]).reset_index(drop=True)
    salted = asof_join_sorted(
        left, dim, "domain", "warc_ts", "obs_ts", ["rank_score"],
        right_tiebreak=["rank_score"], num_buckets=4, salt_factor=8,
    ).toPandas().sort_values(["url", "warc_ts"]).reset_index(drop=True)
    pd.testing.assert_series_equal(
        base.rank_score.round(9), salted.rank_score.round(9), check_names=False
    )
