"""Flagship feature pipeline: pages → features (FIXTURES.md F2 shape).

This is the Spark restatement of the reference's per-record
extract-and-classify loop (reference ``src/engine.py:91-168``): one
declarative DataFrame expression DAG — scan → vectorized text
extraction → JVM-side regex feature maps → one entity window for
lag/ffill/session features → optional point-in-time dimension join →
lineage stamp. Catalyst owns the physical plan; the only Python is the
single Arrow-batched HTML kernel.

Column-pruning discipline: ``html`` is projected away immediately
after the kernel so parquet scans of downstream stages never carry
multi-MB blobs (SURVEY.md §4.2/§7.3).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from med_doi_feature_extraction_spark.kernels import features as feat
from med_doi_feature_extraction_spark.kernels.html_text import (
    KERNEL_VERSION,
    extract_text_series,
)
from med_doi_feature_extraction_spark.operators.asof import asof_join_window
from med_doi_feature_extraction_spark.operators.windows import (
    forward_fill,
    sessionize,
    with_lag_lead,
)

PIPELINE_VERSION = f"page_features/{KERNEL_VERSION}"


@dataclass(frozen=True)
class FeatureConfig:
    """The declarative "query" — successor of the reference's YAML
    pipeline config (``ConfigSchema``, reference ``src/config/
    schema.py:93-110``): a frozen spec that compiles to a DataFrame
    expression tree."""

    session_gap_seconds: int = 3600
    lag_k: int = 1
    rolling_rows: int = 0  # 0 = disabled
    include_labels: bool = False  # lead() training labels
    dim_value_cols: tuple[str, ...] = ("rank_score", "category")
    dim_tiebreak: tuple[str, ...] = ("rank_score", "category")
    run_id: str = "adhoc"
    extra: dict = field(default_factory=dict, compare=False)


_text_udf = F.pandas_udf(extract_text_series, T.StringType())


def extract_stage(pages: DataFrame) -> DataFrame:
    """Scan-side stage: decode html → canonical text, regex feature
    maps, then PRUNE the blob column."""
    return (
        pages.withColumn("text_extracted", _text_udf("html"))
        .drop("html")
        .withColumns(
            {
                "text_len": F.length("text_extracted").cast("int"),
                "doi_count": feat.doi_count(F.col("text_extracted")),
                "doi_first": feat.doi_first(F.col("text_extracted")),
                "domain": F.parse_url("url", F.lit("HOST")),
            }
        )
    )


def window_stage(df: DataFrame, cfg: FeatureConfig) -> DataFrame:
    """All per-url temporal features over ONE shuffle on url."""
    df = with_lag_lead(
        df, "url", "warc_ts", {"text_len": "text_len"},
        k=cfg.lag_k, include_lead=cfg.include_labels,
    )
    df = forward_fill(df, "url", "warc_ts", ["lang"])
    df = sessionize(df, "url", "warc_ts", cfg.session_gap_seconds)
    if cfg.rolling_rows:
        from med_doi_feature_extraction_spark.operators.windows import rolling

        df = rolling(df, "url", "warc_ts", "text_len", n_rows=cfg.rolling_rows)
    return df


def lineage_stage(df: DataFrame, cfg: FeatureConfig) -> DataFrame:
    return df.withColumn(
        "lineage",
        F.struct(
            F.spark_partition_id().alias("partition_id"),
            F.lit(PIPELINE_VERSION).alias("kernel_version"),
            F.lit(cfg.run_id).alias("run_id"),
        ),
    )


def page_features(
    pages: DataFrame,
    dim: DataFrame | None = None,
    cfg: FeatureConfig = FeatureConfig(),
) -> DataFrame:
    """Full flagship pipeline. ``dim`` (FIXTURES.md F3) is optional;
    when present, point-in-time join on (domain, obs_ts <= warc_ts)."""
    df = window_stage(extract_stage(pages), cfg)
    if dim is not None:
        df = asof_join_window(
            df, dim, "domain", "warc_ts", "obs_ts",
            list(cfg.dim_value_cols), right_tiebreak=list(cfg.dim_tiebreak),
        )
    return lineage_stage(df.drop("text"), cfg)
