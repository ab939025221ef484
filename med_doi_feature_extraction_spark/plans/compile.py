"""Compile a reference-shaped pipeline config into a DataFrame chain.

This is the compatibility path for users of the reference: the same
declarative spec a reference pipeline YAML carries — column_map,
id column, fields with choices/synonyms, quality signals, confidence
thresholds (e.g. ``config/pipelines/country.yaml``) — compiles to one
Spark plan implementing the reference's per-record chain
(``src/engine.py:91-168``): rename → key coalesce → extract →
normalize → score → validate → quarantine. The LLM step is replaced
by a pluggable deterministic extractor kernel (the engine's UDF
registry); everything else is built-in Column algebra.
"""

from __future__ import annotations

from collections.abc import Callable

from pydantic import BaseModel, ConfigDict, Field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from med_doi_feature_extraction_spark.operators.normalize import (
    build_lookup,
    normalize_column,
)
from med_doi_feature_extraction_spark.operators.quality import (
    blend_confidence,
    complexity_score,
    input_quality,
    validate,
)


class FieldSpec(BaseModel):
    model_config = ConfigDict(frozen=True)
    choices: list[str] = Field(default_factory=list)
    synonyms: dict[str, list[str]] = Field(default_factory=dict)
    # deterministic extraction spec (the CLI's stand-in for the
    # reference's LLM call): copy a column, or first regex match
    # across regex_cols
    source: str | None = None
    regex: str | None = None
    regex_cols: list[str] = Field(default_factory=list)


class RefPipelineSpec(BaseModel):
    """The reference's pipeline-config surface (subset that affects
    dataflow; presentation keys pass through via extra='allow')."""

    model_config = ConfigDict(frozen=True, extra="allow")
    name: str = "reference_pipeline"
    column_map: dict[str, str] = Field(default_factory=dict)
    id_column: str = "DOI"
    fields: dict[str, FieldSpec] = Field(default_factory=dict)
    input_signals: dict[str, float] = Field(default_factory=dict)
    complexity_column: str = "Abstract"
    min_confidence_threshold: float = 0.5
    require_key: bool = True
    # retry routing (reference config retry_plan[category] → max_retries)
    retry_plan: dict[str, int] = Field(default_factory=dict)
    default_max_retries: int = 1


def coalesce_key(df: DataFrame, id_column: str) -> DataFrame:
    """key = id_column ∥ DOI ∥ id, cast to string, sanitized the way
    the reference sanitizes file keys (engine.py:99: / and \\ → _)."""
    candidates = [c for c in (id_column, "DOI", "id") if c in df.columns]
    key = F.coalesce(*[F.col(c).cast("string") for c in candidates]) if candidates else F.lit(None)
    return df.withColumn("key", F.regexp_replace(key, r"[/\\]", "_"))


def apply_reference_chain(
    df: DataFrame,
    spec: RefPipelineSpec,
    extractor: Callable[[DataFrame], DataFrame],
    model_confidence: F.Column | None = None,
    shape_input: bool = True,
) -> DataFrame:
    """The full reference record chain as ONE frame with ``valid`` /
    ``errors`` / ``confidence`` columns (used directly by the CLI's
    retry kernel; ``compile_reference_pipeline`` splits it).

    ``shape_input=False`` skips rename/key-coalesce (for rows already
    shaped, e.g. failures re-joined to their input)."""
    if shape_input:
        if spec.column_map:
            df = df.withColumnsRenamed(spec.column_map)
        df = coalesce_key(df, spec.id_column)
        if spec.require_key:
            df = df.filter(F.col("key").isNotNull() & (F.length("key") > 0))

    df = extractor(df)

    for field, fs in spec.fields.items():
        col = f"extracted_{field}"
        if fs.choices and col in df.columns:
            lookup = build_lookup(fs.choices, fs.synonyms)
            df = df.withColumn(
                f"normalized_{field}", normalize_column(F.col(col), lookup)
            )
        elif col in df.columns:
            df = df.withColumn(f"normalized_{field}", F.col(col))

    df = df.withColumn("complexity", complexity_score(F.col(spec.complexity_column)))
    if spec.input_signals:
        df = df.withColumn("input_quality", input_quality(spec.input_signals))
    else:
        # reference fallback (quality_service.py:45-47): 1.0 with
        # abstract present else 0.7
        present = F.col(spec.complexity_column).isNotNull() & (
            F.length(spec.complexity_column) > 0
        )
        df = df.withColumn(
            "input_quality", F.when(present, F.lit(1.0)).otherwise(F.lit(0.7))
        )
    mc = model_confidence if model_confidence is not None else F.lit(1.0)
    df = df.withColumn("confidence", blend_confidence(mc, F.col("input_quality")))
    errors, valid = validate(F.col("confidence"), spec.min_confidence_threshold)
    return df.withColumns({"errors": errors, "valid": valid})


def compile_reference_pipeline(
    df: DataFrame,
    spec: RefPipelineSpec,
    extractor: Callable[[DataFrame], DataFrame],
    model_confidence: F.Column | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Returns (valid, quarantined).

    ``extractor`` adds one ``extracted_<field>`` column per spec field
    (the deterministic stand-in for the reference's LLM call).
    ``model_confidence`` defaults to 1.0 (pure-regex kernels are
    trusted; plug in a scoring column for fuzzier kernels).
    """
    df = apply_reference_chain(df, spec, extractor, model_confidence)
    return df.filter(F.col("valid")), df.filter(~F.col("valid"))


def regex_doi_extractor(text_cols: list[str]) -> Callable[[DataFrame], DataFrame]:
    """Deterministic extractor for the DOI pipeline: first DOI found
    across the given text columns (reference DOI-as-key domain)."""
    from med_doi_feature_extraction_spark.kernels.features import doi_first

    def apply(df: DataFrame) -> DataFrame:
        cols = [doi_first(F.col(c)) for c in text_cols if c in df.columns]
        return df.withColumn("extracted_doi", F.coalesce(*cols) if cols else F.lit(None))

    return apply
