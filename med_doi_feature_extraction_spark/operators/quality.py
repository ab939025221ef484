"""Confidence / quality scoring and validity gating.

Column-expression re-build of the reference's QualityService
(``src/services/quality_service.py:20-58``): complexity bucketing
(P10), weighted input-signal presence (P11), confidence blend + clamp
(P12), and the validation predicate producing an errors array +
``valid`` flag (P13). Everything stays in whole-stage codegen; the
quarantine split (M5) is two filters over the same cached frame.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def complexity_from_len(n: Column) -> Column:
    """Length-bucket complexity from an already-computed length column
    (0 → 0.2, <500 → 0.4, <1500 → 0.7, else 0.9) — lets post-extract
    stages that pruned the text (keeping only text_len) route without
    re-materializing the payload."""
    n = F.coalesce(n, F.lit(0))
    return (
        F.when(n == 0, 0.2)
        .when(n < 500, 0.4)
        .when(n < 1500, 0.7)
        .otherwise(0.9)
    )


def complexity_score(text: Column) -> Column:
    """Length-bucket complexity (quality_service.py:20-30 semantics)."""
    return complexity_from_len(F.length(text))


def input_quality(signals: dict[str, float]) -> Column:
    """Σ weight·present(col) / Σ weight over configured signal columns
    (quality_service.py:32-47; weights from pipeline config)."""
    total = sum(signals.values())
    acc = F.lit(0.0)
    for col_name, w in sorted(signals.items()):
        present = F.col(col_name).isNotNull() & (
            F.length(F.col(col_name).cast("string")) > 0
        )
        acc = acc + F.when(present, F.lit(float(w))).otherwise(F.lit(0.0))
    return F.round(acc / F.lit(float(total)), 6)


def blend_confidence(model_conf: Column, input_q: Column) -> Column:
    """clamp(0.6·model + 0.4·input, 0, 1) (quality_service.py:48-50)."""
    blended = 0.6 * model_conf + 0.4 * input_q
    return F.round(F.least(F.lit(1.0), F.greatest(F.lit(0.0), blended)), 6)


def validate(conf: Column, min_threshold: float = 0.5) -> tuple[Column, Column]:
    """(errors array, valid flag) — low_confidence is the only engine-
    level error class (quality_service.py:52-58)."""
    errors = F.when(
        conf < min_threshold, F.array(F.lit("low_confidence"))
    ).otherwise(F.array().cast("array<string>"))
    return errors, F.size(errors) == 0


def logprob_confidence(avg_logprob: Column) -> Column:
    """P15: the reference's 4-segment piecewise logprob→confidence map
    (``src/providers/openai_provider.py:185-220``) as one Column
    expression. avg_prob = exp(mean token logprob); null logprobs →
    the reference's 1.0 default."""
    p = F.exp(avg_logprob)
    conf = (
        F.when(p >= 0.8, F.lit(0.85) + (p - 0.8) * 0.75)   # 0.85–1.0
        .when(p >= 0.5, F.lit(0.65) + (p - 0.5) * 0.67)     # 0.65–0.85
        .when(p >= 0.3, F.lit(0.45) + (p - 0.3) * 1.0)      # 0.45–0.65
        .otherwise(p * 1.5)                                  # 0–0.45
    )
    clamped = F.least(F.lit(1.0), F.greatest(F.lit(0.0), conf))
    return F.when(avg_logprob.isNull(), F.lit(1.0)).otherwise(clamped)


def finish_penalty(finish_reason: Column) -> Column:
    """P16: finish-reason penalty (openai_provider.py:168-183):
    stop → 1.0, length → 0.7, content_filter → 0.3, other → 0.9."""
    return (
        F.when(finish_reason == "stop", F.lit(1.0))
        .when(finish_reason == "length", F.lit(0.7))
        .when(finish_reason == "content_filter", F.lit(0.3))
        .otherwise(F.lit(0.9))
    )


def model_confidence(
    avg_logprob: Column,
    finish_reason: Column | None = None,
    refusal: Column | None = None,
    multiplier: float = 1.0,
) -> Column:
    """P15–P17 combined, exactly the reference's composition
    (openai_provider.py:222-227): logprob_confidence × finish_penalty
    × model multiplier, clamped to [0,1]; refusal short-circuits to
    0.0 (P17)."""
    base = logprob_confidence(avg_logprob)
    if finish_reason is not None:
        base = base * finish_penalty(finish_reason)
    adjusted = F.least(
        F.lit(1.0), F.greatest(F.lit(0.0), base * F.lit(float(multiplier)))
    )
    if refusal is not None:
        adjusted = F.when(refusal, F.lit(0.0)).otherwise(adjusted)
    return F.round(adjusted, 6)


def quarantine_split(df: DataFrame, valid_col: str = "valid") -> tuple[DataFrame, DataFrame]:
    """(valid rows, quarantined rows) — failures never kill the job
    (M5 semantics; mirrors the reference's failures_*.jsonl stream)."""
    return df.filter(F.col(valid_col)), df.filter(~F.col(valid_col))
