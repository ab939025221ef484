"""Filter-funnel attribution: WHICH gate dropped each document, and
the per-stage entering/dropped/surviving funnel table.

The reference applies its quality gates record-at-a-time and logs each
verdict individually (``/root/reference/src/services/
quality_service.py`` — validate → blend → threshold per record); a
corpus-scale curation pipeline needs the aggregate view instead: an
ordered gate cascade evaluated in ONE scan, per-row first-failed
attribution, and the funnel summary that tells you which gate is
eating your corpus before you commit to a full run.

Gate semantics: a stage predicate must be affirmatively TRUE to pass —
NULL counts as a fail (unknown is not a pass), matching the keep
verdicts of c4rules/gopher. ``first_failed`` is the FIRST stage (in
the given order) whose predicate fails, NULL for survivors; later
stages are not blamed for rows an earlier stage already dropped, so
per-stage counts attribute each loss to exactly one gate.

Scale: the audit is a scan-stage projection (whole-stage codegen, all
predicates evaluated in one pass over the corpus — no per-stage
passes, no UDFs, zero shuffles). The summary adds ONE hash-agg keyed
on ``first_failed`` — cardinality ≤ n_stages+1, partial aggregation
absorbs everything map-side — then joins/windows over the resulting
≤ n_stages+1-row frame, which is negligible at any corpus size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

def _first_failed(stages: Sequence[tuple[str, Column]]) -> Column:
    """First-match CASE over the ordered gates (engine-portable: the
    DuckDB twin is the identical ``CASE WHEN NOT coalesce(p, false)``
    chain)."""
    if not stages:
        raise ValueError("funnel needs at least one stage")
    return F.coalesce(
        *[
            F.when(~F.coalesce(pred, F.lit(False)), F.lit(name))
            for name, pred in stages
        ]
    )


def funnel_audit(
    df: DataFrame,
    stages: Sequence[tuple[str, Column]],
) -> DataFrame:
    """Per-row gate attribution: all input columns plus
    ``first_failed`` (name of the first failing stage, NULL for
    survivors) and ``kept``. One codegen projection — evaluating N
    gates costs one corpus scan, not N."""
    ff = _first_failed(stages)
    return df.select(
        "*",
        ff.alias("first_failed"),
        ff.isNull().alias("kept"),
    )


def funnel_survivors(
    df: DataFrame,
    stages: Sequence[tuple[str, Column]],
) -> DataFrame:
    """Rows passing every gate — the curation filter composition as a
    single conjunction at the scan (predicate-pushdown friendly)."""
    keep = F.lit(True)
    for _, pred in stages:
        keep = keep & F.coalesce(pred, F.lit(False))
    return df.where(keep)


def funnel_summary(
    df: DataFrame,
    stages: Sequence[tuple[str, Column]],
) -> DataFrame:
    """Per-stage funnel table ``(stage_idx, stage, entering, dropped,
    surviving)`` in stage order: ``entering`` = rows reaching the
    gate, ``dropped`` = rows whose FIRST failure is this gate,
    ``surviving = entering − dropped`` (the next stage's entering).

    One corpus hash-agg on ``first_failed`` (≤ n_stages+1 groups);
    the join against the stage list, the 1-row total and the cumsum
    window all operate on that tiny aggregated frame.
    """
    spark = df.sparkSession
    counts = (
        df.select(_first_failed(stages).alias("first_failed"))
        .groupBy("first_failed")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    stage_df = spark.createDataFrame(
        [(i, name) for i, (name, _) in enumerate(stages)],
        "stage_idx: int, stage: string",
    )
    total = counts.agg(
        F.coalesce(F.sum("_n"), F.lit(0)).alias("_total")
    )
    joined = (
        stage_df.join(
            counts, stage_df.stage == counts.first_failed, "left"
        )
        .select(
            "stage_idx",
            "stage",
            F.coalesce(F.col("_n"), F.lit(0)).alias("dropped"),
        )
        .crossJoin(F.broadcast(total))
    )
    before = Window.orderBy("stage_idx").rowsBetween(
        Window.unboundedPreceding, -1
    )
    entering = F.col("_total") - F.coalesce(
        F.sum("dropped").over(before), F.lit(0)
    )
    return joined.select(
        "stage_idx",
        "stage",
        entering.alias("entering"),
        "dropped",
        (entering - F.col("dropped")).alias("surviving"),
    )
