"""Cost-routed kernel cascade with early stop — the reference's model
routing + fallback, vectorized.

Reference semantics (``src/services/llm_service.py:29-100``):
complexity score routes each record to a model tier (nano/mini/full);
``auto_fallback`` escalates a record through tiers until its
confidence clears the threshold. Per-record sequential escalation
becomes a set-at-a-time two-phase plan:

1. run the CHEAP kernel on everything,
2. keep rows whose confidence ≥ threshold,
3. run the EXPENSIVE kernel only on the remainder,
4. union.

Same results as per-record escalation (kernels are pure), but each
phase is one vectorized pass and the expensive kernel sees only the
hard subset — the same reason the reference routes by complexity:
don't pay full price for easy rows.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class KernelTier:
    """One rung of the cascade. ``apply`` adds this tier's output
    columns; ``confidence`` evaluates trust in them (0..1)."""

    name: str
    apply: Callable[[DataFrame], DataFrame]
    confidence: Callable[[DataFrame], Column]


def route_by_complexity(
    complexity: Column,
    thresholds: Sequence[float] = (0.5, 0.8),
    tiers: Sequence[str] = ("nano", "mini", "full"),
) -> Column:
    """Static routing column (llm_service.py:51-74 semantics):
    complexity < t0 → tiers[0], < t1 → tiers[1], else last."""
    expr = F.lit(tiers[-1])
    for t, name in zip(reversed(thresholds), reversed(tiers[:-1])):
        expr = F.when(complexity < t, F.lit(name)).otherwise(expr)
    return expr


def cascade(
    df: DataFrame,
    tiers: Sequence[KernelTier],
    min_confidence: float,
    keys: Sequence[str],
) -> DataFrame:
    """Run tiers in cost order with early stop; adds ``kernel_used``
    and ``kernel_confidence``. Rows failing every tier keep the LAST
    tier's output with their (low) confidence — the caller's
    validity gate quarantines them (reference re-raises the last
    error, llm_service.py:96-100; here failure is data, not control
    flow).

    Escalation is a FILTER on the materialized tier output, not an
    anti-join: each non-final tier's output is localCheckpoint'ed
    (eager), so (a) tier N's kernel runs on exactly the unsettled
    rows — never a recompute of tiers 1..N-1's upstream — and (b) no
    extra shuffle per tier. ``keys`` identify rows for callers /
    tests; the escalation itself no longer joins on them.
    """
    assert tiers, "cascade requires at least one tier"
    pending = df
    settled: DataFrame | None = None
    for i, tier in enumerate(tiers):
        pending_cols = pending.columns
        applied = tier.apply(pending).withColumns(
            {
                "kernel_used": F.lit(tier.name),
                "kernel_confidence": F.round(tier.confidence(pending), 6),
            }
        )
        is_last = i == len(tiers) - 1
        if is_last:
            ok = applied
            settled = ok if settled is None else settled.unionByName(ok)
            break
        # materialize once: the ok/escalate split below reads these
        # blocks instead of re-running this tier's (and all upstream)
        # kernels per downstream branch
        applied = applied.localCheckpoint(eager=True)
        ok = applied.filter(F.col("kernel_confidence") >= min_confidence)
        settled = ok if settled is None else settled.unionByName(ok)
        pending = applied.filter(
            F.col("kernel_confidence") < min_confidence
        ).select(*pending_cols)
    return settled
