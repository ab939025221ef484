"""Session audit: shuffle-free counters + session summary.

Re-expression of the reference's AuditService (``src/services/
audit_service.py``): its per-record counter increments (total /
succeeded / failed / cost) become ``DataFrame.observe`` metrics —
accumulated task-side during the SAME action that produces the output,
no extra pass, no shuffle (SURVEY.md A1/A2). The session summary JSON
(``src/models.py:58-67``) becomes one finalize record including
wall-clock throughput, appended next to the checkpoint manifest.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


# P14/A7: the reference's model price table (config/settings.base.yaml:
# 22-48) — (input, output) USD per 1M tokens per routed tier.
MODEL_PRICES: dict[str, tuple[float, float]] = {
    "nano": (0.05, 0.40),
    "mini": (0.25, 2.00),
    "full": (1.25, 10.00),
}


def record_cost(
    tier: F.Column | str,
    tokens_in: F.Column,
    tokens_out: F.Column,
    prices: dict[str, tuple[float, float]] | None = None,
) -> F.Column:
    """Per-record USD cost (reference cli/helpers.py:343-377):
    tokens/1M × the routed tier's price, input + output. Pure Column
    arithmetic — composes with ``route_by_complexity`` and the audit
    observer's ``cost_col``.

    A tier value absent from the price table (including NULL) RAISES at
    execution time instead of yielding a NULL cost that ``sum()`` would
    silently skip — cost totals must fail loudly, never undercount."""
    prices = prices or MODEL_PRICES
    tier = F.col(tier) if isinstance(tier, str) else tier
    in_p: F.Column | None = None
    out_p: F.Column | None = None
    for name, (pi, po) in sorted(prices.items()):
        in_p = (
            F.when(tier == name, F.lit(pi))
            if in_p is None
            else in_p.when(tier == name, F.lit(pi))
        )
        out_p = (
            F.when(tier == name, F.lit(po))
            if out_p is None
            else out_p.when(tier == name, F.lit(po))
        )
    unknown = F.raise_error(
        F.concat(
            F.lit("record_cost: tier not in price table: "),
            F.coalesce(tier.cast("string"), F.lit("NULL")),
        )
    ).cast("double")
    in_p = in_p.otherwise(unknown)
    out_p = out_p.otherwise(unknown)
    return (tokens_in / F.lit(1e6)) * in_p + (tokens_out / F.lit(1e6)) * out_p


@dataclass
class SessionSummary:
    session_id: str
    total: int
    succeeded: int
    failed: int
    cost_total: float
    wall_seconds: float
    docs_per_sec: float
    started_at: float
    finished_at: float


class SessionAudit:
    """Attach observation metrics to a result frame, then finalize
    after the action ran."""

    def __init__(self, session_id: str) -> None:
        self.session_id = session_id
        self._obs = Observation(f"session_{session_id}")
        self._t0 = time.time()

    def attach(
        self,
        df: DataFrame,
        valid_col: str = "valid",
        cost_col: str | None = None,
    ) -> DataFrame:
        valid = (
            F.col(valid_col).cast("int")
            if valid_col in df.columns
            else F.lit(1)
        )
        metrics = [
            F.count(F.lit(1)).alias("total"),
            F.sum(valid).alias("succeeded"),
            F.sum(1 - valid).alias("failed"),
            (
                F.sum(cost_col) if cost_col and cost_col in df.columns else F.lit(0.0)
            ).alias("cost_total"),
        ]
        return df.observe(self._obs, *metrics)

    def finalize(self) -> SessionSummary:
        """Call AFTER an action consumed the attached frame."""
        got = self._obs.get
        t1 = time.time()
        wall = max(t1 - self._t0, 1e-9)
        total = int(got["total"])
        return SessionSummary(
            session_id=self.session_id,
            total=total,
            succeeded=int(got["succeeded"] or 0),
            failed=int(got["failed"] or 0),
            cost_total=float(got["cost_total"] or 0.0),
            wall_seconds=round(wall, 3),
            docs_per_sec=round(total / wall, 1),
            started_at=self._t0,
            finished_at=t1,
        )

    def write_summary(self, out_dir: str) -> str:
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, f"session_{self.session_id}.json")
        with open(path, "w", encoding="utf-8") as fh:
            json.dump(asdict(self.finalize()), fh, indent=2)
        return path
