"""Post-hoc quality validation report (reference ``validate`` command,
``src/cli/commands_post.py:179-256``).

The reference scans a directory of per-record YAML files in a Python
loop; here the finished run is a table and the whole report is ONE
aggregation pass: confidence distribution (avg + high/medium/low
bands, thresholds 0.7/0.5 as in the reference) and per-field non-empty
coverage. Conditional-sum aggregates → a single shuffle-free reduce;
no per-record driver work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HIGH_CONF = 0.7
LOW_CONF = 0.5


def validate_report(
    df: DataFrame,
    field_cols: list[str],
    conf_col: str = "confidence",
) -> dict:
    """One-pass quality report: {total, avg_confidence, high/medium/
    low counts, coverage: {field: {count, pct}}}."""
    conf = F.col(conf_col)
    aggs = [
        F.count(F.lit(1)).alias("total"),
        F.round(F.avg(conf), 6).alias("avg_confidence"),
        F.sum(F.when(conf >= HIGH_CONF, 1).otherwise(0)).alias("high"),
        F.sum(
            F.when((conf >= LOW_CONF) & (conf < HIGH_CONF), 1).otherwise(0)
        ).alias("medium"),
        F.sum(F.when(conf < LOW_CONF, 1).otherwise(0)).alias("low"),
    ]
    for c in field_cols:
        present = F.col(c).isNotNull() & (
            F.length(F.col(c).cast("string")) > 0
        )
        aggs.append(F.sum(F.when(present, 1).otherwise(0)).alias(f"cov_{c}"))
    row = df.agg(*aggs).collect()[0].asDict()
    total = int(row["total"] or 0)

    def pct(n: int) -> float:
        return round(100.0 * n / total, 1) if total else 0.0

    return {
        "total": total,
        "avg_confidence": float(row["avg_confidence"] or 0.0),
        "high": int(row["high"] or 0),
        "medium": int(row["medium"] or 0),
        "low": int(row["low"] or 0),
        "high_pct": pct(int(row["high"] or 0)),
        "medium_pct": pct(int(row["medium"] or 0)),
        "low_pct": pct(int(row["low"] or 0)),
        "coverage": {
            c: {"count": int(row[f"cov_{c}"] or 0), "pct": pct(int(row[f"cov_{c}"] or 0))}
            for c in field_cols
        },
    }
