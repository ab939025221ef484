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


def validate_report_agg(
    df: DataFrame,
    field_cols: list[str],
    conf_col: str = "confidence",
) -> DataFrame:
    """The report as a ONE-ROW aggregate frame (the SQL-expressible
    core of ``validate_report``; exposed separately so the driver's
    DuckDB oracle can check it). Confidence sums go through exact
    DECIMAL so the cross-row average is order-independent."""
    conf = F.col(conf_col)
    total = F.count(F.lit(1))
    sum_conf = F.sum(conf.cast("decimal(18,6)"))
    aggs = [
        total.cast("long").alias("total"),
        F.round(sum_conf.cast("double") / total, 6).alias("avg_confidence"),
        F.sum(F.when(conf >= HIGH_CONF, 1).otherwise(0))
        .cast("long").alias("high"),
        F.sum(
            F.when((conf >= LOW_CONF) & (conf < HIGH_CONF), 1).otherwise(0)
        ).cast("long").alias("medium"),
        F.sum(F.when(conf < LOW_CONF, 1).otherwise(0)).cast("long").alias("low"),
    ]
    for c in field_cols:
        present = F.col(c).isNotNull() & (
            F.length(F.col(c).cast("string")) > 0
        )
        aggs.append(
            F.sum(F.when(present, 1).otherwise(0)).cast("long").alias(f"cov_{c}")
        )
    return df.agg(*aggs)


def validate_report(
    df: DataFrame,
    field_cols: list[str],
    conf_col: str = "confidence",
) -> dict:
    """One-pass quality report: {total, avg_confidence, high/medium/
    low counts, coverage: {field: {count, pct}}}."""
    row = validate_report_agg(df, field_cols, conf_col).collect()[0].asDict()
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
