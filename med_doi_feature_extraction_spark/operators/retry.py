"""Category-routed retry: failure-driven incremental recompute.

DataFrame re-build of the reference's ``retry`` command
(``src/cli/commands_post.py:32-175``): failures join a small
retry-plan map (broadcast), rows whose ``retry_count`` reached the
category's ``max_retries`` are given up, survivors point-lookup their
input row (broadcast hash join on key), and rows with no input row are
marked ``missing_input`` (commands_post.py:135-139) instead of erroring.
The reference's O(failures × N) linear scans become two hash joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def route_retries(
    failures: DataFrame,
    retry_plan: dict[str, int],
    default_max_retries: int = 1,
) -> DataFrame:
    """Attach ``max_retries`` per failure category and an ``eligible``
    flag (retry_count < max_retries). ``retry_plan`` mirrors the
    reference's config ``retry_plan[category]`` lookup."""
    pairs = []
    for k, v in sorted(retry_plan.items()):
        pairs += [F.lit(k), F.lit(int(v))]
    plan_map = F.create_map(*pairs)
    max_r = F.coalesce(
        F.element_at(plan_map, F.col("failure_category")),
        F.lit(int(default_max_retries)),
    )
    return failures.withColumns(
        {
            "max_retries": max_r,
            "eligible": F.col("retry_count") < max_r,
        }
    )


def attach_input(
    failures: DataFrame, input_df: DataFrame, key: str
) -> DataFrame:
    """Broadcast point-lookup of each failure's input row; unmatched
    failures survive with ``failure_category = 'missing_input'``."""
    joined = failures.join(F.broadcast(input_df), key, "left")
    probe_col = [c for c in input_df.columns if c != key][0]
    return joined.withColumn(
        "failure_category",
        F.when(F.col(probe_col).isNull() & F.col(key).isNotNull(), F.lit("missing_input"))
        .otherwise(F.col("failure_category")),
    )
