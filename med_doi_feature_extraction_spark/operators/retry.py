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


def retry_failures(
    failures: DataFrame,
    input_df: DataFrame,
    key: str,
    retry_plan: dict[str, int],
    kernel,  # Callable[[DataFrame], DataFrame]: adds result + valid cols
    default_max_retries: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """The full reference ``retry`` command as one dataflow
    (``src/cli/commands_post.py:32-175``): route by category → drop
    exhausted rows → point-lookup input → re-run the kernel on the
    joined rows → split (recovered, still_failing). ``still_failing``
    carries ``retry_count + 1`` and is the new failures manifest
    (anti-join rewrite semantics of commands_post.py:159-161);
    exhausted and missing_input rows stay in it untouched."""
    routed = route_retries(failures, retry_plan, default_max_retries)
    eligible = attach_input(routed.filter(F.col("eligible")), input_df, key)
    exhausted = routed.filter(~F.col("eligible"))

    missing = eligible.filter(F.col("failure_category") == "missing_input")
    runnable = eligible.filter(F.col("failure_category") != "missing_input")

    rerun = kernel(runnable)
    recovered = rerun.filter(F.col("valid"))
    still = rerun.filter(~F.col("valid")).withColumn(
        "retry_count", F.col("retry_count") + 1
    )

    fail_cols = failures.columns
    new_failures = (
        still.select(*fail_cols)
        .unionByName(missing.select(*fail_cols))
        .unionByName(exhausted.select(*fail_cols))
    )
    return recovered, new_failures


def attach_input(
    failures: DataFrame, input_df: DataFrame, key: str
) -> DataFrame:
    """Broadcast point-lookup of each failure's input row; unmatched
    failures survive with ``failure_category = 'missing_input'``."""
    # explicit match flag: a probe data column would misfire when the
    # matched input row legitimately has NULL there (or not exist at
    # all when input_df is key-only)
    tagged = input_df.withColumn("_matched", F.lit(True))
    joined = failures.join(F.broadcast(tagged), key, "left")
    return joined.withColumn(
        "failure_category",
        F.when(F.col("_matched").isNull(), F.lit("missing_input"))
        .otherwise(F.col("failure_category")),
    ).drop("_matched")
