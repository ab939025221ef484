"""Key-based upsert and anti-join resume primitives.

Re-expression of the reference's CSV aggregate upsert (read → drop
rows with same key → append → rewrite; ``src/services/
output_handler.py:57-71``) and skip-if-done dedupe (``src/engine.py:
98-104``) as set algebra: MERGE degrades to anti-join + unionByName on
plain Parquet (Iceberg MERGE INTO is a one-function swap here —
SURVEY.md §7.3).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def upsert(existing: DataFrame, delta: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Rows of ``delta`` replace same-key rows of ``existing``;
    everything else is kept. Pure transform — caller owns the atomic
    write (overwrite staging dir or Iceberg MERGE)."""
    kept = existing.join(delta.select(*keys).distinct(), list(keys), "left_anti")
    return kept.unionByName(delta.select(existing.columns))


def skip_done(pending: DataFrame, done_keys: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Resume primitive: drop rows whose key already appears in the
    checkpoint manifest (reference's per-key output-file existence
    check, as a left-anti join)."""
    return pending.join(done_keys.select(*keys).distinct(), list(keys), "left_anti")


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Corpus CDC between two snapshots: per key, emit ``status`` ∈
    {added, removed, changed, unchanged} comparing ``compare_cols``
    null-safely (a continuously-refreshed 10^12-doc corpus is
    maintained by diffing crawls, not rebuilding — the diff drives
    incremental dedup/feature refresh downstream).

    One full-outer shuffle join on the keys (AQE handles skew); the
    comparison is null-safe equality (``<=>``) so NULL→NULL is
    unchanged and NULL→value is changed. Returns the keys + status +
    both sides' compare columns (``{col}_old`` / ``{col}_new``)."""
    from pyspark.sql import functions as F

    keys = list(keys)
    o = old.select(
        *keys, *[F.col(c).alias(f"{c}_old") for c in compare_cols]
    ).withColumn("_in_old", F.lit(True))
    n = new.select(
        *keys, *[F.col(c).alias(f"{c}_new") for c in compare_cols]
    ).withColumn("_in_new", F.lit(True))
    joined = o.join(n, on=keys, how="full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"{c}_old").eqNullSafe(F.col(f"{c}_new"))
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.withColumn("status", status).drop("_in_old", "_in_new")
