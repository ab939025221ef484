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
