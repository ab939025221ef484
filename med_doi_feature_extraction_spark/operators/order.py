"""Total-order primitives that never funnel the data through one
reducer.

``ROW_NUMBER() OVER (ORDER BY ...)`` — an empty OVER partition — is
the classic scale trap: Spark plans it as a SINGLE-partition window,
so 10^12 rows converge on one task. The curation pipeline needs
global positions anyway (stable corpus ordinals, deterministic
skip/limit pagination, rank-based budget cuts), so this module gives
the distributed construction:

1. ``repartitionByRange(order_cols)`` — range exchange, each
   partition holds a contiguous key range (sampled bounds; sampling
   affects only the SPLIT, never the numbering, because step 3's
   offsets are computed from actual partition sizes).
2. one bounded job: per-partition row counts (``n_partitions`` rows
   to the driver — same legitimacy class as the IVF-centroid /
   bloom-bitmap collects).
3. prefix-sum the counts into per-partition offsets, then number
   within partitions (sort bounded by partition size) and add the
   offset: ``global_rn = offset[pid] + local_rn``.

The result is identical to the single-reducer window whenever
``order_cols`` is a TOTAL order (enforce a tiebreak column — same
contract as every deterministic operator here), which is what the
DuckDB oracle checks hash-for-hash.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    order_cols: Sequence[str],
    name: str = "rn",
    num_partitions: int | None = None,
    start: int = 1,
) -> DataFrame:
    """Add a 1-based (``start``-based) global row number under the
    total order ``order_cols`` — distributed as described in the
    module doc; no single-reducer stage anywhere.

    ``order_cols`` must be a total order (include a unique tiebreak);
    with duplicate full sort keys the numbering among equal rows
    would depend on the range split. The ranged frame is persisted
    for the two passes (counts, then numbering) and unpersisted by
    the caller's action lifecycle — at corpus scale prefer writing
    the ranged frame once and numbering off that materialization.
    """
    cols = [F.col(c) for c in order_cols]
    # no sortWithinPartitions here: the numbering window sorts within
    # its own partitions anyway; sorting twice would be pure waste
    ranged = df.repartitionByRange(
        *([num_partitions] if num_partitions else []), *cols
    ).withColumn("_pid", F.spark_partition_id())
    ranged = ranged.persist()
    counts = {
        r["_pid"]: r["n"]
        for r in ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, start
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    # offset lookup as a plan literal map: n_partitions entries, no join
    omap = F.create_map(
        *[F.lit(x) for pid in sorted(offsets) for x in (pid, offsets[pid])]
    )
    w = Window.partitionBy("_pid").orderBy(*cols)
    out = ranged.withColumn(
        name,
        (omap[F.col("_pid")] + F.row_number().over(w) - 1).cast("long"),
    ).drop("_pid")
    return out


def skip_limit_ranged(
    df: DataFrame,
    order_cols: Sequence[str],
    skip: int,
    limit: int,
    name: str = "rn",
) -> DataFrame:
    """Deterministic pagination under a total order via
    :func:`global_row_number` — the S3 skip/limit semantics without
    the single-partition window."""
    rn = global_row_number(df, order_cols, name=name)
    return rn.filter(
        (F.col(name) > skip) & (F.col(name) <= skip + limit)
    )


def global_cumsum(
    df: DataFrame,
    order_cols: Sequence[str],
    sum_cols: Sequence[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Add inclusive global running totals ``<c>_cum`` (one per
    ``sum_cols`` entry, integral columns) under the total order
    ``order_cols`` — the prefix-sum generalization of
    :func:`global_row_number`, built the same way so a corpus-sized
    cumulative never funnels through one reducer:

    1. range exchange on ``order_cols``;
    2. ONE bounded job: per-partition SUMS of each ``sum_cols``
       column (``n_partitions`` rows to the driver — the sanctioned
       bounded-collect class);
    3. exclusive-prefix the partition sums into per-partition offsets
       (a plan-literal map, no join), then an in-partition running
       window plus the offset.

    Identical to ``SUM(c) OVER (ORDER BY order_cols ROWS UNBOUNDED
    PRECEDING)`` whenever ``order_cols`` is a total order, which is
    what the DuckDB oracle checks hash-for-hash (ks_drift). NULLs in
    ``sum_cols`` count as 0.
    """
    cols = [F.col(c) for c in order_cols]
    ranged = df.repartitionByRange(
        *([num_partitions] if num_partitions else []), *cols
    ).withColumn("_pid", F.spark_partition_id())
    ranged = ranged.persist()
    part_sums = {
        r["_pid"]: r
        for r in ranged.groupBy("_pid")
        .agg(
            *[
                F.sum(F.coalesce(F.col(c), F.lit(0))).alias(c)
                for c in sum_cols
            ]
        )
        .collect()
    }
    w = (
        Window.partitionBy("_pid")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = ranged
    for c in sum_cols:
        acc = 0
        offsets = {}
        for pid in sorted(part_sums):
            offsets[pid] = acc
            acc += part_sums[pid][c] or 0
        omap = F.create_map(
            *[
                F.lit(x)
                for pid in sorted(offsets)
                for x in (pid, offsets[pid])
            ]
        )
        out = out.withColumn(
            f"{c}_cum",
            (
                F.coalesce(omap[F.col("_pid")], F.lit(0))
                + F.sum(F.coalesce(F.col(c), F.lit(0))).over(w)
            ).cast("long"),
        )
    return out.drop("_pid")
