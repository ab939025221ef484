"""Data-layout clustering: Z-order (Morton) keys for multi-column
scan pruning.

At 100 TB the scan you avoid is worth more than the scan you
optimize: range-partitioning by ONE column prunes predicates on that
column only, while interleaving the bits of several columns (Morton /
Z-order — what Delta's OPTIMIZE ZORDER and Iceberg's sort-order
clustering do) gives every interleaved column partial pruning power
at once. Writing a corpus clustered by ``zorder_key(domain_hash,
warc_ts)`` means both per-domain and per-time predicates skip most
files via min/max footer stats.

Everything here is engine-portable integer Column algebra (floor-div
and mod by power-of-two literals — no shift builtins, no UDF), so the
DuckDB oracle computes the identical key and the contract query is
hash-exact. Normalization maps each column into ``bits``-bit integer
space via fixed [lo, hi) bounds — bounds are part of the layout
contract (a layout key must not depend on data statistics that shift
between appends, or re-clustering would reshuffle old files).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_to_bits(
    col: Column, lo: float, hi: float, bits: int
) -> Column:
    """Map a numeric column into [0, 2^bits) as a long: values are
    clamped to [lo, hi) then scaled. Fixed bounds, not data min/max —
    see module doc."""
    if not hi > lo:
        raise ValueError("hi must be > lo")
    span = float(hi) - float(lo)
    scaled = (col.cast("double") - F.lit(float(lo))) / F.lit(span)
    clamped = F.least(F.greatest(scaled, F.lit(0.0)), F.lit(1.0 - 2.0**-52))
    return F.floor(clamped * F.lit(float(2**bits))).cast("long")


def zorder_key(
    cols: Sequence[Column], bits: int = 16
) -> Column:
    """Morton interleave of ``len(cols)`` already-normalized
    ``bits``-bit longs: bit ``i`` of column ``j`` lands at position
    ``i * n + j``. Pure floor-div/mod algebra (bit ``i`` of x is
    ``(x div 2^i) mod 2``), unrolled ``bits × n`` times at plan build
    — whole-stage codegen folds it into straight-line integer ops.
    Total bits must fit a long: ``bits * len(cols) <= 62``."""
    n = len(cols)
    if n < 2:
        raise ValueError("zorder_key needs >= 2 columns")
    if bits * n > 62:
        raise ValueError(f"bits*cols = {bits * n} exceeds long capacity")
    key = F.lit(0).cast("long")
    for i in range(bits):
        src = F.lit(2**i).cast("long")
        for j, c in enumerate(cols):
            bit = F.floor(c / src).cast("long") % 2
            key = key + bit * F.lit(2 ** (i * n + j)).cast("long")
    return key


def cluster_by_zorder(
    df: DataFrame,
    specs: Sequence[tuple[str, float, float]],
    bits: int = 16,
    num_partitions: int | None = None,
    key_name: str = "_zkey",
) -> DataFrame:
    """Add the Morton key for ``specs = [(col, lo, hi), ...]`` and
    range-partition by it — the write-side clustering step. Each
    output partition then covers a compact Z-curve segment, so parquet
    min/max footer stats prune on EVERY spec'd column. One range
    exchange; drop ``key_name`` after write if undesired."""
    norm = [
        normalize_to_bits(F.col(c), lo, hi, bits) for c, lo, hi in specs
    ]
    keyed = df.withColumn(key_name, zorder_key(norm, bits))
    args = ([num_partitions] if num_partitions else []) + [F.col(key_name)]
    return keyed.repartitionByRange(*args)
