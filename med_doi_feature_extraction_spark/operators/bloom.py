"""Bloom-filter semi-join reduction: prune a huge probe side before
an exact join.

The classic 100 TB join problem: ``fact JOIN dim`` where dim is too
big to broadcast as ROWS but its KEY SET fits a few kilobytes as a
bit array. Shuffling the full fact table to discover that 95% of its
rows match nothing is the single biggest avoidable cost in selective
joins — engines solve it with a runtime bloom filter pushed to the
probe scan (Spark has ``spark.sql.optimizer.runtime.bloomFilter.enabled``
for this, and a ``bloom_filter_agg`` expression that is not
SQL-registered in this build — probed round 4). This operator is the
explicit, plan-visible version: build the filter from the dim keys,
prune the fact at the SCAN (before the exchange), then run the exact
join on the survivors.

Correctness: a Bloom filter has no false negatives, so the pruned
join returns EXACTLY the rows of the unpruned join — the DuckDB
oracle is the plain join, and the contract check is hash-exact.
False positives only cost work (extra rows surviving to the exact
join), bounded by ``k``/``m_bits`` (defaults ≈0.1% at 100k keys).

Shape: one aggregation of the dim keys down to ``m_bits/64`` longs
(bit_or partial-aggregates map-side, so the exchange carries at most
``m_bits/64`` rows per partition), one bounded driver collect of the
bitmap (≤ 16 KB at the default — same legitimacy class as the IVF
centroid collect, `operators/similarity.py`), and a probe-side
filter that is pure Column algebra against an array literal: it
lives in the scan stage, BEFORE the join exchange, which is the whole
point.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


#: 63 usable bits per word (bit 63 never set) keeps every stored word
#: non-negative, so the probe's bitwiseAND mask test needs no unsigned
#: shift — PySpark's shiftleft/shiftrightunsigned only take Python-int
#: shift amounts, not Columns.
_BITS_PER_WORD = 63
_MASKS = [1 << i for i in range(_BITS_PER_WORD)]


def _positions(key: Column, k: int, m_bits: int) -> list[Column]:
    """k independent bit positions via seeded xxhash64 (the seed is a
    second hashed column — xxhash64's own seed is fixed). pmod keeps
    positions non-negative."""
    key = key.cast("string")
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)) for i in range(k)
    ]


def _mask(pos: Column) -> Column:
    """2^(pos mod 63) via a 63-long literal lookup — Column-indexed
    shifts without the shift builtin."""
    return F.element_at(
        F.lit(_MASKS), (F.pmod(pos, _BITS_PER_WORD) + 1).cast("int")
    )


def bloom_build(
    dim: DataFrame, key_col: str, k: int = 5, m_bits: int = 1 << 17
) -> list[int]:
    """Aggregate the dim key set into a bitmap of ``ceil(m_bits/63)``
    longs. Runs ONE job (bit_or hash-agg, partial map-side); the
    collected result is the bitmap, never the data."""
    n_words = (m_bits + _BITS_PER_WORD - 1) // _BITS_PER_WORD
    pos = F.explode(F.array(*_positions(F.col(key_col), k, m_bits))).alias(
        "pos"
    )
    words = (
        dim.select(pos)
        .select(
            (F.col("pos") / _BITS_PER_WORD).cast("long").alias("word"),
            _mask(F.col("pos")).alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
        .collect()
    )
    bitmap = [0] * n_words
    for r in words:
        bitmap[r["word"]] = r["bits"]
    return bitmap


def bloom_might_contain(
    key: Column, bitmap: list[int], k: int = 5, m_bits: int = 1 << 17
) -> Column:
    """Membership probe as pure Column algebra over the bitmap
    literal: all k bits set ⇒ maybe-member; any clear ⇒ definitely
    absent. The array literal is plan-side (broadcast with the task
    binary); element_at + bitwiseAND stay inside whole-stage codegen."""
    arr = F.lit(bitmap)
    checks = [
        F.element_at(
            arr, ((p / _BITS_PER_WORD).cast("long") + 1).cast("int")
        ).bitwiseAND(_mask(p))
        != 0
        for p in _positions(key, k, m_bits)
    ]
    return reduce(lambda a, b: a & b, checks)


def bloom_prune_join(
    fact: DataFrame,
    dim: DataFrame,
    key_col: str,
    how: str = "inner",
    k: int = 5,
    m_bits: int = 1 << 17,
) -> DataFrame:
    """Exact ``fact ⋈ dim`` with a bloom pre-filter on the fact scan.

    Semantically identical to ``fact.join(dim, key_col, how)`` for
    ``how`` in (inner, left_semi) — false positives are eliminated by
    the exact join; false negatives are impossible. The win is that
    non-matching fact rows die in the scan stage instead of crossing
    the join exchange: at a 5% match rate that is a 20× smaller
    shuffle. Build cost is one small job over dim (plan-build time,
    like the IVF index build)."""
    if how not in ("inner", "left_semi"):
        raise ValueError(f"bloom_prune_join supports inner/left_semi, got {how}")
    bitmap = bloom_build(dim, key_col, k=k, m_bits=m_bits)
    pruned = fact.filter(
        bloom_might_contain(F.col(key_col), bitmap, k=k, m_bits=m_bits)
    )
    return pruned.join(dim, on=key_col, how=how)
