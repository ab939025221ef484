"""Fuzzy (approximate-string) equi-join via symmetric-deletion
blocking — exact up to the optional hot-bucket cap.

Joining two tables on *approximately* equal string keys (titles, names,
URLs re-serialized by different crawlers) is a theta-join Spark can
only express as a cartesian product. The SymSpell identity fixes the
blocking: if ``levenshtein(a, b) <= k`` then the sets of strings
reachable from ``a`` and ``b`` by at most ``k`` character DELETIONS
intersect (a substitution is a deletion on both sides at the same
spot; an insertion on one side is a deletion on the other). So:

1. expand each key to its deletion neighborhood (depth ``k``) —
   pure JVM higher-order array ops, no UDF;
2. equi-join the exploded variants (an 8-byte ``xxhash64`` of the
   variant is the shuffle key, not the string);
3. distinct the candidate id pairs;
4. verify with the exact built-in ``levenshtein`` ≤ k.

NO false negatives from blocking (the identity is exact), so with
``max_bucket=None`` the result equals the brute-force cross join —
which is what the DuckDB oracle computes. ``max_bucket`` drops
variant buckets shared by more rows than the cap (the LSH hot-band
rationale: a variant hit by millions of keys is a degenerate blocker
and explodes candidate pairs quadratically).

Neighborhood size is 1 + n + C(n,2) ≈ n²/2 strings for k=2 on an
n-char key: designed for KEY-LIKE strings (≤ ~100 chars), not
documents — near-dup text belongs to minhash/simhash in
``operators/dedup.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_MAX_VARIANT_BUCKET = 50_000


def deletion_variants(col: F.Column, k: int) -> F.Column:
    """All strings reachable from ``col`` by 0..k single-character
    deletions, distinct, as an array column (JVM-side; no UDF).

    Empty string → just itself (``sequence(1, 0)`` would count DOWN in
    Spark, so the empty case is guarded explicitly)."""
    if k < 1 or k > 2:
        raise ValueError("deletion_variants supports k in {1, 2}")

    def delete_each(s: F.Column) -> F.Column:
        # one array of all single-deletion results of s
        return F.transform(
            F.sequence(F.lit(1), F.length(s)),
            lambda i: F.concat(
                s.substr(F.lit(1), i - 1),
                s.substr(i + 1, F.length(s)),
            ),
        )

    level1 = delete_each(col)
    variants = F.concat(F.array(col), level1)
    if k == 2:
        level2 = F.flatten(F.transform(level1, delete_each))
        variants = F.concat(variants, level2)
    empty = F.length(col) == 0
    return F.when(empty, F.array(col)).otherwise(F.array_distinct(variants))


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    left_key: str,
    right_key: str,
    max_distance: int = 1,
    max_bucket: int | None = DEFAULT_MAX_VARIANT_BUCKET,
) -> DataFrame:
    """Pairs ``(id_l, id_r, key_l, key_r, dist)`` with
    ``levenshtein(key_l, key_r) <= max_distance``.

    Exact (equals the brute-force cross join) when ``max_bucket`` is
    None — the SymSpell blocking has no false negatives and the final
    ``levenshtein`` filter removes blocking's false positives. NULL
    keys never match (SQL join semantics).

    Scale shape: each side is exploded to its deletion neighborhood
    and shuffled ONCE on the 8-byte variant hash; candidate pairs are
    distinct-ed before the (cheap, codegen) levenshtein verify.
    Self-join callers should filter ``id_l < id_r`` afterwards.
    """
    lv = left.select(
        F.col(left_id).alias("id_l"),
        F.col(left_key).alias("key_l"),
        F.explode(deletion_variants(F.col(left_key), max_distance)).alias("_v"),
    ).withColumn("_vh", F.xxhash64("_v")).drop("_v")
    rv = right.select(
        F.col(right_id).alias("id_r"),
        F.col(right_key).alias("key_r"),
        F.explode(deletion_variants(F.col(right_key), max_distance)).alias("_v"),
    ).withColumn("_vh", F.xxhash64("_v")).drop("_v")

    if max_bucket is not None:
        rc = rv.groupBy("_vh").agg(F.count(F.lit(1)).alias("_n"))
        rv = rv.join(
            rc.filter(F.col("_n") <= max_bucket).select("_vh"), "_vh"
        )
        lc = lv.groupBy("_vh").agg(F.count(F.lit(1)).alias("_n"))
        lv = lv.join(
            lc.filter(F.col("_n") <= max_bucket).select("_vh"), "_vh"
        )

    cands = lv.join(rv, "_vh").select("id_l", "id_r", "key_l", "key_r").distinct()
    return cands.withColumn(
        "dist", F.levenshtein("key_l", "key_r")
    ).filter(F.col("dist") <= max_distance)
