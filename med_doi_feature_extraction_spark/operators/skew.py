"""Skew-aware aggregation: explicit two-stage salted groupBy for
heavy-hitter keys, as a first-class operator.

Spark already map-side-combines algebraic aggregates, and AQE splits
skewed SORT-MERGE JOIN partitions — but neither helps when a single
groupBy KEY is hot AND the aggregate's partial state is large
(``collect_set``/``collect_list``, exact distinct sets, large HLL
unions): every row of the hot key still converges on one reducer.
The classic fix is salting — aggregate on ``(key, salt)`` first,
then merge the ``salt_factor`` partial results per key:

    stage 1:  groupBy(key, hash(row) %% S)  ->  partial agg  (hot key
              spreads over S reducers)
    stage 2:  groupBy(key)                  ->  merge partials (S rows
              per key, tiny)

The operator takes the partial and merge expression pairs explicitly
because correctness requires the aggregate to be decomposable
(``sum/sum``, ``count/sum``, ``max/max``, ``collect_set/
flatten+distinct``, ``hll_sketch_agg/hll_union_agg``...); a
non-decomposable aggregate (``avg`` directly, exact median) must be
rewritten by the caller (``avg`` = salted sum + salted count, divide
after) — the same contract every distributed combiner has.

Output is IDENTICAL to the unsalted ``df.groupBy(keys).agg(...)``
(pytest-pinned, including an adversarial 30%%-hot-key fixture like
tests/test_skew.py's join cases); salting only reshapes the shuffle.

When to use: profile first (``operators/profile.py`` distinct counts,
``hot_domains``) — for well-distributed keys the extra exchange is
pure overhead; for Zipf-headed keys (domains, tokens, boilerplate
hashes) stage 1 bounds the largest reducer at ~hot_count/S rows.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT_FACTOR = 16


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial: Mapping[str, Column],
    merge: Mapping[str, Column],
    salt_factor: int = DEFAULT_SALT_FACTOR,
    salt_on: Sequence[str] | None = None,
) -> DataFrame:
    """Two-stage salted aggregation over ``keys``.

    ``partial``: name → aggregate Column for stage 1 (over the raw
    rows of one ``(keys, salt)`` group). ``merge``: name → aggregate
    Column for stage 2 (over the ``salt_factor`` stage-1 rows of one
    key; reference stage-1 outputs by their ``partial`` names).
    ``salt_on``: columns to derive the salt from (default: a uniform
    hash of ALL columns via ``monotonically_increasing_id`` is wrong
    under retries — instead the row's own content is hashed; pass a
    high-cardinality column subset for cheaper hashing).

    Example — exact distinct count per hot domain::

        salted_agg(
            df, ["domain"],
            partial={"s": F.collect_set("url")},
            merge={"n_urls": F.size(F.array_distinct(F.flatten(F.collect_list("s"))))},
        )
    """
    if salt_factor < 2:
        raise ValueError("salt_factor must be >= 2 (1 is a plain groupBy)")
    keys = list(keys)
    hash_cols = [F.col(c) for c in (salt_on or df.columns)]
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*hash_cols), F.lit(salt_factor))
    )
    stage1 = salted.groupBy(*keys, "_salt").agg(
        *[a.alias(name) for name, a in partial.items()]
    )
    return stage1.groupBy(*keys).agg(
        *[a.alias(name) for name, a in merge.items()]
    )


def detect_hot_keys(
    df: DataFrame, key: str, threshold: int, max_hot: int = 10_000
) -> list:
    """Keys whose row count exceeds ``threshold`` — one hash-agg job,
    result bounded by construction (at most ``rows/threshold`` keys
    can exceed it; ``max_hot`` is a hard cap so the collect stays a
    statistics-sized transfer like the profiler's)."""
    rows = (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > threshold)
        .orderBy(F.col("_n").desc())
        .limit(max_hot)
        .collect()
    )
    return [r[key] for r in rows]


def skew_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    hot_keys: Sequence | None = None,
    hot_threshold: int | None = None,
    how: str = "inner",
) -> DataFrame:
    """Hot/cold split join: rows with heavy-hitter keys take a
    BROADCAST path (the hot fact rows never cross an exchange — the
    dim slice for the hot keys is tiny and ships to them), everything
    else takes the normal shuffle join. Output is row-identical to
    ``fact.join(dim, key, how)`` — each fact row goes through exactly
    one branch, and the union is the oracle-checked plain join.

    AQE's skew-join split handles sort-merge skew adaptively at
    runtime; this operator is the PLANNED version for when the hot
    keys are known (from ``detect_hot_keys`` / ``hot_domains`` /
    ``profile``) — it avoids shuffling the hot rows at all rather
    than splitting their reducer, which matters when one key is 30%
    of the table. Supports inner/left (each fact row must appear in
    exactly one branch; right/outer would need dim-side splitting).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"skew_join supports inner/left, got {how}")
    if hot_keys is None:
        if hot_threshold is None:
            raise ValueError("pass hot_keys or hot_threshold")
        hot_keys = detect_hot_keys(fact, key, hot_threshold)
    hot_keys = list(hot_keys)
    if not hot_keys:
        return fact.join(dim, on=key, how=how)
    is_hot = F.col(key).isin(hot_keys)
    hot = fact.filter(is_hot).join(
        F.broadcast(dim.filter(is_hot)), on=key, how=how
    )
    cold = fact.filter(~is_hot | F.col(key).isNull()).join(
        dim, on=key, how=how
    )
    return hot.unionByName(cold)
