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
