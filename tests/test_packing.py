"""Sequence packing, per-group quotas, weighted sampling, bloom join.

The greedy packer's fold kernel is pinned row-for-row against the
pure-Python reference (`packing.pack_greedy_py`) — the non-SQL
analogue of the DuckDB oracle the chunked variant has.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from med_doi_feature_extraction_spark.operators.bloom import (
    bloom_build,
    bloom_might_contain,
    bloom_prune_join,
)
from med_doi_feature_extraction_spark.operators.packing import (
    pack_chunked,
    pack_greedy,
    pack_greedy_py,
    pack_stats,
)
from med_doi_feature_extraction_spark.operators.sampling import (
    group_cap,
    hash_uniform,
    weighted_sample,
)

BUDGET = 100


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(f"d{i:04d}", 1 + (i * 37) % 90) for i in range(400)]
    return spark.createDataFrame(rows, "doc_id string, tokens int").cache()


# ------------------------------------------------------------- pack_chunked


def test_pack_chunked_layout_independent(spark, docs):
    a = pack_chunked(docs, "doc_id", "tokens", BUDGET, n_shards=4)
    b = pack_chunked(
        docs.repartition(7, "tokens"), "doc_id", "tokens", BUDGET, n_shards=4
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_pack_chunked_is_contiguous_chunking(docs):
    """Within a shard, cumulative tokens advance contiguously: each
    doc starts exactly where the previous ended (mod budget)."""
    out = pack_chunked(docs, "doc_id", "tokens", BUDGET, n_shards=2)
    rows = out.withColumn("u", hash_uniform("doc_id", "pack")).collect()
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.pack_id // 2**32, []).append(r)
    assert len(by_shard) == 2
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: (r.u, r.doc_id))
        cum = 0
        for r in rs:
            assert r.pack_id == shard * 2**32 + cum // BUDGET
            assert r.pack_offset == cum % BUDGET
            assert r.straddles == ((cum + r.tokens - 1) // BUDGET > cum // BUDGET)
            cum += r.tokens


# -------------------------------------------------------------- pack_greedy


def test_pack_greedy_matches_python_reference(spark, docs):
    out = pack_greedy(docs, "doc_id", "tokens", BUDGET, n_shards=3)
    rows = out.withColumn("u", hash_uniform("doc_id", "pack")).collect()
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.pack_id // 2**32, []).append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: (r.u, r.doc_id))
        ref = pack_greedy_py([(r.doc_id, r.tokens) for r in rs], BUDGET)
        got = [(r.doc_id, r.pack_id - shard * 2**32, r.pack_offset) for r in rs]
        assert got == ref


def test_pack_greedy_no_straddle_and_oversized(spark):
    rows = [("a", 60), ("b", 60), ("c", 250), ("d", 40)]
    df = spark.createDataFrame(rows, "doc_id string, tokens int")
    out = pack_greedy(df, "doc_id", "tokens", BUDGET, n_shards=1)
    got = {r.doc_id: r for r in out.collect()}
    # every pack's token sum is within budget unless it is a single
    # oversized doc
    stats = pack_stats(out, "tokens", BUDGET).collect()
    for s in stats:
        assert s.tokens <= BUDGET or s.n_docs == 1
    assert got["c"].oversized and got["c"].pack_offset == 0
    assert not got["a"].oversized


def test_pack_greedy_fill_never_worse_than_half_excluding_oversized(docs):
    """Greedy sequential packing wastes < budget per pack boundary:
    every CLOSED pack (one that was followed by another in its shard)
    is > 0 full and the mean fill of multi-doc packs is sane."""
    out = pack_greedy(docs, "doc_id", "tokens", BUDGET, n_shards=2)
    stats = pack_stats(out, "tokens", BUDGET)
    assert stats.filter(F.col("tokens") > BUDGET).count() == 0  # no doc > 100
    mean_fill = stats.agg(F.avg("fill_ratio")).first()[0]
    assert mean_fill > 0.5


# ----------------------------------------------------- quotas + weighted


def test_group_cap_deterministic_and_capped(spark):
    rows = [(f"k{i}", f"g{i % 3}") for i in range(90)]
    df = spark.createDataFrame(rows, "key string, grp string")
    out = group_cap(df, "grp", "key", cap=7, salt="s")
    counts = {r.grp: r.n for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert counts == {"g0": 7, "g1": 7, "g2": 7}
    again = group_cap(df.repartition(5), "grp", "key", cap=7, salt="s")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))
    # survivors are the cap lowest hash values per group
    u = {r.key: r.u for r in df.select("key", hash_uniform("key", "s").alias("u")).collect()}
    for g in ("g0", "g1", "g2"):
        expected = {
            k for k in sorted((k for k, _ in rows if f"g{int(k[1:]) % 3}" == g),
                              key=lambda k: (u[k], k))[:7]
        }
        got = {r.key for r in out.filter(F.col("grp") == g).collect()}
        assert got == expected


def test_weighted_sample_extremes_and_null(spark):
    rows = [("a", 1.0), ("b", 0.0), ("c", None), ("d", 5.0), ("e", -1.0)]
    df = spark.createDataFrame(rows, "key string, w double")
    kept = {r.key for r in weighted_sample(df, "key", "w").collect()}
    assert "a" in kept and "d" in kept  # weight >= 1 always kept
    assert "b" not in kept and "e" not in kept  # weight <= 0 never kept
    assert "c" not in kept  # NULL weight drops


def test_weighted_sample_rate_tracks_weight(spark):
    df = spark.range(4000).select(F.col("id").cast("string").alias("key"))
    kept = weighted_sample(df, "key", F.lit(0.3), salt="t").count()
    assert abs(kept / 4000 - 0.3) < 0.04


# -------------------------------------------------------------------- bloom


def test_bloom_no_false_negatives_and_low_fp(spark):
    dim = spark.range(0, 5000, 7).select(F.col("id").alias("k"))
    bitmap = bloom_build(dim, "k", k=5, m_bits=1 << 14)
    probe = spark.range(5000).select(F.col("id").alias("k"))
    got = probe.filter(bloom_might_contain(F.col("k"), bitmap, 5, 1 << 14))
    got_keys = {r.k for r in got.collect()}
    members = set(range(0, 5000, 7))
    assert members <= got_keys  # NO false negatives, ever
    fp = len(got_keys - members) / (5000 - len(members))
    assert fp < 0.05


def test_bloom_prune_join_exact_vs_plain_join(spark):
    fact = spark.range(3000).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("v")
    )
    dim = spark.range(0, 3000, 31).select(
        F.col("id").alias("k"), F.lit("d").alias("tag")
    )
    pruned = bloom_prune_join(fact, dim, "k")
    plain = fact.join(dim, "k")
    assert sorted(map(tuple, pruned.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_bloom_prune_join_rejects_outer(spark):
    df = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        bloom_prune_join(df, df, "k", how="left")


# --- pack_sequences (materialized training rows) ----------------------

def test_pack_sequences_tiling_and_reconstruction(spark):
    import random

    from pyspark.sql import functions as F

    from med_doi_feature_extraction_spark.operators.packing import (
        pack_sequences,
    )

    rng = random.Random(3)
    rows = [
        (f"d{i}", [rng.randrange(2, 500) for _ in range(rng.randrange(0, 40))])
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "ids"])
    budget, n_shards = 64, 4
    packs, spans = pack_sequences(
        df, "doc_id", "ids", budget=budget, n_shards=n_shards
    )
    pk = {r["pack_id"]: list(r["input_ids"]) for r in packs.collect()}
    sp = spans.collect()

    # tiling: within each shard every pack but the last is full
    by_shard: dict[int, list[int]] = {}
    for pid, ids in pk.items():
        by_shard.setdefault(pid >> 32, []).append(pid)
    for shard, pids in by_shard.items():
        for pid in sorted(pids)[:-1]:
            assert len(pk[pid]) == budget, (shard, pid)
        assert 0 < len(pk[sorted(pids)[-1]]) <= budget
    # pack ids are contiguous from 0 within each shard
    for shard, pids in by_shard.items():
        locals_ = sorted(p & 0xFFFFFFFF for p in pids)
        assert locals_ == list(range(len(locals_)))

    # reconstruction: every document's ids reassemble exactly from its
    # spans, in pack order
    orig = {k: v for k, v in rows}
    got: dict[str, list[int]] = {}
    for r in sorted(sp, key=lambda r: (r["pack_id"], r["start_in_pack"])):
        piece = pk[r["pack_id"]][
            r["start_in_pack"]: r["start_in_pack"] + r["len"]
        ]
        got.setdefault(r["key"], []).extend(piece)
    for k, ids in got.items():
        assert ids == orig[k], k
    # empty docs occupy no span; total tokens conserved
    n_empty = sum(1 for _, v in rows if not v)
    assert len(got) == len(rows) - n_empty
    assert sum(len(v) for v in pk.values()) == sum(len(v) for _, v in rows)

    # spans tile every pack exactly (no gaps, no overlaps)
    from collections import defaultdict
    cover = defaultdict(list)
    for r in sp:
        cover[r["pack_id"]].append((r["start_in_pack"], r["len"]))
    for pid, segs in cover.items():
        segs.sort()
        pos = 0
        for s, ln in segs:
            assert s == pos
            pos += ln
        assert pos == len(pk[pid])

    # determinism across physical layout
    packs2, _ = pack_sequences(
        df.repartition(11), "doc_id", "ids", budget=budget, n_shards=n_shards
    )
    pk2 = {r["pack_id"]: list(r["input_ids"]) for r in packs2.collect()}
    assert pk2 == pk


class TestTopFractionPerGroup:
    def test_exact_counts_ties_and_nulls(self, spark):
        from med_doi_feature_extraction_spark.operators.sampling import (
            top_fraction_per_group,
        )

        rows = [("en", i, float(i % 4)) for i in range(10)]   # heavy ties
        rows += [("de", 100 + i, float(i)) for i in range(7)]
        rows += [("fr", 200, None)]                           # null score
        df = spark.createDataFrame(
            rows, "lang: string, doc_id: long, score: double"
        )
        kept = top_fraction_per_group(df, "lang", "score", 0.3, "doc_id")
        got = sorted(
            (r["lang"], r["doc_id"]) for r in kept.collect()
        )
        # en: ceil(0.3*10)=3 best by (score desc, id asc): score 3 ->
        # ids 3,7 then score 2 -> id 2
        # de: ceil(0.3*7)=3 -> ids 106,105,104; fr: null never kept
        assert got == [
            ("de", 104), ("de", 105), ("de", 106),
            ("en", 2), ("en", 3), ("en", 7),
        ]
        # layout independence
        got2 = sorted(
            (r["lang"], r["doc_id"])
            for r in top_fraction_per_group(
                df.repartition(7), "lang", "score", 0.3, "doc_id"
            ).collect()
        )
        assert got2 == got

    def test_frac_one_keeps_all_scored(self, spark):
        from med_doi_feature_extraction_spark.operators.sampling import (
            top_fraction_per_group,
        )

        df = spark.createDataFrame(
            [("en", 1, 1.0), ("en", 2, None)],
            "lang: string, doc_id: long, score: double",
        )
        assert top_fraction_per_group(df, "lang", "score", 1.0, "doc_id").count() == 1
