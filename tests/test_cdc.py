"""Content-defined chunking: kernel properties + Spark end-to-end."""

from __future__ import annotations

import hashlib
import random

import pytest

from pyspark.sql import functions as F

from med_doi_feature_extraction_spark.operators.cdc import (
    cdc_dup_stats,
    chunk_spans,
    gear_table,
    rolling_gear,
    with_cdc_chunks,
)

GEAR = gear_table()


def _rand(n: int, seed: int = 7) -> bytes:
    rng = random.Random(seed)
    return bytes(rng.randrange(256) for _ in range(n))


class TestChunkSpans:
    def test_exact_coverage_and_bounds(self):
        data = _rand(5000)
        spans = chunk_spans(data, GEAR, 64, 256, 1024)
        assert spans[0][0] == 0
        for (o1, l1), (o2, _) in zip(spans, spans[1:]):
            assert o1 + l1 == o2
        o, ln = spans[-1]
        assert o + ln == len(data)
        assert all(ln <= 1024 for _, ln in spans)
        # every chunk except the final tail honors min_size
        assert all(ln >= 64 for _, ln in spans[:-1])

    def test_deterministic(self):
        data = _rand(3000, seed=3)
        assert chunk_spans(data, GEAR, 64, 256, 1024) == chunk_spans(
            data, GEAR, 64, 256, 1024
        )

    def test_insertion_shift_resistance(self):
        """An early 3-byte insertion invalidates only the chunk
        containing it — the CDC property fixed-size blocks lack."""
        data = _rand(5000)
        data2 = data[:100] + b"XYZ" + data[100:]

        def hashes(d):
            return {
                hashlib.sha256(d[o : o + ln]).digest()
                for o, ln in chunk_spans(d, GEAR, 64, 256, 1024)
            }

        h1, h2 = hashes(data), hashes(data2)
        assert len(h1 & h2) / len(h1) >= 0.8

    def test_rolling_gear_window_locality(self):
        """h[i] depends on at most the trailing 64 bytes: two buffers
        agreeing on a 64-byte suffix hash identically there."""
        a = _rand(200, seed=1)
        b = _rand(200, seed=2)[:136] + a[136:]
        ha, hb = rolling_gear(a, GEAR), rolling_gear(b, GEAR)
        assert ha[199] == hb[199]  # 64 shared trailing bytes

    def test_empty_and_tiny(self):
        assert chunk_spans(b"", GEAR) == []
        assert chunk_spans(b"ab", GEAR, 64, 256, 1024) == [(0, 2)]

    def test_validation(self):
        with pytest.raises(ValueError):
            chunk_spans(b"x", GEAR, 64, 300, 1024)  # not a power of 2
        with pytest.raises(ValueError):
            chunk_spans(b"x", GEAR, 512, 256, 1024)


class TestCdcSpark:
    def test_chunks_rebuild_payload(self, spark):
        df = spark.createDataFrame(
            [(1, "alpha " * 200), (2, "beta " * 150), (3, None)],
            "doc_id: long, payload: string",
        )
        rows = with_cdc_chunks(
            df, "doc_id", "payload", 16, 64, 256
        ).collect()
        assert {r["doc_id"] for r in rows} == {1, 2}  # NULL skipped
        by_doc = {}
        for r in sorted(rows, key=lambda r: (r["doc_id"], r["chunk_idx"])):
            by_doc.setdefault(r["doc_id"], []).append(r)
        src = {1: "alpha " * 200, 2: "beta " * 150}
        for did, rs in by_doc.items():
            data = src[did].encode()
            rebuilt = b"".join(
                data[r["offset"] : r["offset"] + r["length"]] for r in rs
            )
            assert rebuilt == data
            for r in rs:
                want = hashlib.sha256(
                    data[r["offset"] : r["offset"] + r["length"]]
                ).hexdigest()[:16]
                assert r["chunk_hash"] == want

    def test_dup_stats_shared_footer(self, spark):
        # shared region must be aperiodic: repeated short phrases give
        # the rolling hash only period-many values, often no boundary
        # candidate at all → no resynchronization (found the hard way)
        footer = _rand(3000, seed=99).hex()
        df = spark.createDataFrame(
            [
                (1, _rand(1500, 1).hex() + footer),
                (2, _rand(1500, 2).hex() + footer),
                (3, _rand(1500, 3).hex()),
            ],
            "doc_id: long, payload: string",
        )
        chunks = with_cdc_chunks(df, "doc_id", "payload", 64, 256, 1024)
        stats = {
            r["doc_id"]: r
            for r in cdc_dup_stats(chunks, "doc_id").collect()
        }
        # docs 1/2 share footer chunks; doc 3 shares nothing
        assert stats[1]["dup_bytes"] > 0 and stats[2]["dup_bytes"] > 0
        assert stats[3]["dup_bytes"] == 0 and stats[3]["dup_frac"] == 0.0
        for did in (1, 2, 3):
            assert (
                stats[did]["total_bytes"]
                == len(
                    df.where(F.col("doc_id") == did)
                    .collect()[0]["payload"]
                )
            )
