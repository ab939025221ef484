"""Deletion propagation through packed training rows: audit counts,
in-place scrub semantics, end-to-end consistency with the packer."""

from __future__ import annotations

import pytest

from med_doi_feature_extraction_spark.operators.forget import (
    removal_audit,
    scrub_packs,
)


@pytest.fixture(scope="module")
def artifacts(spark):
    # pack 1: docs a(0..3) b(4..7); pack 2: doc b(0..1) c(2..5);
    # pack 3: doc d only
    packs = spark.createDataFrame(
        [
            (1, 8, [10, 11, 12, 13, 20, 21, 22, 23]),
            (2, 6, [24, 25, 30, 31, 32, 33]),
            (3, 4, [40, 41, 42, 43]),
        ],
        "pack_id long, n_tokens int, input_ids array<int>",
    )
    spans = spark.createDataFrame(
        [
            (1, "a", 0, 4),
            (1, "b", 4, 4),
            (2, "b", 0, 2),
            (2, "c", 2, 4),
            (3, "d", 0, 4),
        ],
        "pack_id long, key string, start_in_pack long, len long",
    )
    removal = spark.createDataFrame([("b",)], "key string")
    return packs, spans, removal


def test_removal_audit(spark, artifacts):
    packs, spans, removal = artifacts
    out = {
        r["pack_id"]: r.asDict()
        for r in removal_audit(spans, removal).collect()
    }
    assert out[1] == {
        "pack_id": 1, "spans_total": 2, "spans_removed": 1,
        "tokens_removed": 4, "affected": True,
    }
    assert out[2]["tokens_removed"] == 2 and out[2]["affected"]
    assert out[3] == {
        "pack_id": 3, "spans_total": 1, "spans_removed": 0,
        "tokens_removed": 0, "affected": False,
    }


def test_scrub_masks_in_place(spark, artifacts):
    packs, spans, removal = artifacts
    out = {
        r["pack_id"]: r.asDict()
        for r in scrub_packs(packs, spans, removal, pad_id=0).collect()
    }
    # doc b's slices padded, everything else byte-identical in place
    assert out[1]["input_ids"] == [10, 11, 12, 13, 0, 0, 0, 0]
    assert out[1]["tokens_scrubbed"] == 4
    assert out[2]["input_ids"] == [0, 0, 30, 31, 32, 33]
    assert out[2]["tokens_scrubbed"] == 2
    assert out[3]["input_ids"] == [40, 41, 42, 43]
    assert out[3]["tokens_scrubbed"] == 0
    # lengths never change — downstream masks stay valid
    assert all(len(r["input_ids"]) == r["n_tokens"] for r in out.values())


def test_scrub_consistent_with_packer(spark):
    """End-to-end: pack a corpus, remove some docs, scrub — every
    position in a removed doc's span is pad, every other position is
    the original token."""
    from med_doi_feature_extraction_spark.operators.packing import (
        pack_sequences,
    )

    docs = spark.createDataFrame(
        [(i, list(range(i * 100, i * 100 + 5 + (i % 7)))) for i in range(40)],
        "doc_id long, ids array<int>",
    )
    packs, spans = pack_sequences(docs, "doc_id", "ids", budget=16, n_shards=4)
    removal = docs.filter("doc_id % 5 = 0").select(
        docs.doc_id.alias("key")
    )
    out = scrub_packs(packs, spans, removal, pad_id=-1)
    rows = {r["pack_id"]: r for r in out.collect()}
    span_rows = spans.collect()
    orig = {r["pack_id"]: r["input_ids"] for r in packs.collect()}
    for s in span_rows:
        ids = rows[s["pack_id"]]["input_ids"]
        seg = ids[s["start_in_pack"] : s["start_in_pack"] + s["len"]]
        if s["key"] % 5 == 0:
            assert seg == [-1] * s["len"]
        else:
            o = orig[s["pack_id"]]
            assert seg == o[s["start_in_pack"] : s["start_in_pack"] + s["len"]]
    total_scrubbed = sum(r["tokens_scrubbed"] for r in rows.values())
    want = sum(s["len"] for s in span_rows if s["key"] % 5 == 0)
    assert total_scrubbed == want > 0
