"""WARC container source/sink: byte-level golden, round-trips, safety.

Covers the pure-python record layer (build/parse without Spark), the
distributed read/write round-trip (plain + per-record gzip), skipping
of non-response record types, binary bodies containing WARC-looking
delimiters, determinism of written bytes, and the overwrite guard.
"""

from __future__ import annotations

import gzip
import os
from datetime import datetime

import pytest

from med_doi_feature_extraction_spark.sources.warc import (
    build_record,
    parse_warc_bytes,
    read_warc,
    write_warc,
)

TS = datetime(2026, 1, 2, 3, 4, 5)


def test_build_parse_golden():
    rec = build_record("https://a.example/x", TS, "héllo".encode("utf-8"))
    # header block is exact ISO 28500 layout
    head = rec.split(b"\r\n\r\n")[0].decode("utf-8")
    assert head.startswith("WARC/1.0\r\nWARC-Type: response")
    assert "WARC-Target-URI: https://a.example/x" in head
    assert "WARC-Date: 2026-01-02T03:04:05Z" in head
    [row] = list(parse_warc_bytes(rec))
    assert row["url"] == "https://a.example/x"
    assert row["warc_ts"] == TS
    assert row["http_status"] == 200
    assert row["content_type"] == "text/html; charset=utf-8"
    assert row["html"] == "héllo".encode("utf-8")


def test_parse_skips_non_response_and_binary_bodies():
    tricky = b"WARC/1.0\r\n\r\nfake" + b"\x00\xff" * 10  # delimiter bait
    blob = (
        build_record("urn:info", TS, b"crawler config", record_type="warcinfo")
        + build_record("https://a/1", TS, tricky)
        + build_record("https://a/1", TS, b"GET / HTTP/1.1", record_type="request")
        + build_record("https://a/2", TS, b"")
    )
    rows = list(parse_warc_bytes(blob))
    assert [r["url"] for r in rows] == ["https://a/1", "https://a/2"]
    assert rows[0]["html"] == tricky  # Content-Length split, not scanning
    assert rows[1]["html"] == b""
    all_rows = list(
        parse_warc_bytes(blob, types=("warcinfo", "request", "response"))
    )
    assert [r["record_type"] for r in all_rows] == [
        "warcinfo", "response", "request", "response",
    ]


def test_parse_multi_member_gzip():
    recs = [
        build_record(f"https://a/{i}", TS, f"body {i}".encode())
        for i in range(3)
    ]
    blob = b"".join(gzip.compress(r, mtime=0) for r in recs)
    rows = list(parse_warc_bytes(blob))
    assert [r["html"] for r in rows] == [b"body 0", b"body 1", b"body 2"]


@pytest.mark.parametrize("compress", [False, True])
def test_spark_roundtrip(spark, tmp_path, compress):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "url": [f"https://ex.org/{i % 5}" for i in range(23)],
            "warc_ts": pd.to_datetime(
                [datetime(2026, 1, 1 + i % 3, i % 24) for i in range(23)]
            ),
            "html": [("doc-%d-" % i + "ü" * (i % 7)).encode() for i in range(23)],
        }
    )
    df = spark.createDataFrame(pdf)
    out = str(tmp_path / "warc")
    man = write_warc(df, out, n_files=4, compress=compress).toPandas()
    assert man["records"].sum() == 23
    back = read_warc(spark, out).toPandas()
    assert len(back) == 23
    got = sorted(zip(back["url"], back["warc_ts"], (bytes(b) for b in back["html"])))
    want = sorted(zip(pdf["url"], pdf["warc_ts"], pdf["html"]))
    assert got == want
    assert set(back["http_status"]) == {200}


def test_write_deterministic_and_guarded(spark, tmp_path):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "url": ["https://ex.org/a", "https://ex.org/b"],
            "warc_ts": pd.to_datetime([TS, TS]),
            "html": [b"one", b"two"],
        }
    )
    df = spark.createDataFrame(pdf)
    d1, d2 = str(tmp_path / "w1"), str(tmp_path / "w2")
    m1 = {
        r["warc_file"]: r["sha256"]
        for r in write_warc(df, d1, n_files=2).collect()
    }
    m2 = {
        r["warc_file"]: r["sha256"]
        for r in write_warc(df.repartition(7), d2, n_files=2).collect()
    }
    assert m1 == m2  # bytes independent of input partitioning
    # marker allows self-overwrite…
    write_warc(df, d1, n_files=2)
    # …but a foreign non-empty dir is refused
    foreign = tmp_path / "foreign"
    foreign.mkdir()
    (foreign / "precious.txt").write_text("keep me")
    with pytest.raises(ValueError, match="_WARC_SINK"):
        write_warc(df, str(foreign), n_files=2)
    assert (foreign / "precious.txt").read_text() == "keep me"


# ---------------------------------------------------------------- fuzz

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_rec = st.tuples(
    # header-legal URLs only: WARC field values are whitespace-trimmed
    # per the spec, so raw control/space chars can't round-trip (real
    # writers percent-encode them); bodies below stay fully arbitrary
    st.text(
        alphabet=st.characters(
            whitelist_categories=("L", "N", "P", "S"),
            blacklist_characters="\r\n",
        ),
        min_size=1,
        max_size=40,
    ).map(lambda s: "https://f.example/" + s),
    st.binary(min_size=0, max_size=300),  # arbitrary bytes incl CRLFCRLF
    st.booleans(),
)


@given(st.lists(_rec, min_size=1, max_size=8), st.booleans())
@settings(max_examples=150, deadline=None)
def test_fuzz_roundtrip_bytes(recs, compress_all):
    """Any (url, body) list survives serialize→[gzip]→parse with byte
    identity, record order, count — regardless of CRLF/WARC-looking
    delimiter bytes inside bodies."""
    blobs = []
    for url, body, _ in recs:
        r = build_record(url, TS, body)
        blobs.append(gzip.compress(r, mtime=0) if compress_all else r)
    blob = b"".join(blobs)
    rows = list(parse_warc_bytes(blob))
    assert len(rows) == len(recs)
    for row, (url, body, _) in zip(rows, recs):
        assert row["url"] == url
        assert row["html"] == body
        assert row["http_status"] == 200
