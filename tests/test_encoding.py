"""Encoding-damage detection (operators/encoding.py): pattern
semantics, null discipline, and cross-engine (DuckDB) parity —
the properties the encoding_quality contract query relies on."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from med_doi_feature_extraction_spark.operators.encoding import (
    encoding_features,
    oracle_encoding_sql,
)

ROWS = [
    (1, "plain ascii text"),
    (2, "itâ€™s a cafÃ© ï»¿"),
    (3, "bad \x01\x02 ctrl and � repl"),
    (4, "NÃO GRANDE São Paulo"),  # legit Ã + ASCII: clean
    (5, None),
    (6, "日本語のテキスト"),
    (7, "c1 stray \x85 control"),
]


@pytest.fixture(scope="module")
def feats(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    return {
        r.doc_id: r for r in encoding_features(df).collect()
    }


def test_replacement_and_control_counts(feats):
    assert feats[3].repl_count == 1
    assert feats[3].ctrl_count == 2
    assert not feats[3].enc_clean
    # C1 controls (cp1252-relabeling signature) are stray controls too
    assert feats[7].ctrl_count == 1 and not feats[7].enc_clean


def test_mojibake_digraphs_not_legit_letters(feats):
    # â€™-class, Ã©-class and BOM artifact all counted
    assert feats[2].moji_count == 3 and not feats[2].enc_clean
    # uppercase Ã followed by ASCII (Portuguese) is NOT mojibake
    assert feats[4].moji_count == 0 and feats[4].enc_clean


def test_nonascii_reported_not_gated(feats):
    # pure-CJK text: ratio 1.0 but perfectly clean
    assert feats[6].nonascii_ratio == 1.0 and feats[6].enc_clean
    assert feats[1].nonascii_ratio == 0.0 and feats[1].enc_clean


def test_null_text_is_clean_not_dropped(feats):
    r = feats[5]
    assert (r.repl_count, r.ctrl_count, r.moji_count) == (0, 0, 0)
    assert r.nonascii_ratio == 0.0 and r.enc_clean


def test_duckdb_parity(feats):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", ROWS)
    want = con.execute(
        f"SELECT doc_id, {oracle_encoding_sql('text')} FROM t"
    ).fetchall()
    for doc_id, repl, ctrl, moji, ratio, clean in want:
        r = feats[doc_id]
        assert (r.repl_count, r.ctrl_count, r.moji_count) == (
            repl,
            ctrl,
            moji,
        ), doc_id
        assert r.nonascii_ratio == pytest.approx(ratio, abs=1e-12)
        assert r.enc_clean == clean
