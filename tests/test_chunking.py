"""chunk_documents: coverage, overlap, tail rule, edge cases."""

from __future__ import annotations

import pandas as pd
import pytest

from med_doi_feature_extraction_spark.operators.chunking import chunk_documents


def _mk(spark, texts):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )


def _words(n, tag=""):
    return " ".join(f"t{tag}{i}" for i in range(n))


def test_chunk_basic_layout(spark):
    # 25 tokens, chunk 10, overlap 3 → stride 7 → starts 0,7,14,21
    df = _mk(spark, [_words(25)])
    out = (
        chunk_documents(df, "doc_id", "text", chunk_tokens=10, overlap=3)
        .orderBy("chunk_id")
        .toPandas()
    )
    assert list(out.chunk_start) == [0, 7, 14, 21]
    assert list(out.chunk_id) == [0, 1, 2, 3]
    assert list(out.chunk_len) == [10, 10, 10, 4]
    assert out.chunk_text.iloc[0] == " ".join(f"t{i}" for i in range(10))
    # consecutive chunks share exactly `overlap` tokens
    a = out.chunk_text.iloc[0].split()
    b = out.chunk_text.iloc[1].split()
    assert a[-3:] == b[:3]
    # last chunk is the true tail
    assert out.chunk_text.iloc[-1] == "t21 t22 t23 t24"


def test_chunk_tail_rule_drops_redundant_suffix(spark):
    # 90 tokens, chunk 50, overlap 10 → stride 40 → starts 0,40; 80 is
    # dropped: chunk[40] already covers tokens 40..90, so the window at
    # 80 adds nothing.
    df = _mk(spark, [_words(90)])
    out = chunk_documents(df, "doc_id", "text", chunk_tokens=50, overlap=10).toPandas()
    assert sorted(out.chunk_start) == [0, 40]
    # full coverage regardless
    covered = set()
    for _, r in out.iterrows():
        covered.update(range(r.chunk_start, r.chunk_start + r.chunk_len))
    assert covered == set(range(90))


@pytest.mark.parametrize("n", [1, 9, 10, 11, 39, 40, 41, 200])
def test_chunk_full_coverage_property(spark, n):
    df = _mk(spark, [_words(n)])
    out = chunk_documents(df, "doc_id", "text", chunk_tokens=40, overlap=10).toPandas()
    covered = set()
    for _, r in out.iterrows():
        covered.update(range(r.chunk_start, r.chunk_start + r.chunk_len))
    assert covered == set(range(n))
    # positional fidelity: token at absolute position p equals f"t{p}"
    for _, r in out.iterrows():
        words = r.chunk_text.split()
        assert words == [f"t{p}" for p in range(r.chunk_start, r.chunk_start + r.chunk_len)]


def test_chunk_empty_and_single(spark):
    df = _mk(spark, ["", "   ", "solo"])
    out = chunk_documents(df, "doc_id", "text", chunk_tokens=8, overlap=2).toPandas()
    assert sorted(out.doc_id) == [2]
    assert out.chunk_text.iloc[0] == "solo"
    assert out.chunk_len.iloc[0] == 1


def test_chunk_no_overlap(spark):
    df = _mk(spark, [_words(10)])
    out = chunk_documents(df, "doc_id", "text", chunk_tokens=5, overlap=0).toPandas()
    assert sorted(out.chunk_start) == [0, 5]


def test_chunk_bad_params(spark):
    df = _mk(spark, ["x"])
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", chunk_tokens=10, overlap=10)
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", chunk_tokens=10, overlap=-1)
