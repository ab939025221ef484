"""Deflate compression-ratio kernel (kernels/compress.py): exact
goldens against direct zlib, null discipline, gate tails, and the
Spark path producing identical values to the plain function."""

from __future__ import annotations

import zlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from med_doi_feature_extraction_spark.kernels.compress import (
    LEVEL,
    compressibility_gate,
    deflate_ratio_series,
    with_deflate_ratio,
    zlib_fingerprint,
)

PROSE = (
    "The quick brown fox jumps over the lazy dog near the riverbank, "
    "while distant hills fade into an amber haze of early evening."
)
SPAM = "buy cheap buy cheap buy cheap " * 50
RANDOMISH = "9f86d081884c7d659a2feaa0c55ad015a3bf4f1b2b0b822cd15d6c15b0f00a08"


def _golden(s: str) -> float:
    b = s.encode("utf-8")
    return len(zlib.compress(b, LEVEL)) / len(b)


def test_series_goldens_exact():
    got = deflate_ratio_series(pd.Series([PROSE, SPAM, RANDOMISH, None, ""]))
    assert got[0] == _golden(PROSE)
    assert got[1] == _golden(SPAM)
    assert got[2] == _golden(RANDOMISH)
    assert got[3] == 1.0 and got[4] == 1.0  # null/empty convention


def test_tails_separate():
    # repetitive spam compresses far below prose; hex-ish text above
    assert _golden(SPAM) < 0.30 < _golden(PROSE) < _golden(RANDOMISH)


def test_spark_path_matches_plain_function(spark):
    rows = [(1, PROSE), (2, SPAM), (3, RANDOMISH), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.deflate_ratio
        for r in with_deflate_ratio(df).collect()
    }
    want = deflate_ratio_series(pd.Series([t for _, t in rows]))
    for i, (doc_id, _) in enumerate(rows):
        assert got[doc_id] == pytest.approx(want[i], abs=0.0)


def test_gate_flags_both_tails(spark):
    df = spark.createDataFrame(
        [(1, PROSE), (2, SPAM), (3, RANDOMISH)], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.comp_ok
        for r in compressibility_gate(df, min_len=0).collect()
    }
    # PROSE/RANDOMISH are short: ratio exceeds hi on fixed deflate
    # overhead when the length floor is disabled...
    assert got[2] is False
    # ...and the default floor exempts them (the point of min_len)
    got_floor = {
        r.doc_id: r.comp_ok for r in compressibility_gate(df).collect()
    }
    assert got_floor == {1: True, 2: False, 3: True}
    # tighten hi below the hex ratio: flags the high tail too
    got2 = {
        r.doc_id: r.comp_ok
        for r in compressibility_gate(df, hi=0.6, min_len=0).collect()
    }
    assert got2[3] is False


def test_fingerprint_mentions_level():
    assert f"level{LEVEL}" in zlib_fingerprint()
