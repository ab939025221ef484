"""normalize_text: each rule pinned, toggles, null handling."""

from __future__ import annotations

import pandas as pd

from med_doi_feature_extraction_spark.operators.textnorm import normalize_text


def _norm(spark, text, **kw):
    df = spark.createDataFrame(pd.DataFrame({"text": [text]}))
    row = normalize_text(df, "text", **kw).collect()[0]
    return row.norm_text, row.norm_text_changed


def test_all_rules(spark):
    got, changed = _norm(spark, "\x01Hello’s   “WORLD”—ok now\x7f")
    assert got == "hello's \"world\"-ok now"
    assert changed is True


def test_controls_stripped_but_ws_controls_collapse(spark):
    got, _ = _norm(spark, "a\x00b\tc\nd")
    assert got == "ab c d"  # NUL dropped, tab/newline become spaces


def test_unchanged_flag(spark):
    got, changed = _norm(spark, "already normal text")
    assert got == "already normal text"
    assert changed is False


def test_toggles(spark):
    got, _ = _norm(spark, "A—B", lowercase=False, ascii_punct=False)
    assert got == "A—B"
    got, _ = _norm(spark, "A  B", collapse_ws=False)
    assert got == "a  b"


def test_null_passthrough(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"text": pd.array([None], dtype="string")})
    )
    row = normalize_text(df, "text").collect()[0]
    assert row.norm_text is None and row.norm_text_changed is None


def test_ellipsis_and_nbsp(spark):
    got, _ = _norm(spark, "wait\u2026 what\u00a0here")
    assert got == "wait. what here"
