"""C4 structural line filters + Unicode script census.

Both have hash-exact contract queries (`c4_filters`,
`script_profile`); these pin the per-rule semantics the corpus-wide
hash can't localize: which line survives WHY, CRLF handling, tie and
empty-text behavior of the script census."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from med_doi_feature_extraction_spark.kernels.script import (
    dominant_script,
    script_confidence,
    script_count,
)
from med_doi_feature_extraction_spark.operators.c4rules import (
    c4_clean,
    c4_line_stats,
)


def _one(spark, text):
    return spark.createDataFrame([(1, text)], ["doc_id", "text"])


DOC = "\n".join(
    [
        "This line is proper prose and ends well.",   # keep
        "no terminal punctuation here at all",        # drop: punct
        "Too short.",                                 # drop: <3 words
        "Please enable JavaScript to continue now.",  # drop: phrase
        "Second proper prose line also survives fine!",  # keep
        "Windows style line ends with a period.\r",   # keep: CRLF
        "",                                           # drop: empty
    ]
)


def test_line_predicate_and_rebuild(spark):
    out = c4_clean(_one(spark, DOC), "text", min_words=3, min_lines=2).first()
    kept = out["clean_text"].split("\n")
    assert kept == [
        "This line is proper prose and ends well.",
        "Second proper prose line also survives fine!",
        "Windows style line ends with a period.",  # \r stripped
    ]
    assert out["c4_keep"] is True


def test_cjk_terminal_punct(spark):
    doc = "你好世界 这是 中文 文本。\nLatin line without terminal punct here"
    out = c4_clean(_one(spark, doc), "text", min_words=3, min_lines=1).first()
    assert out["clean_text"] == "你好世界 这是 中文 文本。"
    assert out["c4_keep"] is True


def test_doc_gate_blockers(spark):
    good = "A fine line with words here.\nAnother fine line with words."
    for bad in ["Lorem Ipsum dolor sit.", "code { brace }"]:
        out = c4_clean(
            _one(spark, good + "\n" + bad), "text", min_lines=2
        ).first()
        assert out["c4_keep"] is False
    # min_lines: one surviving line is not enough
    out = c4_clean(_one(spark, good), "text", min_lines=3).first()
    assert out["c4_keep"] is False


def test_line_stats(spark):
    stats = c4_line_stats(F.col("text"))
    row = (
        _one(spark, DOC)
        .select(*(v.alias(k) for k, v in stats.items()))
        .first()
    )
    assert row["n_lines"] == 7
    assert row["n_kept_lines"] == 3
    # 5 of 6 non-empty lines end in terminal punct (all but line 2)
    assert row["end_punct_frac"] == pytest.approx(5 / 6, abs=1e-4)


@pytest.mark.parametrize(
    "text,script,n",
    [
        ("Привет, мир", "cyrillic", 9),
        ("你好世界 ok", "han", 4),
        ("naïve café", "latin", 9),  # Latin-1 supplement letters count
        ("مرحبا", "arabic", 5),
    ],
)
def test_script_count(spark, text, script, n):
    got = _one(spark, text).select(
        script_count(F.col("text"), script).alias("c")
    ).first()["c"]
    assert got == n


def test_dominant_and_confidence(spark):
    rows = [
        (1, "Привет мир это тест hi"),  # cyrillic-dominant
        (2, "1234 ... !!!"),            # no script chars
        (3, "ab Пр"),                   # tie 2-2 → latin (priority)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            dominant_script(F.col("text")).alias("d"),
            script_confidence(F.col("text")).alias("conf"),
        ).collect()
    }
    assert out[1]["d"] == "cyrillic" and out[1]["conf"] > 0.8
    assert out[2]["d"] == "none" and out[2]["conf"] == 0.0
    assert out[3]["d"] == "latin" and out[3]["conf"] == 0.5
