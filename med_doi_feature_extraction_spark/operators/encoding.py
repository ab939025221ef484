"""Encoding-damage detection for web-crawl text curation.

Crawled text arrives with three classic encoding pathologies that
survive HTML extraction and poison tokenizers downstream (reference
behavior: the extract loop trusts `response.text` decoding,
`src/services/extraction_service.py` — damage detection is the
missing guard this engine adds for the 10^12-doc corpus):

- **replacement characters** (U+FFFD): the decoder already gave up —
  every one marks irrecoverably lost bytes;
- **stray C0/C1 control characters** (excluding ``\\t \\n \\r``):
  binary garbage or charset mislabeling;
- **mojibake digraphs**: UTF-8 bytes decoded as cp1252/Latin-1 — the
  ``â€™``-class artifacts (E2 80 99 read byte-per-byte) and the
  ``Ã©``-class (two-byte Latin letters split into ``Ã``/``Â`` + a
  high-punctuation char). These are *valid* Unicode, so only the
  digraph shape reveals them.

All pure Column regexp algebra in the Java∩RE2 portable subset
(same discipline as ``operators/pii.py``): no UDF, rides the scan
stage, whole-stage codegen, and the DuckDB oracle runs the identical
patterns — at 100 TB this is a zero-shuffle scan-stage annotation.

Detection, not repair: mojibake *repair* (ftfy-style round-trip
re-decode) is byte surgery that belongs in a mapInPandas kernel with
a codec library; this operator is the cheap filter/report pass that
decides which docs need it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# U+FFFD REPLACEMENT CHARACTER
REPLACEMENT_RE = "�"

# C0 controls minus tab/newline/CR, plus DEL (0x7F). C1 (U+0080-9F)
# controls are included: they never appear in legitimate web text and
# are the signature of cp1252 bytes relabeled as Latin-1.
CONTROL_RE = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F-]"

# UTF-8 read as cp1252: the three-byte punctuation class (E2 80 xx →
# "â€" + cp1252(xx)) and the two-byte Latin-letter class (C3/C2 xx →
# "Ã"/"Â" + U+00A0-00BF high punctuation). The second char of the
# three-byte class is the cp1252 image of 0x93-0xA6: “”˜™œ–—¦.
MOJIBAKE_RE = "â€[™œ˜“”–—¦]|[ÃÂ][ -¿]|ï»¿"


def encoding_features(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Add per-doc encoding-damage counts and ratios:

    ``repl_count``, ``ctrl_count``, ``moji_count`` (match counts of
    the three pattern classes), ``nonascii_ratio`` (chars outside
    printable ASCII+whitespace over total chars), and ``enc_clean``
    (no replacement chars, no stray controls, and fewer than 1
    mojibake digraph per 100 chars — the artifact classes that are
    always damage; nonascii_ratio is reported but not gated on, since
    non-Latin-script text is legitimately 100% non-ASCII).

    NULL text counts as empty (all-zero counts, ratio 0, clean) so a
    downstream ``filter(enc_clean)`` never silently drops null rows —
    the same null discipline as ``sampling.hash_uniform``.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    n = F.length(t)
    repl = F.regexp_count(t, F.lit(REPLACEMENT_RE))
    ctrl = F.regexp_count(t, F.lit(CONTROL_RE))
    moji = F.regexp_count(t, F.lit(MOJIBAKE_RE))
    nonascii = F.length(F.regexp_replace(t, r"[\x20-\x7E\t\n\r]", ""))
    ratio = (
        nonascii.cast("double") / F.greatest(n, F.lit(1)).cast("double")
    )
    return df.select(
        "*",
        repl.cast("long").alias("repl_count"),
        ctrl.cast("long").alias("ctrl_count"),
        moji.cast("long").alias("moji_count"),
        ratio.alias("nonascii_ratio"),
        (
            (repl == 0)
            & (ctrl == 0)
            & (
                moji.cast("double") * 100.0
                < F.greatest(n, F.lit(1)).cast("double")
            )
        ).alias("enc_clean"),
    )


def oracle_encoding_sql(text_expr: str) -> str:
    """DuckDB expressions computing the identical features — kept
    beside the Spark implementation so the patterns can't drift.
    Returns a SELECT-list fragment (no leading comma)."""
    t = f"coalesce({text_expr}, '')"
    return f"""
  CAST(len(regexp_extract_all({t}, '{REPLACEMENT_RE}')) AS BIGINT) AS repl_count,
  CAST(len(regexp_extract_all({t}, '{CONTROL_RE}')) AS BIGINT) AS ctrl_count,
  CAST(len(regexp_extract_all({t}, '{MOJIBAKE_RE}')) AS BIGINT) AS moji_count,
  CAST(length(regexp_replace({t}, '[\\x20-\\x7E\\t\\n\\r]', '', 'g')) AS DOUBLE)
    / greatest(length({t}), 1) AS nonascii_ratio,
  len(regexp_extract_all({t}, '{REPLACEMENT_RE}')) = 0
    AND len(regexp_extract_all({t}, '{CONTROL_RE}')) = 0
    AND CAST(len(regexp_extract_all({t}, '{MOJIBAKE_RE}')) AS DOUBLE) * 100.0
        < greatest(length({t}), 1) AS enc_clean"""
