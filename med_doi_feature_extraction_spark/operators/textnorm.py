"""Portable text normalization — the pre-hash cleanup stage of a
curation pipeline (CCNet normalizes before line-hash dedup; our
``dedup.exact_dedup`` applies lower+whitespace-collapse — this
operator is the standalone, composable form with the full rule set).

Engine-portable by construction: every rule is in the Java∩RE2 regex
subset (same discipline as ``operators/pii.py``) or a 1:1 character
``translate``, so the DuckDB oracle runs the IDENTICAL expressions.
All scan-stage Column algebra — zero shuffle, whole-stage codegen,
linear in text size.

Rules (applied in this order; each individually toggleable):

1. ``strip_controls`` — drop C0 control chars (except ``\\t \\n \\r``,
   which the whitespace collapse owns) and DEL.
2. ``ascii_punct`` — map curly quotes / en-em dashes / ellipsis to
   their ASCII forms (1:1 ``translate``).
3. ``collapse_ws`` — any whitespace run → one space, then trim.
4. ``lowercase``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# C0 controls minus \t\n\r, plus DEL. RE2- and Java-safe.
CONTROL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"
# 1:1 unicode→ASCII punctuation map (translate semantics: i-th char of
# FROM becomes i-th char of TO).
PUNCT_FROM = "\u2019\u2018\u201c\u201d\u2013\u2014\u2026\u00a0"
PUNCT_TO = "''\"\"--. "


def normalize_expr(
    text: Column,
    lowercase: bool = True,
    strip_controls: bool = True,
    collapse_ws: bool = True,
    ascii_punct: bool = True,
) -> Column:
    """The normalization as a composable Column expression."""
    out = text
    if strip_controls:
        out = F.regexp_replace(out, CONTROL_RE, "")
    if ascii_punct:
        out = F.translate(out, PUNCT_FROM, PUNCT_TO)
    if collapse_ws:
        out = F.trim(F.regexp_replace(out, r"\s+", " "))
    if lowercase:
        out = F.lower(out)
    return out


def normalize_text(
    df: DataFrame,
    text_col: str,
    out_col: str = "norm_text",
    lowercase: bool = True,
    strip_controls: bool = True,
    collapse_ws: bool = True,
    ascii_punct: bool = True,
) -> DataFrame:
    """Append ``out_col`` (normalized text) and ``{out_col}_changed``
    (did any rule fire). NULL text stays NULL with a NULL changed flag
    — error-as-data, consistent with the quarantine convention."""
    norm = normalize_expr(
        F.col(text_col),
        lowercase=lowercase,
        strip_controls=strip_controls,
        collapse_ws=collapse_ws,
        ascii_punct=ascii_punct,
    )
    return df.withColumns(
        {
            out_col: norm,
            f"{out_col}_changed": F.col(text_col) != norm,
        }
    )


def normalize_sql(expr: str = "text") -> str:
    """The IDENTICAL normalization as DuckDB SQL (oracle twin; DuckDB
    ``regexp_replace`` needs the explicit 'g' flag Spark implies)."""
    out = expr
    out = f"regexp_replace({out}, '{CONTROL_RE}', '', 'g')"
    # translate with the same FROM/TO (unicode literals inline)
    out = f"translate({out}, '{PUNCT_FROM}', e'\\'\\'\"\"--. ')"
    out = f"trim(regexp_replace({out}, '\\s+', ' ', 'g'))"
    return f"lower({out})"
