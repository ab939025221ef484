"""Compression-ratio quality signal (deflate bits-per-byte).

The cheapest content-agnostic quality probe a curation pipeline has:
text that deflate squeezes far below normal prose is repetitive
boilerplate (keyword stuffing, tag soup, template spam) even when it
passes token-level Gopher rules (operators/repetition.py catches
*exact* n-gram repetition; deflate's LZ77 window also catches
approximate and long-range repeats), and text that barely compresses
is usually base64/binary/random junk. Web-curation pipelines gate on
both tails.

This is the sanctioned Python path: zlib has no Column equivalent,
so it runs as an Arrow-batched pandas UDF (zlib itself is C — the
per-row cost is the deflate, not the interpreter). Plan shape at
100 TB: a scan-stage projection, no shuffle, parallel by input
partition. Determinism: zlib with a FIXED level and default strategy
is deterministic for a given zlib version; we pin level 6 and record
``zlib.ZLIB_VERSION`` in the manifest-facing helper so a cross-
cluster mismatch is visible instead of silent. The contract query is
rows-only (no SQL engine can express deflate); exact values are
pinned by pytest goldens computed with the same zlib.
"""

from __future__ import annotations

import zlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LEVEL = 6

# empty/NULL text: ratio 1.0 (incompressible by convention) keeps the
# low-tail gate (ratio < lo ⇒ repetitive) from flagging empty docs,
# mirroring the null discipline of the other quality operators.
_EMPTY_RATIO = 1.0


def deflate_ratio_series(texts: pd.Series) -> pd.Series:
    """compressed_len / raw_len (utf-8 bytes) per row — the plain
    function, importable by tests and by the driver for goldens."""

    def ratio(s) -> float:
        if s is None:
            return _EMPTY_RATIO
        b = str(s).encode("utf-8")
        if not b:
            return _EMPTY_RATIO
        return len(zlib.compress(b, LEVEL)) / len(b)

    return texts.map(ratio)


def with_deflate_ratio(
    df: DataFrame, text_col: str = "text", out_col: str = "deflate_ratio"
) -> DataFrame:
    """Add the deflate compression ratio as ``out_col`` (double)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _k(texts: pd.Series) -> pd.Series:
        return deflate_ratio_series(texts)

    return df.withColumn(out_col, _k(F.col(text_col)))


def compressibility_gate(
    df: DataFrame,
    text_col: str = "text",
    lo: float = 0.30,
    hi: float = 1.02,
    min_len: int = 200,
) -> DataFrame:
    """Two-tail gate: ``comp_ok`` is False for deflate ratios below
    ``lo`` (template/repeat spam) or above ``hi`` (already-compressed
    or random bytes masquerading as text). Docs shorter than
    ``min_len`` chars pass unconditionally: deflate's fixed ~11-byte
    stream overhead dominates short texts and pushes even clean prose
    past 1.0, so the ratio is only meaningful above a length floor —
    the same reason the Gopher repetition rules gate on doc length.
    Thresholds are corpus-tunable — calibrate on a
    ``quantile_sample`` of the ratio column rather than trusting the
    defaults blindly."""
    out = with_deflate_ratio(df, text_col)
    return out.withColumn(
        "comp_ok",
        (F.length(F.coalesce(F.col(text_col), F.lit(""))) < min_len)
        | (
            (F.col("deflate_ratio") >= lo)
            & (F.col("deflate_ratio") <= hi)
        ),
    )


def zlib_fingerprint() -> str:
    """Version string to record alongside outputs: deflate output is
    only guaranteed reproducible for the same zlib build."""
    return f"zlib-{zlib.ZLIB_VERSION}-level{LEVEL}"
