"""Content-defined chunking (Gear/FastCDC-style) for byte-level
shared-content detection across documents.

Exact dedup (``dedup.exact_dedup``) catches identical documents;
minhash/simhash catch near-identical token sets. CDC catches the
third shape: documents that SHARE LARGE BYTE RANGES without being
globally similar — template pages with inserted content, partially
re-crawled snapshots, concatenated boilerplate. Chunk boundaries are
chosen by the CONTENT (a rolling Gear hash hitting a mask), so an
insertion early in a document shifts at most one chunk — unlike
fixed-size blocks where one inserted byte re-keys every block after
it (Muthitacharoen et al., LBFS SOSP'01; Xia et al., FastCDC
ATC'16).

Algorithm: rolling hash ``h_i = 2·h_{i−1} + G[b_i] (mod 2^64)`` over
a deterministic 256-entry Gear table (sha256-derived — engine- and
platform-stable). Because the recurrence left-shifts, only the last
64 bytes influence ``h_i``, giving the closed form
``h_i = Σ_{k=0..63} G[b_{i−k}] << k`` — which vectorizes as 64
shifted numpy adds over the whole byte array (no per-byte Python).
A position ends a chunk when ``h & (avg_size−1) == 0``; a greedy
pass over the CANDIDATE list (≈ n/avg_size entries, not n) enforces
``min_size``/``max_size``.

Chunk identity is ``sha256(chunk bytes)`` (prefix), so the chunk
table is an engine-portable artifact: DuckDB can recompute every
hash from (offset, length) + the source text and the contract query
does exactly that — only the boundary positions come from the
kernel, everything downstream is independently verified.

Scale shape: chunking is an Arrow-batched ``mapInPandas`` scan (the
payload column never shuffles); the chunk table shuffles on the
8-to-16-byte ``chunk_hash`` only — the same slim-key story as
``paragraphs.paragraph_dedup``, with partial aggregation absorbing
hot boilerplate chunks and AQE splitting residual join skew.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_GEAR_WINDOW = 64


def gear_table(seed: int = 1) -> np.ndarray:
    """256 deterministic uint64 Gear values: first 8 bytes of
    ``sha256("gear:<seed>:<byte>")`` — reproducible everywhere, no
    RNG state."""
    out = np.empty(256, dtype=np.uint64)
    for i in range(256):
        d = hashlib.sha256(f"gear:{seed}:{i}".encode()).digest()
        out[i] = int.from_bytes(d[:8], "big")
    return out


def rolling_gear(data: bytes, gear: np.ndarray) -> np.ndarray:
    """Per-position rolling hash via the 64-shift closed form —
    vectorized over the byte array (64 numpy passes, zero per-byte
    Python). uint64 wraparound is the mod 2^64 of the recurrence."""
    g = gear[np.frombuffer(data, dtype=np.uint8)]
    h = np.zeros(len(g), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for k in range(min(_GEAR_WINDOW, len(g))):
            if k == 0:
                h += g
            else:
                h[k:] += g[:-k] << np.uint64(k)
    return h


def chunk_spans(
    data: bytes,
    gear: np.ndarray,
    min_size: int = 64,
    avg_size: int = 256,
    max_size: int = 1024,
) -> list[tuple[int, int]]:
    """(offset, length) spans covering ``data`` exactly once, in
    order. ``avg_size`` must be a power of two (the boundary mask).
    Greedy over mask-hit candidates: first hit in
    ``[start+min_size, start+max_size)`` cuts, else a forced cut at
    ``start+max_size``; the final chunk may be shorter than
    ``min_size``."""
    if avg_size & (avg_size - 1):
        raise ValueError("avg_size must be a power of two")
    if not 0 < min_size <= avg_size <= max_size:
        raise ValueError("need 0 < min_size <= avg_size <= max_size")
    n = len(data)
    if n == 0:
        return []
    h = rolling_gear(data, gear)
    mask = np.uint64(avg_size - 1)
    cands = (np.flatnonzero((h & mask) == 0) + 1).tolist()
    spans: list[tuple[int, int]] = []
    start, ci = 0, 0
    while start < n:
        lo, hi = start + min_size, start + max_size
        while ci < len(cands) and cands[ci] < lo:
            ci += 1
        if ci < len(cands) and cands[ci] < min(hi, n):
            cut = cands[ci]
        elif hi < n:
            cut = hi
        else:
            spans.append((start, n - start))
            break
        spans.append((start, cut - start))
        start = cut
    return spans


def with_cdc_chunks(
    df: DataFrame,
    id_col: str,
    bytes_col: str,
    min_size: int = 64,
    avg_size: int = 256,
    max_size: int = 1024,
    seed: int = 1,
    hash_hex_len: int = 16,
) -> DataFrame:
    """Chunk table ``(id, chunk_idx, offset, length, chunk_hash)`` —
    one row per CDC chunk, hash = sha256-hex prefix of the chunk
    bytes. Arrow-batched ``mapInPandas``; accepts a binary or string
    payload column (strings chunk their utf-8 bytes)."""
    id_field = df.schema[id_col]
    schema = T.StructType(
        [
            T.StructField(id_col, id_field.dataType),
            T.StructField("chunk_idx", T.IntegerType()),
            T.StructField("offset", T.LongType()),
            T.StructField("length", T.LongType()),
            T.StructField("chunk_hash", T.StringType()),
        ]
    )

    def chunker(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gear = gear_table(seed)
        for pdf in it:
            ids, idxs, offs, lens, hashes = [], [], [], [], []
            for rid, payload in zip(pdf[id_col], pdf[bytes_col]):
                if payload is None:
                    continue
                data = (
                    payload.encode("utf-8")
                    if isinstance(payload, str)
                    else bytes(payload)
                )
                for i, (off, ln) in enumerate(
                    chunk_spans(data, gear, min_size, avg_size, max_size)
                ):
                    ids.append(rid)
                    idxs.append(i)
                    offs.append(off)
                    lens.append(ln)
                    hashes.append(
                        hashlib.sha256(
                            data[off : off + ln]
                        ).hexdigest()[:hash_hex_len]
                    )
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype=pdf[id_col].dtype),
                    "chunk_idx": pd.Series(idxs, dtype="int32"),
                    "offset": pd.Series(offs, dtype="int64"),
                    "length": pd.Series(lens, dtype="int64"),
                    "chunk_hash": pd.Series(hashes, dtype="object"),
                }
            )

    return df.select(id_col, bytes_col).mapInPandas(chunker, schema)


def cdc_dup_stats(chunks: DataFrame, id_col: str) -> DataFrame:
    """Per-document shared-content profile from a CDC chunk table:
    ``n_chunks``, ``total_bytes``, ``dup_chunks``/``dup_bytes`` —
    chunks whose hash occurs in MORE THAN ONE distinct document
    (cross-document sharing, not within-doc repeats) — and
    ``dup_frac`` (round 6; NULL for empty docs can't occur — empty
    docs produce no chunks).

    Two hash-aggs on the slim ``chunk_hash`` key (distinct-doc count,
    then the per-doc rollup after an equi-join on the hash); partial
    agg absorbs hot boilerplate chunks, AQE handles residual skew.
    """
    docs_per_hash = chunks.groupBy("chunk_hash").agg(
        F.countDistinct(F.col(id_col)).alias("_docs")
    )
    joined = chunks.join(docs_per_hash, "chunk_hash")
    shared = F.col("_docs") > 1
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("length").alias("total_bytes"),
        F.sum(shared.cast("long")).alias("dup_chunks"),
        F.sum(F.when(shared, F.col("length")).otherwise(F.lit(0))).alias(
            "dup_bytes"
        ),
        F.round(
            F.sum(F.when(shared, F.col("length")).otherwise(F.lit(0)))
            / F.sum("length"),
            6,
        ).alias("dup_frac"),
    )
