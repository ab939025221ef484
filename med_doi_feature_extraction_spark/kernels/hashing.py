"""Vectorized hashing kernels: minhash signatures, simhash, fingerprints.

These are numpy-vectorized pandas kernels (Arrow batch in/out) used by
the dedup operators. They're the documented "slow path" exception —
set-hashing over variable-length shingle sets isn't expressible with
built-in Column functions without exploding data volume, so we batch
it through numpy (north-rule compliant: pandas/Arrow UDF, no
per-row Spark Python UDFs).

All constants are part of the kernel version: changing them changes
signatures, so bump ``HASHING_VERSION``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from med_doi_feature_extraction_spark.kernels.registry import register_kernel

HASHING_VERSION = "1.0.0"

_MERSENNE_61 = (1 << 61) - 1
_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def _fnv1a_64(token: str) -> np.uint64:
    """Deterministic 64-bit FNV-1a hash of a UTF-8 string (stable
    across processes, unlike Python's salted ``hash``)."""
    h = _FNV_OFFSET
    with np.errstate(over="ignore"):
        for b in token.encode("utf-8"):
            h = np.uint64(h ^ np.uint64(b)) * _FNV_PRIME
    return h


def char_shingles(text: str, k: int = 5) -> np.ndarray:
    """Distinct k-char shingle hashes of whitespace-normalized text."""
    norm = " ".join(text.split()).lower()
    if len(norm) < k:
        norm = norm.ljust(k, "_")
    shingles = {norm[i : i + k] for i in range(len(norm) - k + 1)}
    return np.fromiter(
        (_fnv1a_64(s) for s in shingles), dtype=np.uint64, count=len(shingles)
    )


def _minhash_params(n_hashes: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE_61, size=n_hashes, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE_61, size=n_hashes, dtype=np.uint64)
    return a, b


@register_kernel("minhash_signature", HASHING_VERSION)
def minhash_signatures(
    texts: pd.Series, n_hashes: int = 64, shingle_k: int = 5, seed: int = 42
) -> pd.Series:
    """Series[str] → Series[list[int64]]: minhash signature per doc.

    sig[i] = min over shingles s of ((a_i * h(s) + b_i) mod M61),
    folded to signed int64 for Spark's ArrayType(LongType).
    """
    a, b = _minhash_params(n_hashes, seed)
    out = []
    for text in texts:
        if text is None or (isinstance(text, float) and np.isnan(text)):
            out.append(None)
            continue
        sh = char_shingles(str(text), shingle_k).astype(np.object_)
        # object dtype → Python ints → exact 61-bit modular arithmetic
        # without uint64 overflow.
        vals = (a.astype(np.object_)[:, None] * sh[None, :] + b.astype(np.object_)[:, None]) % _MERSENNE_61
        out.append([int(v) for v in vals.min(axis=1)])
    return pd.Series(out, index=texts.index, dtype=object)


@register_kernel("simhash64", HASHING_VERSION)
def simhash64(texts: pd.Series) -> pd.Series:
    """Series[str] → Series[int64]: 64-bit SimHash over whitespace
    tokens (unweighted). Near-dups have small Hamming distance."""
    out = np.zeros(len(texts), dtype=np.int64)
    mask = np.ones(len(texts), dtype=bool)
    bits = np.arange(64, dtype=np.uint64)
    for i, text in enumerate(texts):
        if text is None or (isinstance(text, float) and np.isnan(text)):
            mask[i] = False
            continue
        tokens = str(text).lower().split()
        if not tokens:
            out[i] = 0
            continue
        hashes = np.fromiter(
            (_fnv1a_64(t) for t in tokens), dtype=np.uint64, count=len(tokens)
        )
        # bit matrix: (n_tokens, 64) of {0,1} → vote per bit
        bitvotes = ((hashes[:, None] >> bits[None, :]) & np.uint64(1)).sum(axis=0)
        sign = bitvotes * 2 > len(tokens)
        out[i] = np.int64(
            np.bitwise_or.reduce(np.where(sign, np.uint64(1) << bits, np.uint64(0))).astype(np.int64)
        )
    res = pd.Series(out, index=texts.index)
    return res.where(mask, other=None).astype(object) if not mask.all() else res


@register_kernel("fingerprint64", HASHING_VERSION)
def fingerprint64(texts: pd.Series) -> pd.Series:
    """Series[str] → Series[int64]: polynomial rolling hash of the
    whitespace/case-normalized text — a cheap exact-dup document
    fingerprint (content-identity, not near-dup)."""
    out = []
    for text in texts:
        if text is None or (isinstance(text, float) and np.isnan(text)):
            out.append(None)
            continue
        norm = " ".join(str(text).split()).lower()
        h = 0
        for ch in norm.encode("utf-8"):
            h = (h * 131 + ch) % _MERSENNE_61
        out.append(int(np.int64(h)))
    return pd.Series(out, index=texts.index, dtype=object)


def hamming64(a: int, b: int) -> int:
    """Hamming distance between two 64-bit ints (signed-safe)."""
    return bin((int(a) ^ int(b)) & ((1 << 64) - 1)).count("1")
