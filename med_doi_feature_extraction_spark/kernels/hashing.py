"""Vectorized hashing kernels: minhash signatures, simhash, fingerprints.

These are numpy-vectorized pandas kernels (Arrow batch in/out) used by
the dedup operators. They're the documented "slow path" exception —
set-hashing over variable-length shingle sets isn't expressible with
built-in Column functions without exploding data volume, so we batch
it through numpy (north-rule compliant: pandas/Arrow UDF, no
per-row Spark Python UDFs).

Hot-path design (v2.0): all three kernels are vectorized ACROSS the
whole Arrow batch, not per document —

- minhash: every doc's UTF-8 bytes are concatenated into one buffer,
  shingle codes come from ONE strided sliding-window matmul over the
  buffer (windows crossing doc boundaries masked out by index
  arithmetic), and the per-doc signature minimum is a segmented
  ``np.minimum.reduceat`` over the (H × windows) hash matrix, chunked
  so the matrix stays bounded in memory. Values are bit-identical to
  v1.1 (same a/b params, same mod-M31 math; the v1.1 ``np.unique``
  was redundant — a min over a multiset equals the min over its set).
- simhash: token hashing cost drops from O(total tokens) Python to
  O(unique tokens per batch) via ``pd.factorize``; per-doc bit votes
  are a segmented ``np.add.reduceat`` over the unique-token bit
  matrix. crc32 token hashes are unchanged → signatures identical.
- fingerprint64: per-byte Python Horner replaced by a fully
  vectorized dual polynomial hash mod M31 (bases 131/137) over the
  same concatenated buffer, combined into 64 bits. OUTPUT CHANGED
  vs v1.x (hence the major version bump); it remains a deterministic
  content-identity fingerprint.

All constants are part of the kernel version: changing them changes
signatures, so bump ``HASHING_VERSION``.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd

from med_doi_feature_extraction_spark.kernels.registry import register_kernel

HASHING_VERSION = "2.0.0"

_M31 = np.uint64((1 << 31) - 1)


def _is_null(v) -> bool:
    return v is None or (isinstance(v, float) and np.isnan(v))


def _normalize_bytes(text: str, k: int) -> bytes:
    """Whitespace/case-normalized UTF-8 bytes, padded to ≥ k bytes
    (identical to the v1.1 per-doc normalization)."""
    norm = " ".join(text.split()).lower()
    if len(norm) < k:
        norm = norm.ljust(k, "_")
    raw = norm.encode("utf-8")
    if len(raw) < k:  # multi-byte chars shrink char-count; repad
        raw = norm.ljust(k, "_").encode("utf-8")
    return raw


def char_shingles(text: str, k: int = 5) -> np.ndarray:
    """Distinct k-char shingles of whitespace/case-normalized text,
    encoded injectively (base-257 over UTF-8 bytes, k ≤ 7) and reduced
    mod M31. Returns sorted unique uint64 values < 2^31-1."""
    raw = np.frombuffer(_normalize_bytes(text, k), dtype=np.uint8)
    win = np.lib.stride_tricks.sliding_window_view(raw, k).astype(np.uint64)
    powers = (np.uint64(257) ** np.arange(k, dtype=np.uint64)).astype(np.uint64)
    codes = (win * powers[None, :]).sum(axis=1)  # < 257^5 ≈ 2^40, exact
    return np.unique(codes % _M31)


def _minhash_params(n_hashes: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_M31), size=n_hashes, dtype=np.uint64)
    b = rng.integers(0, int(_M31), size=n_hashes, dtype=np.uint64)
    return a, b


def _segments(texts: pd.Series, k: int):
    """Concatenate normalized doc bytes; return (buffer, starts, lens,
    null_mask) where doc i's bytes are buffer[starts[i]:starts[i]+lens[i]]."""
    bufs: list[bytes] = []
    null = np.zeros(len(texts), dtype=bool)
    for i, text in enumerate(texts):
        if _is_null(text):
            null[i] = True
            bufs.append(b"_" * k)  # placeholder; masked out of output
        else:
            bufs.append(_normalize_bytes(str(text), k))
    lens = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=len(bufs))
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    buffer = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    return buffer, starts, lens, null


def _ranges(counts: np.ndarray) -> np.ndarray:
    """[0..c0-1, 0..c1-1, ...] without a Python loop."""
    total = int(counts.sum())
    ends = np.cumsum(counts)
    return np.arange(total) - np.repeat(ends - counts, counts)


@register_kernel("minhash_signature", HASHING_VERSION)
def minhash_signatures(
    texts: pd.Series, n_hashes: int = 64, shingle_k: int = 5, seed: int = 42
) -> pd.Series:
    """Series[str] → Series[list[int64]]: minhash signature per doc.

    sig[i] = min over shingles x of ((a_i·x + b_i) mod M31); products
    stay < 2^62 so plain uint64 arithmetic is exact. Batch-vectorized:
    one sliding-window pass over all docs' bytes + segmented reduceat.
    """
    a, b = _minhash_params(n_hashes, seed)
    if len(texts) == 0:
        return pd.Series([], index=texts.index, dtype=object)
    buffer, starts, lens, null = _segments(texts, shingle_k)
    k = shingle_k
    total = len(buffer)
    # Horner-free shifted-slice sum: codes[g] = Σ_j buf[g+j]·257^j —
    # k 1-D vectorized ops, no (W × k) materialization. Products stay
    # < 257^5 ≈ 2^40 (k ≤ 7 < 2^56), exact in uint64.
    buf64 = buffer.astype(np.uint64)
    n_codes = total - k + 1
    codes_all = np.zeros(n_codes, dtype=np.uint64)
    p = np.uint64(1)
    for j in range(k):
        codes_all += buf64[j : j + n_codes] * p
        p = p * np.uint64(257)
    codes_all %= _M31

    nwin = lens - k + 1  # ≥ 1 per doc by padding
    valid_idx = np.repeat(starts, nwin) + _ranges(nwin)
    codes = codes_all[valid_idx]  # doc-contiguous shingle codes

    # Global (doc, shingle) dedup in ONE sort: pack seg_id into the
    # high bits (code < 2^31). Repetitive docs (boilerplate) shrink
    # by 10-100×, and the n_hashes-lane work below runs on the
    # deduped array. seg ids stay sorted, so segment boundaries for
    # reduceat come from searchsorted.
    seg_ids = np.repeat(
        np.arange(len(texts), dtype=np.uint64), nwin
    )
    keys = (seg_ids << np.uint64(31)) | codes
    ukeys = np.unique(keys)
    useg = (ukeys >> np.uint64(31)).astype(np.int64)
    ucodes = ukeys & _M31  # NB: code==M31 impossible (values < M31)
    seg_starts = np.searchsorted(useg, np.arange(len(texts))).astype(np.int64)

    sigs = np.empty((len(texts), n_hashes), dtype=np.uint64)
    # lane-at-a-time over the flat deduped codes: one multiply-add +
    # mod + segmented min per hash lane — O(U) scratch, reused across
    # lanes (in-place ops: allocation-free hot loop)
    vals = np.empty_like(ucodes)
    for i in range(n_hashes):
        np.multiply(ucodes, a[i], out=vals)  # a·x + b < 2^62, exact
        vals += b[i]
        vals %= _M31
        sigs[:, i] = np.minimum.reduceat(vals, seg_starts)

    out = [None if null[i] else sigs[i].astype(np.int64).tolist() for i in range(len(texts))]
    return pd.Series(out, index=texts.index, dtype=object)


def _token_hash64(token: str) -> int:
    """Stable 64-bit token hash from two salted crc32s (C speed)."""
    data = token.encode("utf-8")
    return zlib.crc32(data) | (zlib.crc32(data, 0x9E3779B9) << 32)


@register_kernel("simhash64", HASHING_VERSION)
def simhash64(texts: pd.Series) -> pd.Series:
    """Series[str] → Series[int64]: 64-bit SimHash over whitespace
    tokens (unweighted). Near-dups have small Hamming distance.

    Batch-vectorized: tokens across the whole batch are factorized so
    crc32 runs once per UNIQUE token; per-doc bit votes come from one
    segmented reduceat over the unique-token bit matrix."""
    n = len(texts)
    out = np.zeros(n, dtype=np.int64)
    mask = np.ones(n, dtype=bool)
    tok_lists: list[list[str]] = []
    for i, text in enumerate(texts):
        if _is_null(text):
            mask[i] = False
            tok_lists.append([])
        else:
            tok_lists.append(str(text).lower().split())
    counts = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=n)
    total = int(counts.sum())
    if total:
        flat = np.empty(total, dtype=object)
        pos = 0
        for t in tok_lists:
            flat[pos : pos + len(t)] = t
            pos += len(t)
        codes, uniques = pd.factorize(flat)
        uh = np.fromiter(
            (_token_hash64(t) for t in uniques), dtype=np.uint64, count=len(uniques)
        )
        bits = np.arange(64, dtype=np.uint64)
        ubits = ((uh[:, None] >> bits[None, :]) & np.uint64(1)).astype(np.int32)
        # segmented vote sum; empty docs (counts==0) handled by masking
        nonempty_idx = np.flatnonzero(counts > 0)
        seg_starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        weights = (np.uint64(1) << bits).astype(np.uint64)
        # chunk the (tokens × 64) gather so peak memory stays bounded
        chunk_tokens = 1 << 18
        lo = 0
        while lo < len(nonempty_idx):
            hi = lo + 1
            d0 = nonempty_idx[lo]
            t0 = int(seg_starts[d0])
            t1 = t0 + int(counts[d0])
            while hi < len(nonempty_idx) and t1 - t0 < chunk_tokens:
                d = nonempty_idx[hi]
                t1 = int(seg_starts[d] + counts[d])
                hi += 1
            docs = nonempty_idx[lo:hi]
            local_starts = (seg_starts[docs] - t0).astype(np.int64)
            votes = np.add.reduceat(ubits[codes[t0:t1]], local_starts, axis=0)
            sign = votes * 2 > counts[docs][:, None]
            vals = np.where(sign, weights[None, :], np.uint64(0))
            out[docs] = np.bitwise_or.reduce(vals, axis=1).astype(np.int64)
            lo = hi
    if mask.all():
        return pd.Series(out, index=texts.index)
    # NOTE: Series.where(..., other=None) would upcast int64→float64
    # and silently corrupt low bits — build the object column directly.
    return pd.Series(
        [int(out[i]) if mask[i] else None for i in range(n)],
        index=texts.index,
        dtype=object,
    )


_FP_BASES = (np.uint64(131), np.uint64(137))


@register_kernel("fingerprint64", HASHING_VERSION)
def fingerprint64(texts: pd.Series) -> pd.Series:
    """Series[str] → Series[int64]: dual polynomial rolling hash of the
    whitespace/case-normalized text — a cheap exact-dup document
    fingerprint (content-identity, not near-dup). Two independent
    mod-M31 polynomial hashes (bases 131, 137) packed into 64 bits;
    fully vectorized over the concatenated batch buffer (no per-byte
    Python)."""
    if len(texts) == 0:
        return pd.Series([], index=texts.index, dtype=object)
    buffer, starts, lens, null = _segments(texts, 1)
    max_len = int(lens.max())
    ends = starts + lens
    # exponent of the base at each global position: e_i - 1 - g
    exps = (np.repeat(ends, lens) - 1 - np.arange(int(lens.sum()))).astype(np.int64)
    data = buffer.astype(np.uint64)
    halves = []
    for base in _FP_BASES:
        # power table mod M31 by doubling: O(log n) vectorized steps
        ptable = np.array([np.uint64(1)], dtype=np.uint64)
        while len(ptable) < max_len:
            step = (ptable[-1] * base) % _M31
            ptable = np.concatenate((ptable, (ptable * step) % _M31))
        ptable = ptable[:max_len]
        prods = (data * ptable[exps]) % _M31  # byte·pow < 2^39
        sums = np.add.reduceat(prods, starts) % _M31
        halves.append(sums)
    packed = ((halves[0] << np.uint64(32)) | halves[1]).astype(np.int64)
    if null.any():
        return pd.Series(
            [None if null[i] else int(packed[i]) for i in range(len(texts))],
            index=texts.index,
            dtype=object,
        )
    return pd.Series(packed, index=texts.index)


def hamming64(a: int, b: int) -> int:
    """Hamming distance between two 64-bit ints (signed-safe)."""
    return bin((int(a) ^ int(b)) & ((1 << 64) - 1)).count("1")
