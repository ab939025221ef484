"""Perceptual image hashing (dHash) + Hamming near-dup for binary
image columns — image-level dedup for multimodal training corpora.

Exact-byte dedup (sha256 over the payload) misses re-encoded /
resized / slightly-recompressed copies of the same picture; the
standard fix is a perceptual hash. dHash (difference hash): decode →
grayscale → bilinear-resample to 9×8 → 64 bits of "is the pixel
brighter than its right neighbor". Visually-identical images land
within a few bits; the near-dup join is then EXACTLY the simhash
machinery: 4×16-bit band blocking (pigeonhole: Hamming ≤ 3 ⇒ one band
equal), hot-bucket cap, streamed pair expansion, JVM
``bit_count(xor)`` verify — ``dedup.simhash_pairs_from_sigs`` is
reused verbatim, so the scale story (bucketed, capped, never
all-pairs) is inherited, already skew-tested, and the banding+verify
half stays DuckDB-reproducible from a materialized signature seam.

Decode honesty (same contract as ``binary_ops.decode_image``): PNG
decodes for real via the pure-stdlib codec; other formats and corrupt
payloads become error-as-data rows (NULL phash + ``decode_error``) —
quarantined, never dropped silently. The kernel is an Arrow-batched
pandas UDF; the per-payload Python loop inside is the honest cost of
a pure-Python codec (a cluster with PIL/turbojpeg swaps the decode
line and keeps everything else).

Reference tie-in: the reference's per-record map stage
(``src/services/extraction_service.py``) is text-only; this is the
image-side analogue of its content fingerprinting, built for the
multimodal columns SURVEY.md §2.10 adds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from med_doi_feature_extraction_spark.multimodal.binary_ops import (
    bilinear_resize,
)
from med_doi_feature_extraction_spark.multimodal.codecs import (
    PNG_MAGIC,
    decode_png,
)

__all__ = [
    "dhash64", "with_phash", "phash_pairs", "make_image_table",
    "ahash64", "with_audio_hash", "audio_pairs", "make_audio_table",
]


def dhash64(arr: np.ndarray) -> int:
    """dHash of an (H, W[, C]) pixel array → signed 64-bit int.

    Grayscale = integer-weight luma (299R + 587G + 114B)/1000 in
    float64 (deterministic across platforms); resample to 9 wide ×
    8 tall with the shared pure-numpy bilinear kernel; bit k (row-major
    MSB-first) = right neighbor strictly brighter. Returned in two's
    complement so it round-trips through a Spark/parquet LongType."""
    a = np.asarray(arr, dtype=np.float64)
    if a.ndim == 3:
        if a.shape[2] >= 3:
            gray = (299.0 * a[..., 0] + 587.0 * a[..., 1] + 114.0 * a[..., 2]) / 1000.0
        else:
            gray = a[..., 0]
    elif a.ndim == 2:
        gray = a
    else:
        raise ValueError(f"expected (H,W[,C]) array, got shape {a.shape}")
    g = bilinear_resize(gray, 9, 8)
    bits = g[:, 1:] > g[:, :-1]  # (8, 8)
    h = 0
    for b in bits.ravel():
        h = (h << 1) | int(b)
    return h - (1 << 64) if h >= (1 << 63) else h


def with_phash(
    df: DataFrame,
    payload_col: str = "payload",
    out: str = "phash",
    err_col: str = "decode_error",
) -> DataFrame:
    """Attach the perceptual hash: ``out`` (nullable long) + ``err_col``
    (NULL on success; the exception text on undecodable payloads)."""
    res_t = T.StructType(
        [
            T.StructField("ph", T.LongType()),
            T.StructField("err", T.StringType()),
        ]
    )

    @F.pandas_udf(res_t)
    def _ph(payloads: pd.Series) -> pd.DataFrame:
        phs: list[int | None] = []
        errs: list[str | None] = []
        for p in payloads:
            try:
                if p is None or bytes(p[:8]) != PNG_MAGIC:
                    raise ValueError("not a PNG payload")
                phs.append(dhash64(decode_png(bytes(p))))
                errs.append(None)
            except Exception as e:  # noqa: BLE001 — error-as-data row
                phs.append(None)
                errs.append(f"{type(e).__name__}: {e}")
        return pd.DataFrame({"ph": pd.array(phs, dtype="Int64"), "err": errs})

    r = _ph(F.col(payload_col))
    return df.withColumn(out, r["ph"]).withColumn(err_col, r["err"])


def phash_pairs(
    sigs: DataFrame,
    id_col: str,
    phash_col: str = "phash",
    max_hamming: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-dup image pairs from a signed frame → (id_a, id_b,
    hamming). Delegates to ``dedup.simhash_pairs_from_sigs`` (band
    block → capped buckets → streamed pairs → bit_count verify); NULL
    hashes (decode failures) are excluded up front."""
    from med_doi_feature_extraction_spark.operators.dedup import (
        DEFAULT_MAX_BAND_BUCKET,
        simhash_pairs_from_sigs,
    )

    cap = DEFAULT_MAX_BAND_BUCKET if max_bucket is None else max_bucket
    ok = sigs.filter(F.col(phash_col).isNotNull())
    return simhash_pairs_from_sigs(ok, id_col, phash_col, max_hamming, cap)


def make_image_table(
    spark, n: int = 40, seed: int = 7, dup_every: int = 5,
    corrupt_every: int = 17,
) -> DataFrame:
    """Deterministic PNG fixture for tests / contract seams:
    ``n`` low-frequency gradient images (ids 0..n-1), a slightly-noisy
    re-encode of every ``dup_every``-th one (id + 10000 — the planted
    near-dups dHash must catch), and an undecodable payload for every
    ``corrupt_every``-th (id + 20000 — exercises the quarantine path).
    Driver-side bounded generation, same spirit as
    ``binary_ops.make_fake_media``."""
    from med_doi_feature_extraction_spark.multimodal.codecs import encode_png

    rng = np.random.default_rng(seed)
    H = W = 24
    xx = np.linspace(0.0, 1.0, W)[None, :]
    yy = np.linspace(0.0, 1.0, H)[:, None]

    def rgb(gray: np.ndarray) -> np.ndarray:
        g = np.clip(gray, 0, 255)
        return np.stack(
            [g, np.clip(g * 0.8 + 30, 0, 255), np.clip(g * 0.5, 0, 255)],
            axis=-1,
        ).astype(np.uint8)

    def pattern() -> np.ndarray:
        # two incommensurate sinusoids: enough texture that distinct
        # draws are far in dHash space (flat gradients collide) while
        # ±1-2 gray-level noise can't flip the 9×8 difference bits
        f1 = rng.uniform(0.5, 2.5, size=2)
        f2 = rng.uniform(0.5, 3.5, size=2)
        p1, p2 = rng.uniform(0, 2 * np.pi, size=2)
        return (
            128.0
            + 70.0 * np.sin(2 * np.pi * (f1[0] * xx + f1[1] * yy) + p1)
            + 45.0 * np.sin(2 * np.pi * (f2[0] * xx + f2[1] * yy) + p2)
        )

    rows = []
    for i in range(n):
        base = pattern()
        noise = rng.normal(scale=2.0, size=(H, W))
        rows.append((i, bytearray(encode_png(rgb(base + noise), i % 5))))
        if i % dup_every == 0:
            wobble = rng.normal(scale=1.0, size=(H, W))
            rows.append(
                (i + 10_000, bytearray(encode_png(rgb(base + wobble), (i + 1) % 5)))
            )
        if i % corrupt_every == 0:
            rows.append((i + 20_000, bytearray(b"\x89BAD" + bytes(12))))
    return spark.createDataFrame(rows, "media_id: long, payload: binary")


# ---------------------------------------------------------------------------
# Audio fingerprint (energy-difference hash) — the WAV-side analogue
# ---------------------------------------------------------------------------


def ahash64(samples: np.ndarray) -> int:
    """Energy-difference fingerprint of a PCM signal → signed 64-bit.

    Mono-mix (mean across channels), split into 65 equal frames,
    per-frame RMS energy in float64, bit k (MSB-first) = frame k+1
    strictly louder than frame k. Gain-invariant by construction
    (both sides of every comparison scale together) and robust to
    small additive noise the way dHash is to pixel noise — the
    re-encoded/re-gained copy detector, not a content classifier.
    Trailing samples that don't fill the 65-frame grid are dropped
    (same convention as dHash's resample grid)."""
    a = np.asarray(samples, dtype=np.float64)
    if a.ndim == 2:
        a = a.mean(axis=1)
    if a.ndim != 1:
        raise ValueError(f"expected (n,) or (n, ch) samples, got {a.shape}")
    n_frames = 65
    flen = len(a) // n_frames
    if flen < 1:
        raise ValueError(f"need >= {n_frames} samples, got {len(a)}")
    frames = a[: flen * n_frames].reshape(n_frames, flen)
    energy = np.sqrt((frames * frames).mean(axis=1))
    bits = energy[1:] > energy[:-1]  # (64,)
    h = 0
    for b in bits:
        h = (h << 1) | int(b)
    return h - (1 << 64) if h >= (1 << 63) else h


def with_audio_hash(
    df: DataFrame,
    payload_col: str = "payload",
    out: str = "ahash",
    err_col: str = "decode_error",
) -> DataFrame:
    """Attach the audio fingerprint from WAV-PCM payloads; same
    error-as-data contract as ``with_phash`` (NULL hash + message on
    undecodable payloads)."""
    from med_doi_feature_extraction_spark.multimodal.codecs import decode_wav

    res_t = T.StructType(
        [
            T.StructField("ah", T.LongType()),
            T.StructField("err", T.StringType()),
        ]
    )

    @F.pandas_udf(res_t)
    def _ah(payloads: pd.Series) -> pd.DataFrame:
        hs: list[int | None] = []
        errs: list[str | None] = []
        for p in payloads:
            try:
                if p is None:
                    raise ValueError("NULL payload")
                samples, _rate = decode_wav(bytes(p))
                hs.append(ahash64(samples))
                errs.append(None)
            except Exception as e:  # noqa: BLE001 — error-as-data row
                hs.append(None)
                errs.append(f"{type(e).__name__}: {e}")
        return pd.DataFrame({"ah": pd.array(hs, dtype="Int64"), "err": errs})

    r = _ah(F.col(payload_col))
    return df.withColumn(out, r["ah"]).withColumn(err_col, r["err"])


def audio_pairs(
    sigs: DataFrame,
    id_col: str,
    ahash_col: str = "ahash",
    max_hamming: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-dup audio pairs — same banded machinery as image/simhash."""
    return phash_pairs(sigs, id_col, ahash_col, max_hamming, max_bucket)


def make_audio_table(
    spark, n: int = 30, seed: int = 11, dup_every: int = 4,
    corrupt_every: int = 13, sr: int = 4_000,
) -> DataFrame:
    """Deterministic WAV fixture: n half-second tone-mixture clips with
    per-frame amplitude envelopes (ids 0..n-1), a re-gained noisy copy
    of every ``dup_every``-th (id + 10000), and an undecodable payload
    every ``corrupt_every``-th (id + 20000)."""
    from med_doi_feature_extraction_spark.multimodal.codecs import encode_wav

    rng = np.random.default_rng(seed)
    length = sr // 2
    t = np.arange(length) / sr

    def clip() -> np.ndarray:
        f1, f2 = rng.uniform(100, 900, size=2)
        # random per-segment gain steps give the energy hash texture
        env = np.repeat(rng.uniform(0.2, 1.0, size=20), length // 20 + 1)[
            :length
        ]
        x = env * (
            np.sin(2 * np.pi * f1 * t) + 0.5 * np.sin(2 * np.pi * f2 * t)
        )
        return x

    def pcm(x: np.ndarray, gain: float) -> np.ndarray:
        return np.clip(x * gain * 12_000, -32_768, 32_767).astype(np.int16)

    rows = []
    for i in range(n):
        x = clip()
        rows.append((i, bytearray(encode_wav(pcm(x, 1.0), sr))))
        if i % dup_every == 0:
            noisy = x + rng.normal(scale=0.01, size=length)
            rows.append(
                (i + 10_000, bytearray(encode_wav(pcm(noisy, 0.5), sr)))
            )
        if i % corrupt_every == 0:
            rows.append((i + 20_000, bytearray(b"RIFFbad!" + bytes(8))))
    return spark.createDataFrame(rows, "media_id: long, payload: binary")
