"""Multimodal columns: opaque binary payloads + typed metadata.

Treats image/audio/video as ``binary`` columns travelling next to a
typed metadata struct, with decode / feature-extract / resize /
frame-sample implemented as Arrow-batched ``mapInPandas`` operators.
The Spark-side plumbing (schemas, batch shaping, partition sizing,
null/corrupt handling) is real and tested. Decode is REAL for the
containers implementable without codec libs — PNG and WAV-PCM via
the pure-stdlib ``multimodal/codecs`` module, baseline sequential
JPEG via ``multimodal/jpeg`` — while remaining entropy-coded formats
(MP3/video/WebP) stay honest ``NotImplementedError`` hooks behind
``decode_image``/``decode_audio``, with a deterministic sha-seeded
fake as the default fallback so pipelines and tests run end-to-end
on any payload.

Batch shaping matters at scale: media blobs are MBs, so operators
re-batch by BYTES (``max_batch_bytes``), not row count, before
yielding — an Arrow batch of 2k × 8 MB rows would otherwise OOM the
Python worker.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

EMBED_DIM = 16


def decode_image(payload: bytes):
    """Real image decode, pure stdlib + numpy. PNG via
    ``multimodal/codecs.decode_png`` (zlib + scanline unfilter, all
    five filter types, CRC-checked); baseline sequential JPEG via
    ``multimodal/jpeg.decode_jpeg`` (file-supplied DQT/DHT, restart
    markers, up to 2x2 sampling — progressive/arithmetic raise).
    Remaining formats (WebP/AVIF/…) stay honest
    ``NotImplementedError`` hooks for a cluster with codec libs — a
    half-right decoder would be worse than a stub."""
    from med_doi_feature_extraction_spark.multimodal.codecs import (
        PNG_MAGIC,
        decode_png,
    )
    from med_doi_feature_extraction_spark.multimodal.jpeg import (
        JPEG_MAGIC,
        decode_jpeg,
    )

    if payload[:8] == PNG_MAGIC:
        return decode_png(payload)
    if payload[:3] == JPEG_MAGIC:
        return decode_jpeg(payload)
    raise NotImplementedError(
        "only PNG and baseline JPEG decode in-sandbox; other image "
        "codecs need a codec lib"
    )


def decode_audio(payload: bytes):
    """Real audio decode: RIFF/WAVE 16-bit PCM via the pure-stdlib
    codec (``multimodal/codecs.decode_wav``); compressed audio stays
    a hook for codec libs."""
    from med_doi_feature_extraction_spark.multimodal.codecs import decode_wav

    if payload[:4] == b"RIFF":
        return decode_wav(payload)
    raise NotImplementedError(
        "only WAV-PCM decodes in-sandbox; compressed audio needs a codec lib"
    )


def fake_decode_array(
    payload: bytes, width: int | None, height: int | None
) -> np.ndarray:
    """Deterministic stand-in for the codec decode step: sha-seeded
    (H, W, 3) uint8 pixel array. Same payload+dims → same pixels on
    any worker. This is the ONE remaining stub in the resize path —
    a cluster with PIL/opencv swaps this for ``decode_image`` and
    everything downstream (the real bilinear resample, batch shaping,
    quarantine) is unchanged."""
    w = 16 if not width else int(width)
    h = 16 if not height else int(height)
    seed = hashlib.sha256(payload + f"|{w}x{h}".encode()).digest()
    rng = np.random.default_rng(int.from_bytes(seed[:8], "big"))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def bilinear_resize(arr: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Pure-numpy bilinear resample of an (H, W[, C]) pixel array to
    (target_h, target_w[, C]) — REAL interpolation, no codec libs.

    Half-pixel-center source mapping (the OpenCV/PIL convention:
    src = (dst + 0.5) · size_ratio − 0.5) with edge replication via
    clipping, gather with ``np.take``-style integer indexing, then
    two lerps. Output dtype matches input for integer inputs
    (round-half-to-even via ``np.rint``), float passes through.
    Fully vectorized: O(target pixels) numpy ops, no Python loop —
    safe inside the Arrow-batched ``mapInPandas`` hot path."""
    if arr.ndim == 2:
        out = bilinear_resize(arr[:, :, None], target_w, target_h)
        return out[:, :, 0]
    a = arr.astype(np.float64)
    h, w = a.shape[:2]
    ys = np.clip((np.arange(target_h) + 0.5) * h / target_h - 0.5, 0, h - 1)
    xs = np.clip((np.arange(target_w) + 0.5) * w / target_w - 0.5, 0, w - 1)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    top = a[y0][:, x0] * (1 - wx) + a[y0][:, x1] * wx
    bot = a[y1][:, x0] * (1 - wx) + a[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    if np.issubdtype(arr.dtype, np.integer):
        info = np.iinfo(arr.dtype)
        return np.clip(np.rint(out), info.min, info.max).astype(arr.dtype)
    return out.astype(arr.dtype)


def fake_feature_vector(payload: bytes, dim: int = EMBED_DIM) -> list[float]:
    """Deterministic stand-in for a decoded-media feature extractor:
    sha256-seeded pseudo-embedding. Same payload → same vector on any
    worker, so tests and oracles are stable."""
    digest = hashlib.sha256(payload).digest()
    seed = int.from_bytes(digest[:8], "big")
    rng = np.random.default_rng(seed)
    return [round(float(x), 6) for x in rng.standard_normal(dim)]


def _decode_or_fake(
    payload: bytes, width: int | None, height: int | None
) -> tuple[np.ndarray, bool]:
    """(pixels (H, W, 3) uint8, real?) — REAL decode for recognized
    containers (PNG via the pure-stdlib codec; gray expanded, alpha
    dropped, so downstream always sees RGB), the documented sha-fake
    for everything else. Corrupt recognized containers raise
    ``ValueError`` (the caller quarantines)."""
    from med_doi_feature_extraction_spark.multimodal.codecs import (
        PNG_MAGIC,
        decode_png,
    )

    if payload[:8] == PNG_MAGIC:
        arr = decode_png(payload)
        if arr.ndim == 2:
            arr = np.repeat(arr[:, :, None], 3, axis=2)
        elif arr.shape[2] == 4:
            arr = arr[:, :, :3]
        return arr, True
    return fake_decode_array(payload, width, height), False


def real_feature_vector(arr: np.ndarray, dim: int = EMBED_DIM) -> list[float]:
    """Deterministic classical features from DECODED pixels (the real
    analogue of the sha-fake): dims, per-channel mean/std, gray
    min/max/median, 2×2 pooled gray means, horizontal edge energy —
    16 floats, rounded 6 dp, order fixed."""
    a = arr.astype(np.float64)
    h, w = a.shape[:2]
    gray = a.mean(axis=2)
    rsp = [(0, h), (0, h)] if h == 1 else [(0, h // 2), (h // 2, h)]
    csp = [(0, w), (0, w)] if w == 1 else [(0, w // 2), (w // 2, w)]
    pooled = [
        float(gray[r0:r1, c0:c1].mean()) for r0, r1 in rsp for c0, c1 in csp
    ]
    feats = [
        float(h),
        float(w),
        *[float(a[:, :, c].mean()) for c in range(3)],
        *[float(a[:, :, c].std()) for c in range(3)],
        float(gray.min()),
        float(gray.max()),
        float(np.median(gray)),
        *pooled,
        float(np.abs(np.diff(gray, axis=1)).mean()) if w > 1 else 0.0,
    ]
    return [round(f, 6) for f in feats[:dim]]


def _rebatch(
    batches: Iterator[pd.DataFrame], payload_col: str, max_batch_bytes: int
) -> Iterator[pd.DataFrame]:
    """Split incoming Arrow batches so Σ payload bytes per yielded
    frame stays under ``max_batch_bytes``."""
    for pdf in batches:
        sizes = pdf[payload_col].map(lambda b: 0 if b is None else len(b))
        acc = 0
        start = 0
        for i, s in enumerate(sizes):
            if acc + s > max_batch_bytes and i > start:
                yield pdf.iloc[start:i]
                start = i
                acc = 0
            acc += s
        if start < len(pdf):
            yield pdf.iloc[start:]


def extract_media_features(
    media: DataFrame,
    payload_col: str = "payload",
    max_batch_bytes: int = 64 * 1024 * 1024,
    use_real_decoder: bool = False,
) -> DataFrame:
    """media → (media_id, feature vector, payload_bytes, decode_error).

    Recognized containers (PNG) decode FOR REAL via the pure-stdlib
    codec and yield classical pixel features
    (:func:`real_feature_vector`); unrecognized payloads fall back to
    the documented sha-fake vector, unless ``use_real_decoder=True``
    which instead quarantines them (strict mode — a production run
    where every payload should decode). Corrupt/null payloads produce
    a ``decode_error`` string instead of failing the job (quarantine
    pattern, SURVEY.md M5)."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload_bytes", T.LongType(), True),
            T.StructField("features", T.ArrayType(T.DoubleType()), True),
            T.StructField("decode_error", T.StringType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in _rebatch(batches, payload_col, max_batch_bytes):
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                if payload is None or len(payload) == 0:
                    rows.append((int(mid), 0, None, "empty_payload"))
                    continue
                try:
                    pixels, real = _decode_or_fake(bytes(payload), None, None)
                    if real:
                        vec = real_feature_vector(pixels)
                    elif use_real_decoder:
                        decode_image(bytes(payload))  # raises for non-PNG
                        vec = None  # pragma: no cover - unreachable
                    else:
                        vec = fake_feature_vector(bytes(payload))
                    rows.append((int(mid), len(payload), vec, None))
                except (NotImplementedError, ValueError) as exc:
                    rows.append((int(mid), len(payload), None, str(exc)))
            yield pd.DataFrame(
                rows, columns=["media_id", "payload_bytes", "features", "decode_error"]
            )

    return media.select("media_id", payload_col).mapInPandas(run, out_schema)


def resize_images(
    media: DataFrame,
    target_w: int,
    target_h: int,
    payload_col: str = "payload",
    max_batch_bytes: int = 64 * 1024 * 1024,
) -> DataFrame:
    """Resize: (media_id, src/target dims, resized RGB payload,
    decode_error). The resample is REAL (``bilinear_resize``,
    pure-numpy half-pixel bilinear) and so is the decode for PNG
    payloads (pure-stdlib ``codecs.decode_png`` — zlib + all five
    scanline unfilters, CRC-checked); unrecognized containers fall
    back to the documented sha-fake pixels, and corrupt PNGs
    quarantine as ``decode_error`` rows. The byte-capped Arrow
    re-batching, metadata flow, and quarantine path are the
    production shape either way. Aspect-ratio policy belongs to the
    caller (pass a target preserving it, or don't)."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("src_width", T.IntegerType(), True),
            T.StructField("src_height", T.IntegerType(), True),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("resized", T.BinaryType(), True),
            T.StructField("decode_error", T.StringType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in _rebatch(batches, payload_col, max_batch_bytes):
            rows = []
            for mid, payload, w, h in zip(
                pdf["media_id"], pdf[payload_col], pdf["w"], pdf["h"]
            ):
                sw = None if pd.isna(w) else int(w)
                sh = None if pd.isna(h) else int(h)
                if payload is None or len(payload) == 0:
                    rows.append(
                        (int(mid), sw, sh, target_w, target_h, None,
                         "empty_payload")
                    )
                    continue
                try:
                    decoded, _ = _decode_or_fake(bytes(payload), sw, sh)
                except ValueError as exc:  # corrupt recognized container
                    rows.append(
                        (int(mid), sw, sh, target_w, target_h, None,
                         f"decode_error: {exc}")
                    )
                    continue
                resized = bilinear_resize(decoded, target_w, target_h)
                rows.append(
                    (int(mid), sw, sh, target_w, target_h,
                     resized.tobytes(), None)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "src_width", "src_height",
                    "width", "height", "resized", "decode_error",
                ],
            )

    flat = media.select(
        "media_id",
        payload_col,
        F.col("meta.width").alias("w"),
        F.col("meta.height").alias("h"),
    )
    return flat.mapInPandas(run, out_schema)


def sample_frames(
    media: DataFrame,
    every_ms: int = 1000,
    payload_col: str = "payload",
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled timestamp
    (duration from metadata; frame payload extraction stubbed as a
    byte-slice fake). Exercises the explode/flatMap shape a real video
    pipeline needs."""
    n_frames = F.greatest(
        (F.col("meta.duration_ms") / every_ms).cast("int"), F.lit(1)
    )
    frames = media.withColumn(
        "frame_idx", F.explode(F.sequence(F.lit(0), n_frames - 1))
    )
    return frames.select(
        "media_id",
        "frame_idx",
        (F.col("frame_idx") * every_ms).alias("frame_ts_ms"),
        # fake frame payload: deterministic hex of a byte-slice (hex,
        # not a string cast — arbitrary bytes are not valid UTF-8)
        F.hex(
            F.substring(F.col(payload_col), (F.col("frame_idx") % 16) + 1, 16)
        ).alias("frame_stub"),
    )


def make_fake_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media table for tests/bench (binary payloads of
    varying size + metadata)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        size = int(rng.integers(100, 5000))
        payload = bytes(rng.integers(0, 256, size=size, dtype=np.uint8)) if i % 13 else b""
        rows.append(
            {
                "media_id": i,
                "payload": payload,
                "meta": {
                    "mime": "image/fake" if i % 2 else "video/fake",
                    "width": int(rng.integers(16, 512)),
                    "height": int(rng.integers(16, 512)),
                    "duration_ms": int(rng.integers(500, 10_000)),
                },
            }
        )
    return spark.createDataFrame(pd.DataFrame(rows), schema=MEDIA_SCHEMA)
