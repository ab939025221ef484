"""Baseline JPEG codec (multimodal/jpeg.py): the same golden /
corruption / roundtrip discipline as the PNG tests (test_codecs.py).

Roundtrip is lossy by design, so the pins are (a) an EXACT golden for
a flat (DC-only) image, (b) PSNR floors per quality/subsampling on a
smooth gradient (quantization error is bounded there), (c) structural
invariants (shape, dtype, JFIF markers), (d) clean rejection of
corruption and honest NotImplementedError on non-baseline features,
(e) restart-interval parity, (f) dispatch through
binary_ops.decode_image, (g) a hypothesis fuzz over image sizes.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from med_doi_feature_extraction_spark.multimodal.jpeg import (
    JPEG_MAGIC,
    decode_jpeg,
    encode_jpeg,
)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def _gradient(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            xx * 255 / max(w - 1, 1),
            yy * 255 / max(h - 1, 1),
            (xx + yy) * 255 / max(h + w - 2, 1),
        ],
        axis=-1,
    ).astype(np.uint8)


def test_flat_image_is_exact():
    # constant color -> every AC coeff 0, DC quantizes exactly at any
    # quality; decode must be byte-identical
    for val in (0, 64, 128, 255):
        img = np.full((16, 24, 3), val, dtype=np.uint8)
        np.testing.assert_array_equal(
            decode_jpeg(encode_jpeg(img, quality=75)), img
        )
    gray = np.full((8, 8), 200, dtype=np.uint8)
    np.testing.assert_array_equal(
        decode_jpeg(encode_jpeg(gray, quality=50)), gray
    )


@pytest.mark.parametrize(
    ("quality", "sub", "floor"),
    [(95, "444", 34.0), (85, "444", 33.0), (85, "420", 28.0), (60, "420", 27.0)],
)
def test_roundtrip_psnr(quality, sub, floor):
    img = _gradient(40, 56)
    out = decode_jpeg(encode_jpeg(img, quality=quality, subsampling=sub))
    assert out.shape == img.shape and out.dtype == np.uint8
    assert _psnr(img, out) >= floor


def test_gray_roundtrip_and_shape():
    yy, xx = np.mgrid[0:24, 0:24]
    g = (xx * 255 / 23).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=95))
    assert out.shape == (24, 24) and out.dtype == np.uint8
    assert _psnr(g, out) >= 40.0


def test_non_multiple_of_mcu_sizes():
    # 4:2:0 MCUs are 16x16; 13x19 forces edge padding + crop on both
    # axes and both chroma planes
    img = _gradient(13, 19)
    out = decode_jpeg(encode_jpeg(img, quality=85, subsampling="420"))
    assert out.shape == (13, 19, 3)
    # a 13x19 full-range gradient is a worst case for 8x8 quantization
    # (each block spans ~half the value range); the pin is that
    # padding/crop produce a faithful image, not codec garbage
    assert _psnr(img, out) >= 20.0


def test_restart_interval_parity():
    img = _gradient(40, 56)
    plain = decode_jpeg(encode_jpeg(img, quality=85))
    rst = decode_jpeg(encode_jpeg(img, quality=85, restart_interval=2))
    # restart markers change the bitstream framing, not the pixels
    np.testing.assert_array_equal(plain, rst)


def test_markers_and_magic():
    blob = encode_jpeg(_gradient(8, 8), quality=85)
    assert blob[:3] == JPEG_MAGIC
    assert blob[-2:] == b"\xff\xd9"
    assert b"JFIF\x00" in blob[:32]


def test_rejects_corruption():
    blob = encode_jpeg(_gradient(24, 24), quality=85)
    with pytest.raises(ValueError):
        decode_jpeg(b"nota" + blob)
    with pytest.raises(ValueError):
        decode_jpeg(blob[:40])  # truncated before SOS
    with pytest.raises(ValueError):
        decode_jpeg(blob[:-30])  # truncated entropy stream


def test_non_baseline_raises_not_implemented():
    blob = bytearray(encode_jpeg(_gradient(16, 16), quality=85))
    sof = blob.index(b"\xff\xc0")
    blob[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(blob))


def test_decode_image_dispatch():
    from med_doi_feature_extraction_spark.multimodal.binary_ops import (
        decode_image,
    )
    from med_doi_feature_extraction_spark.multimodal.codecs import encode_png

    img = _gradient(12, 12)
    out = decode_image(encode_jpeg(img, quality=95))
    assert out.shape == (12, 12, 3)
    np.testing.assert_array_equal(decode_image(encode_png(img)), img)
    with pytest.raises(NotImplementedError):
        decode_image(b"RIFX????WEBPxxxx")


@settings(max_examples=15, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=34),
    w=st.integers(min_value=1, max_value=34),
    quality=st.sampled_from([50, 85, 95]),
    sub=st.sampled_from(["444", "420"]),
)
def test_fuzz_shapes(h, w, quality, sub):
    img = _gradient(h, w)
    out = decode_jpeg(encode_jpeg(img, quality=quality, subsampling=sub))
    assert out.shape == (h, w, 3) and out.dtype == np.uint8
