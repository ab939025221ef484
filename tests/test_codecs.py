"""Pure-stdlib PNG/WAV codecs + their wiring into the multimodal tier.

PNG round-trips sweep all five scanline filters and all three color
types; corrupt payloads (bad CRC, truncated) are rejected cleanly;
the Spark resize/feature paths decode real PNG pixels end-to-end.
"""

from __future__ import annotations

import numpy as np
import pytest

from med_doi_feature_extraction_spark.multimodal.codecs import (
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
)


def _img(h, w, c, seed):
    rng = np.random.default_rng(seed)
    shape = (h, w) if c == 1 else (h, w, c)
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("c", [1, 3, 4])
def test_png_roundtrip_all_filters(filter_type, c):
    arr = _img(13, 17, c, seed=filter_type * 10 + c)
    out = decode_png(encode_png(arr, filter_type=filter_type))
    np.testing.assert_array_equal(out, arr)


def test_png_edge_sizes():
    for h, w in [(1, 1), (1, 9), (9, 1), (2, 2)]:
        arr = _img(h, w, 3, seed=h * 100 + w)
        np.testing.assert_array_equal(decode_png(encode_png(arr, 4)), arr)


def test_png_rejects_corruption():
    arr = _img(8, 8, 3, seed=1)
    blob = bytearray(encode_png(arr))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"notapng" + bytes(blob))
    blob[40] ^= 0xFF  # flip a byte inside IDAT → CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(blob))


def test_wav_roundtrip_mono_stereo():
    rng = np.random.default_rng(7)
    mono = rng.integers(-32768, 32767, size=220, dtype=np.int16)
    s, rate = decode_wav(encode_wav(mono, 8000))
    assert rate == 8000
    np.testing.assert_array_equal(s, mono)
    stereo = rng.integers(-32768, 32767, size=(100, 2), dtype=np.int16)
    s2, rate2 = decode_wav(encode_wav(stereo, 44100))
    assert rate2 == 44100 and s2.shape == (100, 2)
    np.testing.assert_array_equal(s2, stereo)


def test_decode_hooks_route_and_stay_honest():
    from med_doi_feature_extraction_spark.multimodal.binary_ops import (
        decode_audio,
        decode_image,
    )

    arr = _img(6, 5, 3, seed=3)
    np.testing.assert_array_equal(decode_image(encode_png(arr)), arr)
    # baseline JPEG now decodes for real (multimodal/jpeg.py); a
    # JPEG-magic blob with garbage inside must fail loudly, not
    # fall through to a fake
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0jpegish")
    with pytest.raises(NotImplementedError):
        decode_image(b"RIFX????WEBPxxxx")  # non-PNG/JPEG codec
    mono = np.arange(10, dtype=np.int16)
    s, _ = decode_audio(encode_wav(mono))
    np.testing.assert_array_equal(s, mono)
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x03mp3ish")


def test_spark_resize_decodes_real_png(spark):
    """resize_images over real PNG payloads: 4×4 solid-color quadrant
    image downsampled 2×2 must yield exactly the four quadrant
    colors — proof the real decoder (not the sha-fake) fed the real
    resampler."""
    from med_doi_feature_extraction_spark.multimodal.binary_ops import (
        resize_images,
    )

    img = np.zeros((4, 4, 3), dtype=np.uint8)
    img[:2, :2] = [255, 0, 0]
    img[:2, 2:] = [0, 255, 0]
    img[2:, :2] = [0, 0, 255]
    img[2:, 2:] = [255, 255, 0]
    corrupt = bytearray(encode_png(img))
    corrupt[41] ^= 0x01
    media = spark.createDataFrame(
        [
            (1, bytes(encode_png(img)), ("image/png", 4, 4, None)),
            (2, bytes(corrupt), ("image/png", 4, 4, None)),
            (3, b"not-a-container", ("application/octet-stream", 8, 8, None)),
        ],
        "media_id long, payload binary, "
        "meta struct<mime:string,width:int,height:int,duration_ms:bigint>",
    )
    out = {
        r["media_id"]: r.asDict()
        for r in resize_images(media, 2, 2).collect()
    }
    pixels = np.frombuffer(out[1]["resized"], np.uint8).reshape(2, 2, 3)
    np.testing.assert_array_equal(
        pixels,
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 0]]],
    )
    assert out[1]["decode_error"] is None
    assert out[2]["resized"] is None
    assert "CRC" in out[2]["decode_error"]
    assert out[3]["resized"] is not None  # sha-fake fallback still works


def test_spark_features_real_vs_fake(spark):
    from med_doi_feature_extraction_spark.multimodal.binary_ops import (
        extract_media_features,
        real_feature_vector,
    )

    img = _img(10, 8, 3, seed=11)
    media = spark.createDataFrame(
        [
            (1, bytes(encode_png(img)), ("image/png", 8, 10, None)),
            (2, b"opaque-blob", ("application/octet-stream", None, None, None)),
        ],
        "media_id long, payload binary, "
        "meta struct<mime:string,width:int,height:int,duration_ms:bigint>",
    )
    out = {
        r["media_id"]: r.asDict()
        for r in extract_media_features(media).collect()
    }
    assert out[1]["features"] == real_feature_vector(img)
    assert out[1]["features"][:2] == [10.0, 8.0]  # real dims, not fake
    assert out[2]["features"] is not None  # fake fallback
    assert out[2]["decode_error"] is None
