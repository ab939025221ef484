"""Perceptual image hashing + Hamming near-dup (multimodal/phash.py).
DuckDB twin: the `phash_pairs` contract query (banding half over the
materialized signature seam)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from med_doi_feature_extraction_spark.multimodal import phash as ph
from med_doi_feature_extraction_spark.multimodal.codecs import (
    decode_png,
    encode_png,
)


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def test_dhash_goldens():
    # strictly increasing left-to-right → every bit set → all-ones
    grad = np.tile(np.arange(9, dtype=np.float64) * 10, (8, 1))
    assert ph.dhash64(grad) == -1
    # strictly decreasing → no bit set
    assert ph.dhash64(grad[:, ::-1].copy()) == 0
    # constant image → no bit set
    assert ph.dhash64(np.full((24, 24), 128.0)) == 0


def test_dhash_invariant_to_reencode_and_brightness():
    rng = np.random.default_rng(3)
    g = rng.uniform(0, 255, size=(24, 24))
    base = ph.dhash64(g)
    for ft in range(5):  # PNG filter type must not matter
        rgbish = np.stack([g, g, g], axis=-1).astype(np.uint8)
        assert _ham(ph.dhash64(decode_png(encode_png(rgbish, ft))), base) <= 2
    assert ph.dhash64(np.clip(g * 1.1 + 10, 0, 255)) == ph.dhash64(g) or _ham(
        ph.dhash64(np.clip(g + 10, 0, 255)), ph.dhash64(g)
    ) <= 2  # brightness shift barely moves difference bits


@pytest.fixture(scope="module")
def signed(spark):
    media = ph.make_image_table(spark, n=40, seed=7)
    return ph.with_phash(media).cache()


def test_with_phash_decodes_and_quarantines(signed):
    rows = {r["media_id"]: r for r in signed.collect()}
    ok = [m for m in rows if m < 20_000]
    bad = [m for m in rows if m >= 20_000]
    assert bad and all(
        rows[m]["phash"] is None and rows[m]["decode_error"] for m in bad
    )
    assert all(
        rows[m]["phash"] is not None and rows[m]["decode_error"] is None
        for m in ok
    )


def test_phash_pairs_find_planted_dups_only(signed):
    rows = {r["media_id"]: r["phash"] for r in signed.collect()}
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in ph.phash_pairs(signed, "media_id", max_hamming=3).collect()
    }
    # exactly the pairs whose true Hamming <= 3 (pigeonhole: 4 bands
    # guarantee recall at <= 3), and no false pairs
    expect = {}
    ids = [m for m, h in rows.items() if h is not None]
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            x, y = min(a, b), max(a, b)
            d = _ham(rows[x], rows[y])
            if d <= 3:
                expect[(x, y)] = d
    assert got == expect
    # the planted near-dups dominate, and every one links i <-> i+10000
    planted = [p for p in got if p[1] == p[0] + 10_000]
    assert len(planted) >= 5
    # distinct images never pair
    assert all(b - a == 10_000 for a, b in got)


class TestAudioHash:
    def test_gain_invariance_golden(self):
        rng = np.random.default_rng(5)
        x = rng.normal(size=65 * 40)
        assert ph.ahash64(x) == ph.ahash64(x * 7.5)  # gain cancels
        # strictly louder every frame → all 64 bits set
        ramp = np.repeat(np.arange(1, 66, dtype=np.float64), 10)
        assert ph.ahash64(ramp) == -1
        assert ph.ahash64(ramp[::-1].copy()) == 0
        # stereo mono-mix == identical-channel mono
        st = np.stack([x, x], axis=1)
        assert ph.ahash64(st) == ph.ahash64(x)

    def test_too_short_raises(self):
        with pytest.raises(ValueError):
            ph.ahash64(np.zeros(10))

    def test_spark_pairs_and_quarantine(self, spark):
        audio = ph.make_audio_table(spark, n=30, seed=11)
        signed = ph.with_audio_hash(audio).cache()
        rows = {r["media_id"]: r for r in signed.collect()}
        bad = [m for m in rows if m >= 20_000]
        assert bad and all(rows[m]["ahash"] is None for m in bad)
        hashes = {
            m: r["ahash"] for m, r in rows.items() if r["ahash"] is not None
        }
        got = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in ph.audio_pairs(signed, "media_id", max_hamming=3).collect()
        }
        expect = {}
        ids = sorted(hashes)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                d = _ham(hashes[a], hashes[b])
                if d <= 3:
                    expect[(a, b)] = d
        assert got == expect and len(got) >= 5
        assert all(b - a == 10_000 for a, b in got)  # only planted dups
