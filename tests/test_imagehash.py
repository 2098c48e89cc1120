"""Perceptual image dedup (operators/imagehash.py): controlled
near-dup fixtures — variant images must land within a small Hamming
distance, unrelated images far away, and the banded distributed pair
join must equal brute force exactly."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dwh_with_dask_spark.operators.imagehash import (
    dhash_bits,
    image_perceptual_hashes,
    phash_bits,
    phash_near_dup_pairs,
)
from dwh_with_dask_spark.operators.multimodal import (
    _decode_image,
    _resize_nn,
    encode_png,
)


def hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


@pytest.fixture(scope="module")
def base_img():
    rng = np.random.default_rng(3)
    # smooth-ish structure (random + blur by block-mean) so low
    # frequencies carry signal, like a real photo
    raw = rng.integers(0, 255, size=(64, 64, 3)).astype(np.float64)
    k = 8
    blurred = raw.reshape(8, k, 8, k, 3).mean(axis=(1, 3))
    return np.clip(
        _resize_nn(blurred.astype(np.uint8), 64, 64) + rng.integers(0, 20, (64, 64, 3)),
        0,
        255,
    ).astype(np.uint8)


def test_variants_are_near_duplicates(base_img):
    h0 = phash_bits(base_img)
    # brightness shift (re-exposure)
    bright = np.clip(base_img.astype(int) + 12, 0, 255).astype(np.uint8)
    # resize (smaller re-encode)
    small = _resize_nn(base_img, 32, 32)
    # recompress-ish: quantize to 16 levels (coarse lossy re-encode)
    quant = (base_img // 16 * 16).astype(np.uint8)
    # small local edit
    patched = base_img.copy()
    patched[20:24, 20:24] = 255
    for variant in (bright, small, quant, patched):
        assert hamming(h0, phash_bits(variant)) <= 12

    # dhash: gradient sign is also robust to the global edits (the NN
    # resample perturbs more gradient bits than DCT low-freqs — hence
    # the slightly looser bound; unrelated images sit at 24+)
    d0 = dhash_bits(base_img)
    for variant in (bright, small, quant):
        assert hamming(d0, dhash_bits(variant)) <= 14


def test_unrelated_images_are_far(base_img):
    h0 = phash_bits(base_img)
    d0 = dhash_bits(base_img)
    for seed in range(5):
        rng = np.random.default_rng(100 + seed)
        raw = rng.integers(0, 255, size=(64, 64, 3)).astype(np.float64)
        other = raw.reshape(8, 8, 8, 8, 3).mean(axis=(1, 3)).astype(np.uint8)
        other = _resize_nn(other, 64, 64)
        assert hamming(h0, phash_bits(other)) > 16
        assert hamming(d0, dhash_bits(other)) > 16


def test_rotation_is_a_documented_non_goal(base_img):
    """pHash is NOT rot90-invariant (the public algorithm isn't either);
    pin that so nobody silently assumes it."""
    rot = np.rot90(base_img).copy()
    assert hamming(phash_bits(base_img), phash_bits(rot)) > 10


def test_hashes_survive_png_roundtrip(base_img):
    """encode_png -> stdlib decode -> identical pixels -> identical
    hash: the query path's decode adds no drift."""
    decoded = _decode_image(encode_png(base_img))
    assert np.array_equal(decoded, base_img)
    assert phash_bits(decoded) == phash_bits(base_img)
    assert dhash_bits(decoded) == dhash_bits(base_img)


def _media_df(spark, imgs):
    rows = [(str(i), len(b), b) for i, b in enumerate(map(encode_png, imgs))]
    df = spark.createDataFrame(rows, "path string, length long, content binary")
    from dwh_with_dask_spark.operators.multimodal import media_table

    return media_table(df, "image")


def test_banded_pairs_equal_bruteforce(spark):
    """30 images (10 bases x 3 variants): the distributed banded join
    must output EXACTLY the brute-force Hamming<=10 pairs."""
    imgs = []
    for g in range(10):
        rng = np.random.default_rng(g)
        raw = rng.integers(0, 255, size=(64, 64, 3)).astype(np.float64)
        base = _resize_nn(
            raw.reshape(8, 8, 8, 8, 3).mean(axis=(1, 3)).astype(np.uint8), 64, 64
        )
        bright = np.clip(base.astype(int) + 9, 0, 255).astype(np.uint8)
        patched = base.copy()
        patched[30:34, 30:34] = 0
        imgs.extend([base, bright, patched])

    media = _media_df(spark, imgs)
    got = {
        tuple(sorted((r.hash_a, r.hash_b)))
        for r in phash_near_dup_pairs(media, max_hamming=10, bands=16).collect()
    }

    hashes = {
        r.content_hash: r.phash
        for r in image_perceptual_hashes(media).collect()
    }
    keys = sorted(hashes)
    want = {
        tuple(sorted((a, b)))
        for i, a in enumerate(keys)
        for b in keys[i + 1:]
        if hamming(hashes[a], hashes[b]) <= 10
    }
    assert got == want
    assert len(want) >= 10  # the planted variants actually matched


def test_hashes_deterministic_across_partitioning(spark, base_img):
    media = _media_df(spark, [base_img] * 1 + [np.rot90(base_img).copy()])
    a = sorted(
        (r.content_hash, r.phash, r.dhash)
        for r in image_perceptual_hashes(media).collect()
    )
    b = sorted(
        (r.content_hash, r.phash, r.dhash)
        for r in image_perceptual_hashes(media.repartition(7)).collect()
    )
    assert a == b
