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
    phash_d8_bits,
    phash_dihedral_near_dup_pairs,
    phash_near_dup_pairs,
    phash_orientation_bits,
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
    """Plain pHash is NOT rot90-invariant (the public algorithm isn't
    either); pin that so nobody silently assumes it. Dihedral
    robustness is phash_d8's job (tests below)."""
    rot = np.rot90(base_img).copy()
    assert hamming(phash_bits(base_img), phash_bits(rot)) > 10


def test_phash_d8_exact_dihedral_invariance():
    """VERDICT r6 ask #6: every exact rotation/flip of an image has the
    IDENTICAL canonical hash (same orientation set -> same min). Exact
    equality holds when no resampling intervenes (32x32 input: the NN
    resize is the identity); for other sizes the floor-grid NN resample
    does not commute with rot90 (one-pixel phase shift), so rotated
    LARGER images land within the near-dup threshold instead — pinned
    by test_phash_d8_rotated_variants_within_threshold."""
    rng = np.random.default_rng(11)
    raw = rng.integers(0, 255, size=(32, 32, 3)).astype(np.float64)
    img = (
        raw.reshape(8, 4, 8, 4, 3).mean(axis=(1, 3)).repeat(4, 0).repeat(4, 1)
    ).astype(np.uint8)
    h0 = phash_d8_bits(img)
    orientations = [np.rot90(img, k).copy() for k in range(1, 4)]
    flipped = np.fliplr(img).copy()
    orientations += [flipped] + [np.rot90(flipped, k).copy() for k in range(1, 4)]
    for o in orientations:
        assert phash_d8_bits(o) == h0


def _d8_dist(img_a, img_b) -> int:
    """min over A's orientation hashes vs B's plain hash — the metric
    phash_dihedral_near_dup_pairs computes distributed."""
    hb = phash_bits(img_b)
    return min(hamming(o, hb) for o in phash_orientation_bits(img_a))


def test_phash_d8_rotated_variants_within_threshold(base_img):
    """Rotation/flip COMPOSED with the usual near-dup edits must land
    within the same Hamming threshold the plain-pHash variants use —
    under the orientation-set metric (min over A's 8 orientations vs
    B's plain hash). The canonical-min column does NOT have this
    property (argmin instability, pinned in its docstring)."""
    bright = np.clip(base_img.astype(int) + 12, 0, 255).astype(np.uint8)
    quant = (base_img // 16 * 16).astype(np.uint8)
    patched = base_img.copy()
    patched[20:24, 20:24] = 255
    for variant in (bright, quant, patched):
        for k in range(4):
            rot = np.rot90(variant, k).copy()
            assert _d8_dist(rot, base_img) <= 12
            assert _d8_dist(np.fliplr(rot).copy(), base_img) <= 12


def test_phash_d8_unrelated_images_stay_far(base_img):
    """The orientation-set metric must not collapse the space:
    unrelated images keep a margin (min-over-8 shrinks distances
    slightly, so the bound is a bit looser than plain pHash's)."""
    for seed in range(5):
        rng = np.random.default_rng(100 + seed)
        raw = rng.integers(0, 255, size=(64, 64, 3)).astype(np.float64)
        other = raw.reshape(8, 8, 8, 8, 3).mean(axis=(1, 3)).astype(np.uint8)
        other = _resize_nn(other, 64, 64)
        assert _d8_dist(other, base_img) > 12
        assert _d8_dist(base_img, other) > 12


def test_phash_dihedral_pairs_find_rotated_edited_copies(spark, base_img):
    """End-to-end: phash_dihedral_near_dup_pairs must surface
    rotated/flipped AND edited copies that plain phash banding misses,
    match the brute-force orientation-set metric exactly, and not
    pull in the unrelated image."""
    bright = np.clip(base_img.astype(int) + 12, 0, 255).astype(np.uint8)
    rot_bright = np.rot90(bright).copy()
    flip = np.fliplr(base_img).copy()
    other = _resize_nn(
        np.random.default_rng(99)
        .integers(0, 255, size=(8, 8, 3))
        .astype(np.uint8),
        64,
        64,
    )
    imgs = [base_img, rot_bright, flip, other]
    media = _media_df(spark, imgs)
    got = {
        (r.hash_a, r.hash_b): r.hamming
        for r in phash_dihedral_near_dup_pairs(
            media, max_hamming=10, bands=16
        ).collect()
    }

    import hashlib

    hashes = {
        hashlib.sha256(encode_png(img)).hexdigest(): i
        for i, img in enumerate(imgs)
    }
    # brute-force twin over the same metric
    keys = sorted(hashes)
    want = {}
    for i, a in enumerate(keys):
        for b in keys[i + 1 :]:
            d = _d8_dist(imgs[hashes[a]], imgs[hashes[b]])
            if d <= 10:
                want[(a, b)] = d
    assert got == want
    # the planted rotated/edited copies are actually in there
    assert len(got) >= 3
    plain_pairs = phash_near_dup_pairs(
        media, max_hamming=10, bands=16, method="phash"
    ).count()
    assert plain_pairs < len(got)  # rotation-blind banding misses pairs


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
