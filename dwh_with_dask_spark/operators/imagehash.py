"""Perceptual image dedup: pHash (DCT) / dHash (gradient) + banded
Hamming pair join.

ABSENT-IN-REFERENCE (SURVEY.md §2B north-star, VERDICT r5 ask #4): a
training-data pipeline ingesting images needs near-duplicate detection
over PIXELS, not bytes — re-encoded, resized, or brightness-shifted
copies share no content_hash but the same low-frequency structure. The
public algorithms (pHash per Zauner 2010 / the python imagehash
package's dct method; dHash per the widely published
difference-hash), reimplemented on the repo's own primitives:

- decode via ``multimodal._decode_image`` (REAL stdlib PNG +
  baseline-JPEG decoders; PIL first when importable);
- grayscale = the BT.601 luma weights; resize = the repo's
  deterministic nearest-neighbor kernel (``multimodal._resize_nn``) —
  NOT PIL's antialias, so hashes are reproducible anywhere numpy runs
  but differ from the imagehash package's exact values (documented
  intentional: determinism > cross-library equality);
- pHash: 32×32 → 2-D DCT-II (numpy matrix product, no scipy) →
  top-left 8×8 low-frequency block → bit i = coeff_i > median — 64
  bits. dHash: 8×9 → horizontal gradient sign — 64 bits;
- pairs: ``dedup.hamming_band_pairs`` — the SAME pigeonhole bit-block
  banding the SimHash text path uses, so candidate generation is
  equi-joins, never n².

100 TB shape: hashing is an Arrow-batched mapInPandas over the
byte-deduped media table (decode each distinct payload once); the pair
join runs over 8-byte fingerprints — the corpus' pixel bytes never
shuffle.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from dwh_with_dask_spark.operators.dedup import hamming_band_pairs
from dwh_with_dask_spark.operators.multimodal import _decode_image, _resize_nn

PHASH_SCHEMA = "content_hash string, phash long, dhash long"


def _gray(img: np.ndarray) -> np.ndarray:
    """BT.601 luma, float64 (h, w)."""
    if img.ndim == 2:
        return img.astype(np.float64)
    if img.shape[2] == 1:
        return img[:, :, 0].astype(np.float64)
    w = np.array([0.299, 0.587, 0.114])
    return img[:, :, :3].astype(np.float64) @ w


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis matrix D: dct2(A) = D @ A @ D.T."""
    k = np.arange(n)[:, None]
    x = np.arange(n)[None, :]
    d = np.cos(np.pi * (2 * x + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    d[0] /= np.sqrt(2.0)
    return d


_D32 = _dct_matrix(32)


def _bits_to_long(bits: np.ndarray) -> int:
    """Row-major bit array -> signed int64 (bit 0 = MSB-first order
    would differ per library; we fix bit i = flattened index i)."""
    v = 0
    for i, b in enumerate(bits.reshape(-1)):
        if b:
            v |= 1 << i
    # wrap to signed 64-bit (Spark LongType)
    return v - (1 << 64) if v >= (1 << 63) else v


def phash_bits(img: np.ndarray, hash_size: int = 8) -> int:
    """DCT low-frequency hash of a decoded image (64 bits)."""
    g = _resize_nn(_gray(img)[:, :, None], 32, 32)[:, :, 0]
    coeffs = _D32 @ g @ _D32.T
    low = coeffs[:hash_size, :hash_size]
    med = np.median(low)
    return _bits_to_long(low > med)


def dhash_bits(img: np.ndarray, hash_size: int = 8) -> int:
    """Horizontal-gradient hash: resize to (hash_size, hash_size+1),
    bit = pixel brighter than its left neighbor (64 bits)."""
    g = _resize_nn(_gray(img)[:, :, None], hash_size, hash_size + 1)[:, :, 0]
    return _bits_to_long(g[:, 1:] > g[:, :-1])


def image_perceptual_hashes(media: DataFrame, batch_rows: int = 64) -> DataFrame:
    """(content_hash, phash, dhash) per distinct payload — decode once
    per distinct content_hash (byte-dedup BEFORE the expensive decode,
    the multimodal family's standard order), Arrow-batched."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            hashes, ph, dh = [], [], []
            for content_hash, content in zip(pdf["content_hash"], pdf["content"]):
                img = _decode_image(bytes(content))
                hashes.append(content_hash)
                ph.append(phash_bits(img))
                dh.append(dhash_bits(img))
            yield pd.DataFrame(
                {"content_hash": hashes, "phash": ph, "dhash": dh}
            )

    deduped = media.dropDuplicates(["content_hash"]).select(
        "content_hash", "content"
    )
    return deduped.mapInPandas(run, schema=PHASH_SCHEMA)


def phash_near_dup_pairs(
    media: DataFrame,
    max_hamming: int = 10,
    bands: int = 16,
    method: str = "phash",
) -> DataFrame:
    """Near-duplicate image pairs: (id_a, id_b, hamming) over the
    perceptual hash, via the shared bit-block banding. ``bands`` must
    exceed ``max_hamming`` (pigeonhole completeness; 16 4-bit bands
    cover Hamming ≤ 15)."""
    if method not in ("phash", "dhash"):
        raise ValueError("method must be phash or dhash")
    hashes = image_perceptual_hashes(media)
    return hamming_band_pairs(
        hashes, "content_hash", method, 64, max_hamming, bands
    ).withColumnRenamed("id_a", "hash_a").withColumnRenamed("id_b", "hash_b")
