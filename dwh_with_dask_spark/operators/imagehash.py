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
from pyspark.sql import functions as F

from dwh_with_dask_spark.operators.dedup import hamming_band_pairs
from dwh_with_dask_spark.operators.multimodal import _decode_image, _resize_nn

PHASH_SCHEMA = (
    "content_hash string, phash long, dhash long, phash_d8 long, "
    "phash_orients array<long>"
)


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


def phash_orientation_bits(img: np.ndarray, hash_size: int = 8) -> list[int]:
    """pHash of each of the 8 orientations of the square dihedral group
    (4 rotations × optional mirror), fixed order: [I, R, R², R³, F,
    FR, FR², FR³] applied to the 32×32 grid. Cost: 8 DCTs of a 32×32
    grid per image, inside the same Arrow batch — decode and resize
    are NOT repeated."""
    g32 = _resize_nn(_gray(img)[:, :, None], 32, 32)[:, :, 0]
    out = []
    for base in (g32, np.fliplr(g32)):
        for k in range(4):
            g = np.rot90(base, k)
            coeffs = _D32 @ g @ _D32.T
            low = coeffs[:hash_size, :hash_size]
            med = np.median(low)
            out.append(_bits_to_long(low > med))
    return out


def phash_d8_bits(img: np.ndarray, hash_size: int = 8) -> int:
    """Dihedral-CANONICAL pHash (VERDICT r6 ask #6): the minimum (as
    unsigned 64-bit) over the 8 orientation hashes. Two images related
    by any exact rotation/flip share the same orientation SET, hence
    the same canonical hash — this is the exact-dihedral-copy dedup
    key (one 8-byte column, groupBy dedup, no pair join).

    Fragility, measured: composed with OTHER edits (quantization,
    patches) the argmin orientation can flip, throwing the canonical
    hashes of a true near-dup pair ~24-30 bits apart. NEAR-dup
    matching under rotation therefore goes through
    ``phash_dihedral_near_dup_pairs`` (orientation-set band join),
    not through banding this column."""
    best = min(h & ((1 << 64) - 1) for h in phash_orientation_bits(img, hash_size))
    return best - (1 << 64) if best >= (1 << 63) else best


def image_perceptual_hashes(media: DataFrame) -> DataFrame:
    """(content_hash, phash, dhash, phash_d8) per distinct payload —
    decode once per distinct content_hash (byte-dedup BEFORE the
    expensive decode, the multimodal family's standard order),
    Arrow-batched. Batch size is governed by the session's
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` like the rest of
    the multimodal family (the former ``batch_rows`` parameter was
    dead API — ADVICE r6)."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            hashes, ph, dh, pd8, po = [], [], [], [], []
            for content_hash, content in zip(pdf["content_hash"], pdf["content"]):
                img = _decode_image(bytes(content))
                obits = phash_orientation_bits(img)
                best = min(h & ((1 << 64) - 1) for h in obits)
                hashes.append(content_hash)
                ph.append(obits[0])  # identity orientation == plain pHash
                dh.append(dhash_bits(img))
                pd8.append(best - (1 << 64) if best >= (1 << 63) else best)
                po.append(obits)
            yield pd.DataFrame(
                {
                    "content_hash": hashes,
                    "phash": ph,
                    "dhash": dh,
                    "phash_d8": pd8,
                    "phash_orients": po,
                }
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
    cover Hamming ≤ 15). ``method="phash_d8"`` matches across
    rotations and flips too (dihedral-canonical hash)."""
    if method not in ("phash", "dhash", "phash_d8"):
        raise ValueError("method must be phash, dhash, or phash_d8")
    hashes = image_perceptual_hashes(media)
    return hamming_band_pairs(
        hashes, "content_hash", method, 64, max_hamming, bands
    ).withColumnRenamed("id_a", "hash_a").withColumnRenamed("id_b", "hash_b")


def phash_dihedral_near_dup_pairs(
    media: DataFrame,
    max_hamming: int = 10,
    bands: int = 16,
    scope=None,
) -> DataFrame:
    """Rotation/flip-ROBUST near-duplicate pairs (VERDICT r6 ask #6):
    (hash_a, hash_b, hamming) where hamming = min over A's 8
    orientation pHashes vs B's plain pHash. If B is any dihedral
    transform of A composed with the usual near-dup edits, exactly one
    of A's orientations aligns with B and their distance is the plain
    aligned-pHash distance — no dependence on an argmin staying stable
    under noise (the canonical-min column's measured failure mode).

    Scale shape: the A side explodes to 8 rows of 8-byte fingerprints
    per image before the same pigeonhole banding ``hamming_band_pairs``
    uses — 8 × bands equi-join rows per image, still fingerprint-sized;
    pixels never shuffle. Completeness: for the ALIGNED orientation
    pair the pigeonhole argument is unchanged (distance ≤ max_hamming
    < bands forces an agreeing block), so every true pair is found.
    """
    from dwh_with_dask_spark.operators.caching import attach, scoped

    if max_hamming >= bands:
        raise ValueError("completeness requires max_hamming < bands")
    block = 64 // bands
    mask = (1 << block) - 1
    # Persisted: the hash table feeds BOTH join sides — without it each
    # side re-decodes every image. Lifecycle: caller-owned via ``scope``
    # (operators.caching), released after the final action.
    scope, created = scoped(scope)
    hashes = scope.persist(image_perceptual_hashes(media))
    orients = hashes.select(
        F.col("content_hash").alias("id"),
        F.explode("phash_orients").alias("__ofp"),
    )
    banded_a = orients.select(
        "id",
        "__ofp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright(F.col("__ofp"), i * block)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "__ofp", "bb.band", "bb.key")
    banded_b = hashes.select(
        F.col("content_hash").alias("id"), F.col("phash").alias("__fp")
    ).select(
        "id",
        "__fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright(F.col("__fp"), i * block)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "__fp", "bb.band", "bb.key")
    a, b = banded_a.alias("a"), banded_b.alias("b")
    ham = F.bit_count(F.col("a.__ofp").bitwiseXOR(F.col("b.__fp")))
    out = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("hash_a"),
            F.col("b.id").alias("hash_b"),
            ham.alias("__h"),
        )
        .groupBy("hash_a", "hash_b")
        .agg(F.min("__h").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
    return attach(out, scope, created)
