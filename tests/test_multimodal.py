"""Multimodal operator tests: the Spark-side plumbing is real (schemas,
Arrow batching, dedup-before-decode); the decode kernels are
deterministic stubs (no image/audio libs in this runtime)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dwh_with_dask_spark.operators.multimodal import (
    audio_features,
    frame_sample,
    image_features,
    media_table,
)


@pytest.fixture()
def media(spark):
    rows = [
        ("/data/a.png", 1000, b"\x89PNG" + b"x" * 96),
        ("/data/b.png", 2000, b"\x89PNG" + b"y" * 196),
        ("/data/a_copy.png", 1000, b"\x89PNG" + b"x" * 96),  # duplicate bytes
    ]
    binaries = spark.createDataFrame(
        [(p, length, content) for p, length, content in rows],
        "path string, length long, content binary",
    )
    return media_table(binaries, "image")


def test_media_table_hash_key(spark, media):
    rows = media.collect()
    assert {r["media_type"] for r in rows} == {"image"}
    by_path = {r["path"]: r["content_hash"] for r in rows}
    # identical bytes → identical content hash (the dedup join key)
    assert by_path["/data/a.png"] == by_path["/data/a_copy.png"]
    assert by_path["/data/a.png"] != by_path["/data/b.png"]
    assert all(len(r["content_hash"]) == 64 for r in rows)


def test_image_features_dedups_before_decode(spark, media):
    feats = image_features(media).collect()
    # 3 files, 2 distinct contents → decode ran per distinct hash
    assert len(feats) == 2
    f = feats[0]
    assert f["width"] == 4 and f["height"] == 4 and f["n_channels"] == 3
    assert len(f["embedding"]) == 3
    assert 0.0 <= f["mean_luma"] <= 255.0


def test_audio_features_contract(spark, media):
    feats = audio_features(media).collect()
    assert len(feats) == 2
    f = feats[0]
    assert f["sample_rate"] == 16_000
    assert f["duration_s"] == pytest.approx(f["n_samples"] / f["sample_rate"])
    assert f["rms"] >= 0.0


def test_frame_sample_expansion(spark, media):
    """UDTF-shape one-to-many expansion: every 30th frame per distinct
    payload, deterministic bytes, frame numbers 0, 30, 60, ..."""
    frames = frame_sample(media, every_n=30).collect()
    by_hash = {}
    for r in frames:
        by_hash.setdefault(r["content_hash"], []).append(r)
    # 3 files, 2 distinct contents -> frames decoded per distinct hash
    assert len(by_hash) == 2
    for rows in by_hash.values():
        nos = sorted(r["frame_no"] for r in rows)
        assert nos == list(range(0, max(nos) + 1, 30))
        for r in rows:
            assert r["ts_s"] == pytest.approx(r["frame_no"] / 30.0)
            assert isinstance(r["frame_bytes"], (bytes, bytearray))
            assert len(r["frame_bytes"]) == 32
    # Determinism: a second run yields identical frame digests.
    again = frame_sample(media, every_n=30).collect()
    key = lambda r: (r["content_hash"], r["frame_no"], bytes(r["frame_bytes"]))
    assert sorted(map(key, frames)) == sorted(map(key, again))


def test_binary_column_pruning(spark, media):
    """Metadata-only queries must not read the binary payload column —
    the reason content lives in its own column."""
    meta_only = media.select("path", "n_bytes").filter(F.col("n_bytes") > 1500)
    assert "content" not in meta_only.columns
    assert meta_only.count() == 1


def test_resize_nn_index_map():
    """The numpy NN resample is real logic: verify the index map on an
    asymmetric image (no Spark involved)."""
    import numpy as np

    from dwh_with_dask_spark.operators.multimodal import _resize_nn

    img = np.arange(2 * 4 * 1, dtype=np.uint8).reshape(2, 4, 1)
    # upscale 2x4 -> 4x4: rows repeat [0,0,1,1]
    up = _resize_nn(img, 4, 4)
    assert up.shape == (4, 4, 1)
    assert (up[0] == img[0]).all() and (up[1] == img[0]).all()
    assert (up[2] == img[1]).all() and (up[3] == img[1]).all()
    # downscale 2x4 -> 1x2: picks rows [0], cols [0, 2]
    down = _resize_nn(img, 1, 2)
    assert down.shape == (1, 2, 1)
    assert down[0, 0, 0] == img[0, 0, 0] and down[0, 1, 0] == img[0, 2, 0]


def test_image_resize_plumbing(spark):
    """Distributed contract: dedup-by-hash, fixed output dims, pixel
    buffer length = h*w*c, deterministic per content."""
    from pyspark.sql import functions as F

    from dwh_with_dask_spark.operators.multimodal import image_resize, media_table

    rows = [("a", b"payload-one"), ("b", b"payload-two"), ("c", b"payload-one")]
    binaries = spark.createDataFrame(rows, "path string, content binary").select(
        "path", F.octet_length("content").alias("length"), "content"
    )
    out = image_resize(media_table(binaries, "image"), width=6, height=3).collect()
    # 3 inputs but 2 distinct payloads -> 2 rows (dedup before decode)
    assert len(out) == 2
    for r in out:
        assert (r["width"], r["height"], r["n_channels"]) == (6, 3, 3)
        assert len(r["pixels"]) == 3 * 6 * 3


def test_resample_linear_math():
    """Real interpolation math, no Spark: downsample 2:1 picks every
    other sample exactly; upsample 1:2 interpolates midpoints."""
    import numpy as np

    from dwh_with_dask_spark.operators.multimodal import _resample_linear

    x = np.array([0.0, 1.0, 2.0, 3.0], dtype=np.float32)
    down = _resample_linear(x, 16000, 8000)
    assert np.allclose(down, [0.0, 2.0])
    up = _resample_linear(x, 8000, 16000)
    assert len(up) == 8
    assert np.allclose(up[:6], [0.0, 0.5, 1.0, 1.5, 2.0, 2.5])


def test_audio_resample_plumbing(spark):
    from pyspark.sql import functions as F

    from dwh_with_dask_spark.operators.multimodal import audio_resample, media_table

    rows = [("a", b"clip-one"), ("b", b"clip-two"), ("c", b"clip-one")]
    binaries = spark.createDataFrame(rows, "path string, content binary").select(
        "path", F.octet_length("content").alias("length"), "content"
    )
    out = audio_resample(media_table(binaries, "audio"), target_rate=8000).collect()
    assert len(out) == 2  # dedup before decode
    for r in out:
        # stub decodes 1600 samples at 16 kHz -> 800 at 8 kHz
        assert (r["sample_rate"], r["n_samples"]) == (8000, 800)
        assert len(r["samples"]) == 800 * 4  # float32
