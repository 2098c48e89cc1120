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
