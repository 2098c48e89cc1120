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


def _png_encode(img, filters=None):
    """Minimal PNG encoder for tests: per-row filter type exercised
    explicitly (the decoder under test must invert all five)."""
    import struct
    import zlib

    import numpy as np

    h, w, ch = img.shape
    color_type = {1: 0, 3: 2, 4: 6}[ch]
    filters = filters or [0] * h

    def chunk(ctype, payload):
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for y, f in zip(range(h), filters):
        line = img[y].reshape(-1).astype(np.int32)
        if f == 0:
            filt = line
        elif f == 1:  # Sub
            left = np.concatenate([np.zeros(ch, np.int32), line[:-ch]])
            filt = (line - left) % 256
        elif f == 2:  # Up
            filt = (line - prev) % 256
        elif f == 3:  # Average
            left = np.concatenate([np.zeros(ch, np.int32), line[:-ch]])
            filt = (line - ((left + prev) >> 1)) % 256
        elif f == 4:  # Paeth
            left = np.concatenate([np.zeros(ch, np.int32), line[:-ch]])
            upleft = np.concatenate([np.zeros(ch, np.int32), prev[:-ch]])
            pt = left + prev - upleft
            pa, pb, pc = abs(pt - left), abs(pt - prev), abs(pt - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            filt = (line - pred) % 256
        raw.append(f)
        raw.extend(filt.astype(np.uint8).tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _wav_encode(samples_f32, sr, width=2, channels=1):
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(channels)
        wv.setsampwidth(width)
        wv.setframerate(sr)
        if width == 2:
            pcm = (np.clip(samples_f32, -1, 1) * 32767).astype("<i2")
        else:
            raise NotImplementedError
        wv.writeframes(pcm.tobytes())
    return buf.getvalue()


def test_png_stdlib_decode_roundtrip_all_filters():
    import numpy as np

    from dwh_with_dask_spark.operators.multimodal import _decode_png_stdlib

    rng = np.random.default_rng(7)
    for ch in (1, 3, 4):
        img = rng.integers(0, 256, size=(5, 6, ch), dtype=np.uint8)
        data = _png_encode(img, filters=[0, 1, 2, 3, 4])
        got = _decode_png_stdlib(data)
        assert got.shape == img.shape
        assert (got == img).all(), f"channels={ch}"


class _JpegBitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value, nbits):
        for k in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> k) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.n = 0, 0

    def flush(self):
        while self.n:
            self.put(1, 1)  # pad with 1-bits per T.81


def _jpeg_encode_baseline(img, sub=1, restart=0, return_coeffs=False):
    """Minimal baseline JPEG encoder for tests: forward DCT + flat
    quantization (all-ones tables — near-lossless), custom fixed-length
    canonical Huffman tables emitted in DHT, optional 2x2 chroma
    subsampling (sub=2) and restart markers. Exercises every structure
    the decoder under test must parse."""
    import struct

    import numpy as np

    h, w, ch = img.shape
    M = np.zeros((8, 8))
    for u in range(8):
        cu = (1 / np.sqrt(2)) if u == 0 else 1.0
        for x in range(8):
            M[u, x] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16)
    ZZ = [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
          12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
          35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
          58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]

    f = img.astype(np.float64)
    if ch == 3:
        r, g, b = f[..., 0], f[..., 1], f[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
        samp = [(sub, sub), (1, 1), (1, 1)]
    else:
        planes = [f[..., 0]]
        samp = [(1, 1)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x, mcus_y = -(-w // (8 * hmax)), -(-h // (8 * vmax))

    prepped = []
    for p, (sh, sv) in zip(planes, samp):
        if (sh, sv) != (hmax, vmax):  # box-average downsample
            fy, fx = vmax // sv, hmax // sh
            py = p[: (p.shape[0] // fy) * fy, : (p.shape[1] // fx) * fx]
            p = py.reshape(py.shape[0] // fy, fy, py.shape[1] // fx, fx).mean((1, 3))
        th, tw = mcus_y * sv * 8, mcus_x * sh * 8
        pad = np.zeros((th, tw))
        pad[: p.shape[0], : p.shape[1]] = p
        pad[p.shape[0] :, : p.shape[1]] = p[-1:, :]
        pad[:, p.shape[1] :] = pad[:, p.shape[1] - 1 : p.shape[1]]
        prepped.append(pad)

    def category(v):
        return abs(v).bit_length()

    # pass 1: coefficients + symbol inventory
    blocks, dc_syms, ac_syms = [], set(), set()
    coeff_store = {}
    pred = [0] * len(prepped)
    for mcu in range(mcus_x * mcus_y):
        if restart and mcu and mcu % restart == 0:
            pred = [0] * len(prepped)
        my, mx = divmod(mcu, mcus_x)
        for ci, (p, (sh, sv)) in enumerate(zip(prepped, samp)):
            for by in range(sv):
                for bx in range(sh):
                    y0, x0 = (my * sv + by) * 8, (mx * sh + bx) * 8
                    blk = p[y0 : y0 + 8, x0 : x0 + 8] - 128.0
                    F = M @ blk @ M.T
                    q = np.rint(F).astype(np.int64)  # flat quant = 1
                    coeff_store[(ci, mcu, by, bx)] = q.copy()
                    zz = q.reshape(-1)[ZZ]
                    diff = int(zz[0]) - pred[ci]
                    pred[ci] = int(zz[0])
                    s = category(diff)
                    dc_syms.add(s)
                    events = [("dc", s, diff)]
                    run = 0
                    for k in range(1, 64):
                        v = int(zz[k])
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            ac_syms.add(0xF0)
                            events.append(("ac", 0xF0, 0))
                            run -= 16
                        s = category(v)
                        sym = (run << 4) | s
                        ac_syms.add(sym)
                        events.append(("ac", sym, v))
                        run = 0
                    if run:
                        ac_syms.add(0x00)
                        events.append(("ac", 0x00, 0))
                    blocks.append(events)

    def fixed_table(symbols):
        syms = sorted(symbols)
        L = max(1, (len(syms)).bit_length())  # codes 0..k-1 of length L
        counts = [0] * 16
        counts[L - 1] = len(syms)
        codes = {s: (L, c) for c, s in enumerate(syms)}
        return counts, syms, codes

    dc_counts, dc_list, dc_codes = fixed_table(dc_syms)
    ac_counts, ac_list, ac_codes = fixed_table(ac_syms)

    # pass 2: entropy bytes
    wtr = _JpegBitWriter()
    chunks = []
    for i, events in enumerate(blocks):
        blocks_per_mcu = sum(sh * sv for sh, sv in samp)
        mcu = i // blocks_per_mcu
        if restart and mcu and mcu % restart == 0 and i % blocks_per_mcu == 0:
            wtr.flush()
            chunks.append(bytes(wtr.out))
            chunks.append(bytes([0xFF, 0xD0 + ((mcu // restart - 1) % 8)]))
            wtr = _JpegBitWriter()
        for kind, sym, v in events:
            L, code = dc_codes[sym] if kind == "dc" else ac_codes[sym]
            wtr.put(code, L)
            s = sym & 15 if kind == "ac" else sym
            if kind == "dc":
                s = sym
            if s:
                wtr.put(v if v >= 0 else v + (1 << s) - 1, s)
    wtr.flush()
    chunks.append(bytes(wtr.out))
    entropy = b"".join(chunks)

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    qzz = bytes([1] * 64)
    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, b"\x00" + qzz)
    sof = struct.pack(">BHHB", 8, h, w, len(prepped))
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, 0])
    out += seg(0xC0, sof)
    out += seg(0xC4, b"\x00" + bytes(dc_counts) + bytes(dc_list))
    out += seg(0xC4, b"\x10" + bytes(ac_counts) + bytes(ac_list))
    if restart:
        out += seg(0xDD, struct.pack(">H", restart))
    sos = bytes([len(prepped)])
    for ci in range(len(prepped)):
        sos += bytes([ci + 1, 0x00])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += entropy + b"\xff\xd9"
    if return_coeffs:
        return bytes(out), coeff_store, samp, (mcus_x, mcus_y)
    return bytes(out)


def test_jpeg_stdlib_decode_roundtrip_444():
    import numpy as np

    from dwh_with_dask_spark.operators.jpeg import decode_jpeg

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(16, 13, 3), dtype=np.uint8)
    got = decode_jpeg(_jpeg_encode_baseline(img))
    assert got.shape == img.shape
    # flat (all-ones) quantization: the only loss is coefficient
    # rounding, bounded by the DCT basis mass — a few intensity levels.
    assert int(np.abs(got.astype(int) - img.astype(int)).max()) <= 4


def test_jpeg_stdlib_decode_grayscale():
    import numpy as np

    from dwh_with_dask_spark.operators.jpeg import decode_jpeg

    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, size=(9, 17, 1), dtype=np.uint8)
    got = decode_jpeg(_jpeg_encode_baseline(img))
    assert got.shape == img.shape
    assert int(np.abs(got.astype(int) - img.astype(int)).max()) <= 2


def test_jpeg_stdlib_decode_420_and_restart():
    import numpy as np

    from dwh_with_dask_spark.operators.jpeg import decode_jpeg

    # Equal RGB channels -> constant chroma, so 2x2 subsampling loses
    # nothing and the tolerance stays at coefficient-rounding level even
    # with odd dimensions (pad/crop) and restart markers every 2 MCUs.
    rng = np.random.default_rng(13)
    gray = rng.integers(0, 256, size=(21, 19, 1), dtype=np.uint8)
    img = np.repeat(gray, 3, axis=2)
    data = _jpeg_encode_baseline(img, sub=2, restart=2)
    assert b"\xff\xd0" in data or b"\xff\xd1" in data  # RST markers present
    got = decode_jpeg(data)
    assert got.shape == img.shape
    assert int(np.abs(got.astype(int) - img.astype(int)).max()) <= 4


def test_jpeg_exact_output_vs_independent_reconstruction():
    # EXACT check of Huffman + dequant + IDCT + color conversion: the
    # encoder hands back its quantized coefficient blocks; an
    # independently-written IDCT (explicit cosine sums, no shared code
    # with operators.jpeg) reconstructs the expected pixels, and the
    # decoder must reproduce them bit-for-bit.
    import numpy as np

    from dwh_with_dask_spark.operators.jpeg import decode_jpeg

    rng = np.random.default_rng(14)
    img = rng.integers(0, 256, size=(10, 14, 3), dtype=np.uint8)
    data, coeffs, samp, (mcus_x, mcus_y) = _jpeg_encode_baseline(
        img, return_coeffs=True
    )

    xs = np.arange(8)
    cos = np.cos((2 * xs[None, :] + 1) * xs[:, None] * np.pi / 16)
    cu = np.where(xs == 0, 1 / np.sqrt(2), 1.0)

    def idct8(q):
        out = np.zeros((8, 8))
        for y in range(8):
            for x in range(8):
                out[y, x] = 0.25 * np.sum(
                    cu[:, None] * cu[None, :] * q
                    * cos[:, y][:, None] * cos[:, x][None, :]
                )
        return out + 128.0

    planes = []
    for ci, (sh, sv) in enumerate(samp):
        p = np.zeros((mcus_y * sv * 8, mcus_x * sh * 8))
        for mcu in range(mcus_x * mcus_y):
            my, mx = divmod(mcu, mcus_x)
            for by in range(sv):
                for bx in range(sh):
                    y0, x0 = (my * sv + by) * 8, (mx * sh + bx) * 8
                    p[y0 : y0 + 8, x0 : x0 + 8] = idct8(coeffs[(ci, mcu, by, bx)])
        planes.append(p[: img.shape[0], : img.shape[1]])
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    expected = np.clip(
        np.round(
            np.stack(
                [
                    y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb,
                ],
                axis=-1,
            )
        ),
        0,
        255,
    ).astype(np.uint8)

    got = decode_jpeg(data)
    assert (got == expected).all()


def test_jpeg_arithmetic_falls_back_to_stub():
    """Frames outside the supported subset (SOF9 arithmetic here) still
    raise, and the multimodal dispatch still falls back to the
    documented stub. (Progressive SOF2 is REAL as of round 15 — see
    the test_jpeg_progressive_* suite.)"""
    import struct

    from dwh_with_dask_spark.operators.jpeg import decode_jpeg
    from dwh_with_dask_spark.operators.multimodal import (
        _decode_image,
        _decode_image_stub,
    )
    import numpy as np
    import pytest

    sof9 = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    data = (
        b"\xff\xd8"
        + b"\xff\xc9"
        + struct.pack(">H", len(sof9) + 2)
        + sof9
        + b"\xff\xd9"
    )
    with pytest.raises(ValueError):
        decode_jpeg(data)
    assert (np.asarray(_decode_image(data)) == _decode_image_stub(data)).all()


def test_image_features_on_real_jpeg(spark):
    # End-to-end through the Spark plumbing: real JPEG bytes in a media
    # table -> mapInPandas decode -> width/height/luma from the actual
    # pixels (not the stub).
    import numpy as np

    from dwh_with_dask_spark.operators.multimodal import image_features

    img = np.full((24, 16, 3), 200, dtype=np.uint8)
    img[:12, :, :] = 40  # top half dark: mean luma ~(40+200)/2
    data = _jpeg_encode_baseline(img)
    media = spark.createDataFrame(
        [("m1", "h1", bytearray(data))],
        "path string, content_hash string, content binary",
    )
    row = image_features(media).collect()[0]
    assert (row["width"], row["height"], row["n_channels"]) == (16, 24, 3)
    assert abs(row["mean_luma"] - 120.0) < 3.0


def test_png_unsupported_subset_falls_back_to_stub():
    # A VALID 16-bit grayscale PNG is outside the stdlib decoder's
    # subset: _decode_png_stdlib raises ValueError, and _decode_image
    # must catch it and fall through to the stub instead of letting the
    # error fail the whole Spark task from inside the mapInPandas UDF.
    import struct
    import zlib

    import numpy as np
    import pytest

    from dwh_with_dask_spark.operators.multimodal import (
        _decode_image,
        _decode_image_stub,
        _decode_png_stdlib,
    )

    def chunk(ctype, payload):
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)  # 1x1 gray16
    idat = zlib.compress(b"\x00\xab\xcd")  # filter 0 + one 16-bit sample
    png16 = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        _decode_png_stdlib(png16)
    got = _decode_image(png16)
    assert (got == _decode_image_stub(png16)).all()
    assert got.dtype == np.uint8 and got.shape == (4, 4, 3)


def test_wav_stdlib_decode_real_sine():
    import numpy as np

    from dwh_with_dask_spark.operators.multimodal import _decode_audio

    sr = 16_000
    t = np.arange(sr, dtype=np.float64) / sr
    sine = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    data = _wav_encode(sine, sr)
    x, got_sr = _decode_audio(data)
    assert got_sr == sr and len(x) == sr
    # RMS of a 0.5-amplitude sine = 0.5/sqrt(2); 16-bit quantization noise
    assert abs(float(np.sqrt(np.mean(x**2))) - 0.5 / np.sqrt(2)) < 1e-3


def test_image_features_on_real_png(spark):
    import numpy as np

    from dwh_with_dask_spark.operators.multimodal import image_features, image_resize

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(10, 8, 3), dtype=np.uint8)
    data = _png_encode(img, filters=[4, 3, 2, 1, 0, 4, 3, 2, 1, 0])
    media = spark.createDataFrame(
        [("p1", "image", len(data), "h1", bytearray(data))],
        "path string, media_type string, n_bytes long, content_hash string, content binary",
    )
    feat = image_features(media).collect()[0]
    assert (feat["width"], feat["height"], feat["n_channels"]) == (8, 10, 3)
    assert abs(feat["mean_luma"] - float(img.mean())) < 1e-6
    rz = image_resize(media, width=4, height=5).collect()[0]
    assert (rz["width"], rz["height"]) == (4, 5)
    got = np.frombuffer(bytes(rz["pixels"]), dtype=np.uint8).reshape(5, 4, 3)
    # nearest-neighbor: every output pixel must exist in the source image
    ri = np.arange(5) * 10 // 5
    ci = np.arange(4) * 8 // 4
    assert (got == img[ri][:, ci]).all()


def test_audio_features_on_real_wav(spark):
    import numpy as np

    from dwh_with_dask_spark.operators.multimodal import audio_features, audio_resample

    sr = 16_000
    t = np.arange(sr // 2, dtype=np.float64) / sr
    sine = (0.25 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    data = _wav_encode(sine, sr)
    media = spark.createDataFrame(
        [("a1", "audio", len(data), "h2", bytearray(data))],
        "path string, media_type string, n_bytes long, content_hash string, content binary",
    )
    feat = audio_features(media).collect()[0]
    assert feat["sample_rate"] == sr and feat["n_samples"] == sr // 2
    assert abs(feat["rms"] - 0.25 / np.sqrt(2)) < 1e-3
    rs = audio_resample(media, target_rate=8_000).collect()[0]
    assert rs["sample_rate"] == 8_000
    assert rs["n_samples"] == sr // 4  # half duration at half the rate


def _clip(seed: int, secs: float = 1.5, sr: int = 8000):
    """Deterministic music-like test clip: seeded chirps with
    amplitude envelopes plus broadband noise. The fingerprint's bits
    are signs of TIME-differences of band energies, so a stationary
    signal (pure sinusoids) gives near-zero differences whose signs
    are noise — the fixture must be nonstationary and broadband like
    the audio the algorithm targets."""
    import numpy as np

    rng = np.random.default_rng(seed)
    t = np.arange(int(secs * sr)) / sr
    x = np.zeros_like(t)
    for _ in range(6):
        f0 = rng.uniform(320, 1500)
        drift = rng.uniform(-300, 300)
        a = rng.uniform(0.3, 1.0)
        ph = rng.uniform(0, 2 * np.pi)
        env = 0.5 + 0.5 * np.sin(
            2 * np.pi * rng.uniform(0.7, 3.0) * t + rng.uniform(0, 6)
        )
        x += a * env * np.sin(2 * np.pi * (f0 + drift * t) * t + ph)
    x += 0.15 * rng.standard_normal(len(t))  # broadband bed
    return (x / np.max(np.abs(x)) * 0.8).astype(np.float64)


def test_audio_fingerprint_gain_invariant_and_noise_robust():
    """Haitsma-Kalker bits: EXACT invariance to global gain (the
    log-energy double difference cancels it), high bit agreement under
    mild noise, low agreement between unrelated clips."""
    import numpy as np

    from dwh_with_dask_spark.operators.audiofp import fingerprint_samples

    def ber(a, b):
        x = [bin(((u ^ v) & 0xFFFFFFFF)).count("1") for u, v in zip(a, b)]
        return sum(x) / (32.0 * len(x))

    x = _clip(1)
    fp = fingerprint_samples(x)
    assert len(fp) >= 15

    assert fingerprint_samples(x * 0.25) == fp  # exact gain invariance

    rng = np.random.default_rng(9)
    noisy = x + 0.01 * rng.standard_normal(len(x))
    assert ber(fp, fingerprint_samples(noisy)) < 0.15

    other = _clip(2)
    assert ber(fp, fingerprint_samples(other)) > 0.3


def test_audio_near_dup_pairs_find_gain_copies(spark):
    """Distributed matching: a gain-shifted copy and a lightly-noisy
    copy pair with their source; unrelated clips do not."""
    import numpy as np

    from dwh_with_dask_spark.operators.audiofp import audio_near_dup_pairs
    from dwh_with_dask_spark.operators.multimodal import media_table

    base = _clip(1)
    rng = np.random.default_rng(5)
    clips = [
        base,
        base * 0.5,
        base + 0.005 * rng.standard_normal(len(base)),
        _clip(2),
        _clip(3),
    ]
    rows = [
        (f"c{i}", len(b), b)
        for i, b in enumerate(_wav_encode(c, 8000) for c in clips)
    ]
    df = spark.createDataFrame(rows, "path string, length long, content binary")
    media = media_table(df, "audio")

    import hashlib

    h = [
        hashlib.sha256(_wav_encode(c, 8000)).hexdigest() for c in clips
    ]
    got = {
        tuple(sorted((r.hash_a, r.hash_b))): r.overlap
        for r in audio_near_dup_pairs(media, min_shared=4).collect()
    }
    # base pairs with both variants; the two unrelated clips pair with
    # nothing
    assert tuple(sorted((h[0], h[1]))) in got
    assert tuple(sorted((h[0], h[2]))) in got
    for bad in (3, 4):
        for i in range(5):
            if i != bad:
                assert tuple(sorted((h[i], h[bad]))) not in got
    # Gain copy: NOT asserted == 1.0 — the Spark path WAV-encodes to
    # int16 PCM and quantization can flip a near-zero double-difference
    # bit (measured 18/19 = 0.947 on this clip; see audiofp docstring).
    assert got[tuple(sorted((h[0], h[1])))] >= 0.9
    # Noisy copy shares most frames too.
    assert got[tuple(sorted((h[0], h[2])))] >= 0.5


def test_audio_fingerprints_deterministic_across_partitioning(spark):
    from dwh_with_dask_spark.operators.audiofp import audio_fingerprints
    from dwh_with_dask_spark.operators.multimodal import media_table

    clips = [_clip(i) for i in range(4)]
    rows = [
        (f"c{i}", len(b), b)
        for i, b in enumerate(_wav_encode(c, 8000) for c in clips)
    ]
    df = spark.createDataFrame(rows, "path string, length long, content binary")
    a = sorted(
        (r.content_hash, r.n_frames, tuple(r.fp))
        for r in audio_fingerprints(media_table(df, "audio")).collect()
    )
    b = sorted(
        (r.content_hash, r.n_frames, tuple(r.fp))
        for r in audio_fingerprints(
            media_table(df.repartition(5), "audio")
        ).collect()
    )
    assert a == b


# ---------------------------------------------------------------------------
# Progressive JPEG (round 15): minimal test encoder + bit-exact tests
# ---------------------------------------------------------------------------


def _jpeg_coeff_grids(img, sub=1):
    """Forward DCT + flat quantization into PER-COMPONENT zigzag
    coefficient grids (BY, BX, 64) — the shared front half of both
    test encoders."""
    import numpy as np

    h, w, ch = img.shape
    M = np.zeros((8, 8))
    for u in range(8):
        cu = (1 / np.sqrt(2)) if u == 0 else 1.0
        for x in range(8):
            M[u, x] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16)
    ZZ = [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
          12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
          35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
          58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]
    f = img.astype(np.float64)
    if ch == 3:
        r, g, b = f[..., 0], f[..., 1], f[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
        samp = [(sub, sub), (1, 1), (1, 1)]
    else:
        planes = [f[..., 0]]
        samp = [(1, 1)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x, mcus_y = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    grids = []
    for p, (sh, sv) in zip(planes, samp):
        if (sh, sv) != (hmax, vmax):
            fy, fx = vmax // sv, hmax // sh
            py = p[: (p.shape[0] // fy) * fy, : (p.shape[1] // fx) * fx]
            p = py.reshape(py.shape[0] // fy, fy, py.shape[1] // fx, fx).mean((1, 3))
        th, tw = mcus_y * sv * 8, mcus_x * sh * 8
        pad = np.zeros((th, tw))
        pad[: p.shape[0], : p.shape[1]] = p
        pad[p.shape[0] :, : p.shape[1]] = p[-1:, :]
        pad[:, p.shape[1] :] = pad[:, p.shape[1] - 1 : p.shape[1]]
        grid = np.zeros((th // 8, tw // 8, 64), dtype=np.int64)
        for by in range(th // 8):
            for bx in range(tw // 8):
                blk = pad[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                q = np.rint(M @ blk @ M.T).astype(np.int64)
                grid[by, bx] = q.reshape(-1)[ZZ]
        grids.append(grid)
    return grids, samp, mcus_x, mcus_y


class _ScanWriter:
    """Two-phase scan emitter: phase 'collect' inventories Huffman
    symbols, phase 'write' emits bits (with restart chunking)."""

    def __init__(self):
        self.phase = "collect"
        self.syms = set()
        self.codes = None
        self.wtr = None
        self.chunks = None
        self.rst_n = 0

    def start_write(self, codes):
        self.phase = "write"
        self.codes = codes
        self.wtr = _JpegBitWriter()
        self.chunks = []

    def sym(self, s):
        if self.phase == "collect":
            self.syms.add(s)
        else:
            L, code = self.codes[s]
            self.wtr.put(code, L)

    def bits(self, v, n):
        if self.phase == "write" and n:
            self.wtr.put(v, n)

    def bit_list(self, lst):
        for b in lst:
            self.bits(b, 1)

    def restart_marker(self):
        if self.phase == "write":
            self.wtr.flush()
            self.chunks.append(bytes(self.wtr.out))
            self.chunks.append(bytes([0xFF, 0xD0 + (self.rst_n % 8)]))
            self.rst_n += 1
            self.wtr = _JpegBitWriter()

    def finish(self):
        if self.phase == "write":
            self.wtr.flush()
            self.chunks.append(bytes(self.wtr.out))
            return b"".join(self.chunks)
        return None


def _cat(v):
    return abs(v).bit_length()


def _emit_signed(w, v, s):
    w.bits(v if v >= 0 else v + (1 << s) - 1, s)


def _scan_dc_first(w, grids, scan_idx, samp, mcus_x, mcus_y, al, restart):
    pred = [0] * len(scan_idx)
    for mcu in range(mcus_x * mcus_y):
        if restart and mcu and mcu % restart == 0:
            w.restart_marker()
            pred = [0] * len(scan_idx)
        my, mx = divmod(mcu, mcus_x)
        for pi, ci in enumerate(scan_idx):
            sh, sv = samp[ci]
            for by in range(sv):
                for bx in range(sh):
                    dc = int(grids[ci][my * sv + by, mx * sh + bx, 0]) >> al
                    diff = dc - pred[pi]
                    pred[pi] = dc
                    s = _cat(diff)
                    w.sym(s)
                    _emit_signed(w, diff, s)


def _scan_dc_refine(w, grids, scan_idx, samp, mcus_x, mcus_y, al, restart):
    for mcu in range(mcus_x * mcus_y):
        if restart and mcu and mcu % restart == 0:
            w.restart_marker()
        my, mx = divmod(mcu, mcus_x)
        for ci in scan_idx:
            sh, sv = samp[ci]
            for by in range(sv):
                for bx in range(sh):
                    w.bits((int(grids[ci][my * sv + by, mx * sh + bx, 0]) >> al) & 1, 1)


def _scan_ac_first(w, grid, dims, ss, se, al, restart):
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            w.sym(r << 4)
            w.bits(eobrun - (1 << r), r)
            eobrun = 0

    # NON-interleaved scans cover the component's OWN block grid
    # (ceil(comp dims / 8), T.81 A.2.2) — not the padded MCU grid
    bh, bw = dims
    for unit in range(bh * bw):
        if restart and unit and unit % restart == 0:
            flush_eob()
            w.restart_marker()
        by, bx = divmod(unit, bw)
        band = []
        for k in range(ss, se + 1):
            t = int(grid[by, bx, k])
            a = abs(t) >> al
            band.append(a if t >= 0 else -a)
        if not any(band):
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
            continue
        flush_eob()
        r = 0
        for v in band:
            if v == 0:
                r += 1
                continue
            while r > 15:
                w.sym(0xF0)
                r -= 16
            s = _cat(v)
            w.sym((r << 4) | s)
            _emit_signed(w, v, s)
            r = 0
        if r:
            eobrun += 1
    flush_eob()


def _scan_ac_refine(w, grid, dims, ss, se, al, restart):
    """Encoder half of T.81 G.1.2.3 (structure follows libjpeg's
    published encode_mcu_AC_refine: ZRLs fold into EOB runs past the
    last newly-nonzero index, correction bits buffer behind the next
    emitted symbol)."""
    eobrun = 0
    be_bits = []

    def flush_eob():
        nonlocal eobrun, be_bits
        if eobrun:
            r = eobrun.bit_length() - 1
            w.sym(r << 4)
            w.bits(eobrun - (1 << r), r)
            w.bit_list(be_bits)
            be_bits = []
            eobrun = 0

    bh, bw = dims
    for unit in range(bh * bw):
        if restart and unit and unit % restart == 0:
            flush_eob()
            w.restart_marker()
        by, bx = divmod(unit, bw)
        absv = {k: abs(int(grid[by, bx, k])) >> al for k in range(ss, se + 1)}
        eob = ss - 1
        for k in range(ss, se + 1):
            if absv[k] == 1:
                eob = k
        r = 0
        br_bits = []
        for k in range(ss, se + 1):
            t = absv[k]
            if t == 0:
                r += 1
                continue
            while r > 15 and k <= eob:
                flush_eob()
                w.sym(0xF0)
                r -= 16
                w.bit_list(br_bits)
                br_bits = []
            if t > 1:
                br_bits.append(t & 1)
                continue
            flush_eob()
            w.sym((r << 4) | 1)
            w.bits(1 if int(grid[by, bx, k]) >= 0 else 0, 1)
            w.bit_list(br_bits)
            br_bits = []
            r = 0
        if r or br_bits:
            eobrun += 1
            be_bits.extend(br_bits)
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def _jpeg_encode_progressive(img, sub=1, al=1, split=6, restart=0):
    """Minimal progressive (SOF2) encoder for tests: interleaved DC
    first scan at point transform ``al`` + DC refinement scans down to
    0, then per-component AC scans spectrally split at ``split`` with
    the same successive-approximation ladder — every scan type the
    decoder must handle, incl. EOB-run batching, ZRL-in-refinement,
    correction bits, and (DC/AC-first) restart markers. Fully
    refined, so the pixels must equal the baseline encoding's EXACTLY."""
    import struct

    grids, samp, mcus_x, mcus_y = _jpeg_coeff_grids(img, sub)
    h, w, _ = img.shape
    ncomp = len(grids)
    all_idx = list(range(ncomp))
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    ni_dims = []
    for sh, sv in samp:
        comp_h = -(-h * sv // vmax)
        comp_w = -(-w * sh // hmax)
        ni_dims.append((-(-comp_h // 8), -(-comp_w // 8)))

    # (kind, args, scan-header fields)
    scans = []
    scans.append(("dc_first", all_idx, 0, 0, 0, al, restart))
    for a in range(al - 1, -1, -1):
        scans.append(("dc_refine", all_idx, 0, 0, a + 1, a, restart))
    bands = [(1, split - 1), (split, 63)] if split > 1 else [(1, 63)]
    for ci in range(ncomp):
        for lo, hi in bands:
            scans.append(("ac_first", [ci], lo, hi, 0, al, restart))
    for a in range(al - 1, -1, -1):
        for ci in range(ncomp):
            for lo, hi in bands:
                scans.append(("ac_refine", [ci], lo, hi, a + 1, a, 0))

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, b"\x00" + bytes([1] * 64))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, 0])
    out += seg(0xC2, sof)

    def run(kind, w_, idx, lo, hi, a, rst):
        if kind == "dc_first":
            _scan_dc_first(w_, grids, idx, samp, mcus_x, mcus_y, a, rst)
        elif kind == "dc_refine":
            _scan_dc_refine(w_, grids, idx, samp, mcus_x, mcus_y, a, rst)
        elif kind == "ac_first":
            _scan_ac_first(w_, grids[idx[0]], ni_dims[idx[0]], lo, hi, a, rst)
        else:
            _scan_ac_refine(w_, grids[idx[0]], ni_dims[idx[0]], lo, hi, a, rst)

    def fixed_table(symbols):
        syms = sorted(symbols)
        L = max(1, (len(syms)).bit_length())
        counts = [0] * 16
        counts[L - 1] = len(syms)
        return counts, syms, {s: (L, c) for c, s in enumerate(syms)}

    last_dri = None
    for kind, idx, lo, hi, ah, a, rst in scans:
        # DRI persists across scans (T.81), so a scan without restart
        # markers needs an explicit DRI=0 — emit per-scan DRI updates
        if rst != last_dri:
            out += seg(0xDD, struct.pack(">H", rst))
            last_dri = rst
        w_ = _ScanWriter()
        run(kind, w_, idx, lo, hi, a, rst)  # phase 1: symbol inventory
        tc = 0 if kind.startswith("dc") else 1
        if w_.syms:
            counts, syms, codes = fixed_table(w_.syms)
            out += seg(0xC4, bytes([(tc << 4) | 0]) + bytes(counts) + bytes(syms))
            w_.start_write(codes)
        else:
            w_.start_write({})  # refinement scans can be all raw bits
        run(kind, w_, idx, lo, hi, a, rst)  # phase 2: entropy bits
        sos = bytes([len(idx)])
        for ci in idx:
            sos += bytes([ci + 1, 0x00])
        sos += bytes([lo, hi, (ah << 4) | a])
        out += seg(0xDA, sos)
        out += w_.finish()
    out += b"\xff\xd9"
    return bytes(out)


def test_jpeg_progressive_equals_baseline_444():
    """Fully-refined progressive decode must reproduce the baseline
    encoding's pixels EXACTLY (successive approximation is lossless
    once every bit is delivered) — any asymmetry in the EOB-run /
    correction-bit handling breaks this equality."""
    import numpy as np

    from dwh_with_dask_spark.operators.jpeg import decode_jpeg

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (24, 17, 3)).astype(np.uint8)
    base = decode_jpeg(_jpeg_encode_baseline(img))
    prog = decode_jpeg(_jpeg_encode_progressive(img, al=1, split=6))
    assert (prog == base).all()


def test_jpeg_progressive_420_restart_and_deep_ladder():
    """2x2 subsampling + restart markers in the DC/AC-first scans +
    a two-step successive-approximation ladder (Al=2 -> 1 -> 0)."""
    import numpy as np

    from dwh_with_dask_spark.operators.jpeg import decode_jpeg

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (33, 30, 3)).astype(np.uint8)
    base = decode_jpeg(_jpeg_encode_baseline(img, sub=2))
    prog = decode_jpeg(
        _jpeg_encode_progressive(img, sub=2, al=2, split=10, restart=2)
    )
    assert (prog == base).all()


def test_jpeg_progressive_grayscale_spectral_only():
    """Spectral selection WITHOUT successive approximation (Al=0, no
    refinement scans) on a single-component image."""
    import numpy as np

    from dwh_with_dask_spark.operators.jpeg import decode_jpeg

    x = np.linspace(0, 255, 20 * 19).reshape(20, 19)
    img = x[:, :, None].astype(np.uint8)
    base = decode_jpeg(_jpeg_encode_baseline(img))
    prog = decode_jpeg(_jpeg_encode_progressive(img, al=0, split=4))
    assert (prog == base).all()


def test_jpeg_progressive_fuzz_configs():
    """Randomized sweep over image sizes, subsampling, approximation
    depth, spectral splits, and restart intervals: fully-refined
    progressive must equal baseline EXACTLY in every configuration."""
    import numpy as np

    from dwh_with_dask_spark.operators.jpeg import decode_jpeg

    rng = np.random.RandomState(42)
    for trial in range(8):
        h = int(rng.randint(8, 41))
        w = int(rng.randint(8, 41))
        ch = 3 if trial % 4 else 1
        sub = 2 if (ch == 3 and trial % 2) else 1
        al = int(rng.randint(0, 3))
        split = int(rng.randint(2, 30))
        restart = int(rng.choice([0, 1, 3]))
        img = rng.randint(0, 256, (h, w, ch)).astype(np.uint8)
        base = decode_jpeg(_jpeg_encode_baseline(img, sub=sub))
        prog = decode_jpeg(
            _jpeg_encode_progressive(
                img, sub=sub, al=al, split=split, restart=restart
            )
        )
        assert (prog == base).all(), (
            f"trial {trial}: h={h} w={w} ch={ch} sub={sub} al={al} "
            f"split={split} restart={restart}"
        )


def test_image_features_on_progressive_jpeg(spark):
    """A progressive JPEG flows through the Spark multimodal pipeline
    as REAL decoded pixels (same features as its baseline twin), not
    the stub."""
    import numpy as np

    from dwh_with_dask_spark.operators.multimodal import image_features

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    rows = [
        ("a.jpg", "h1", bytearray(_jpeg_encode_baseline(img))),
        ("b.jpg", "h2", bytearray(_jpeg_encode_progressive(img, al=1))),
    ]
    df = spark.createDataFrame(
        rows, "path string, content_hash string, content binary"
    )
    got = {
        r.content_hash: (r.width, r.height, round(r.mean_luma, 6))
        for r in image_features(df).collect()
    }
    assert got["h1"][:2] == got["h2"][:2] == (16, 16)
    assert got["h1"][2] == got["h2"][2]  # identical pixels, identical luma
