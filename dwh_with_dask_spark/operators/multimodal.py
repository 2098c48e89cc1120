"""Multimodal (image/audio/video) column operators.

North-star addition (SURVEY.md §2B): media are opaque ``binary`` columns
plus a typed metadata struct; decode / feature-extract / resize /
frame-sample run as Arrow-batched Pandas UDFs over mapInPandas.

Decode status (the container forbids installing codec libraries — see
scripts/DECODER_ATTEMPTS.md): PNG and baseline JPEG images and WAV/PCM
audio decode FOR REAL via stdlib+numpy-only decoders (zlib chunk walk +
full scanline unfiltering; Huffman + dequant + IDCT in
``operators.jpeg``; ``wave`` + PCM scaling); PIL/soundfile are used
instead when importable; the rest (MP3, video codecs)
fall back to clearly-documented deterministic stubs. The Spark-side contract
(schemas, batch iteration, partition sizing, UDF signatures) is real
and tested throughout.

Scale notes: media rows are large and skew-prone. The operators assume
(a) binary payloads stay in their own column so column pruning skips
them unless needed, (b) repartitioning before decode targets
~N_CORES×2 tasks of bounded bytes (use maxRecordsPerBatch to cap Arrow
batch memory), (c) derived features are written to their own (narrow)
table keyed by content hash, never re-decoded in place.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dwh_with_dask_spark.operators.jpeg import decode_jpeg as _decode_jpeg_stdlib

MEDIA_META_SCHEMA = (
    "path string, media_type string, n_bytes long, content_hash string"
)

IMAGE_FEATURES_SCHEMA = (
    "content_hash string, width int, height int, n_channels int, "
    "mean_luma double, embedding array<float>"
)

AUDIO_FEATURES_SCHEMA = (
    "content_hash string, n_samples long, sample_rate int, duration_s double, "
    "rms double"
)


def media_table(binaries: DataFrame, media_type: str) -> DataFrame:
    """binaryFile scan rows → canonical media table:
    (path, media_type, n_bytes, content_hash, content).

    content_hash (sha256 of bytes) is the stable join key for derived
    features — dedup before decode is a groupBy on this 64-char key.
    """
    return binaries.select(
        F.col("path"),
        F.lit(media_type).alias("media_type"),
        F.col("length").alias("n_bytes"),
        F.sha2(F.col("content"), 256).alias("content_hash"),
        F.col("content"),
    )


try:  # optional: used when present (not installable in this container)
    from PIL import Image as _PIL_Image  # pragma: no cover
except Exception:
    _PIL_Image = None

try:  # optional
    import soundfile as _soundfile  # pragma: no cover
except Exception:
    _soundfile = None

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_JPEG_MAGIC = b"\xff\xd8"


def _decode_png_stdlib(data: bytes) -> np.ndarray:
    """REAL PNG decode with only the stdlib (zlib) + numpy: chunk walk,
    IDAT inflate, and full scanline unfiltering (filters 0-4 incl.
    Paeth). Supports the common web subset — 8-bit depth, grayscale /
    RGB / RGBA, non-interlaced — and raises ValueError on anything else
    so the caller can fall back. Round-trip tested against a filter-
    exercising encoder in tests/test_multimodal.py."""
    import struct
    import zlib

    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, idat = 8, b""
    w = h = ch = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            w, h, depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
            if depth != 8 or interlace != 0 or color_type not in (0, 2, 6):
                raise ValueError(
                    f"unsupported PNG (depth={depth} color={color_type} "
                    f"interlace={interlace})"
                )
            ch = {0: 1, 2: 3, 6: 4}[color_type]
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if w is None or not idat:
        raise ValueError("truncated PNG")
    raw = zlib.decompress(idat)
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline size mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    p = 0
    for y in range(h):
        f = raw[p]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=p + 1).copy()
        p += 1 + stride
        if f == 0:
            pass
        elif f == 2:  # Up — vectorized, uint8 addition wraps mod 256
            line += prev
        elif f == 1:  # Sub — sequential left dependency
            for i in range(ch, stride):
                line[i] = (int(line[i]) + int(line[i - ch])) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                left = int(line[i - ch]) if i >= ch else 0
                line[i] = (int(line[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = int(line[i - ch]) if i >= ch else 0
                b = int(prev[i])
                c = int(prev[i - ch]) if i >= ch else 0
                pt = a + b - c
                pa, pb, pc = abs(pt - a), abs(pt - b), abs(pt - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (int(line[i]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = line
        prev = line
    return out.reshape(h, w, ch)


def encode_png(img: np.ndarray) -> bytes:
    """Minimal REAL PNG encoder (stdlib zlib): 8-bit gray/RGB/RGBA,
    filter type 0 per row. The write twin of ``_decode_png_stdlib`` —
    lets queries and tests synthesize genuine PNG payloads so the
    perceptual-hash path (operators/imagehash.py) exercises the real
    decoder, not the stub."""
    import struct
    import zlib

    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color_type = {1: 0, 3: 2, 4: 6}[ch]

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    raw = bytearray()
    body = img.astype(np.uint8)
    for y in range(h):
        raw.append(0)
        raw.extend(body[y].tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Minimal REAL WAV encoder (stdlib ``wave``): mono 16-bit PCM from
    float samples in [-1, 1]. The write twin of ``_decode_wav_stdlib`` —
    lets queries and tests synthesize genuine WAV payloads so the audio
    fingerprint path (operators/audiofp.py) exercises the real decoder.
    Note int16 quantization is lossy: see audiofp's gain-invariance
    caveat."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(rate)
        pcm = (np.clip(samples, -1, 1) * 32767).astype("<i2")
        wv.writeframes(pcm.tobytes())
    return buf.getvalue()


def _decode_wav_stdlib(data: bytes) -> tuple[np.ndarray, int]:
    """REAL WAV/PCM decode with only the stdlib ``wave`` module + numpy:
    8/16/32-bit PCM, any channel count (downmixed to mono by mean),
    float32 samples in [-1, 1]."""
    import io
    import wave

    with wave.open(io.BytesIO(data), "rb") as wv:
        sr = wv.getframerate()
        n_ch = wv.getnchannels()
        width = wv.getsampwidth()
        raw = wv.readframes(wv.getnframes())
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 1:  # WAV 8-bit is unsigned
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / float(2**31)
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(axis=1).astype(np.float32)
    return x, sr


def _decode_image_stub(content: bytes) -> np.ndarray:
    """STUB fallback for non-image bytes (full decoder libs absent; see
    scripts/DECODER_ATTEMPTS.md). Deterministic fake: a 4x4 gray image
    whose intensity derives from the byte length, so tests get stable,
    content-dependent output with the real array contract."""
    level = len(content) % 256
    return np.full((4, 4, 3), level, dtype=np.uint8)


def _decode_audio_stub(content: bytes) -> tuple[np.ndarray, int]:
    """STUB fallback for non-audio bytes. Deterministic fake: 1600
    samples of a byte-length-seeded ramp at 16 kHz."""
    n = 1600
    x = np.linspace(0.0, (len(content) % 97) / 97.0, n, dtype=np.float32)
    return x, 16_000


def _decode_image(content: bytes) -> np.ndarray:
    """Image decode dispatch: PIL when available → REAL stdlib PNG /
    baseline-JPEG decoders by magic bytes → documented stub for anything
    else. The two dominant web formats therefore decode FOR REAL even in
    this sealed container."""
    if _PIL_Image is not None:  # pragma: no cover - lib absent here
        import io

        try:
            return np.asarray(_PIL_Image.open(io.BytesIO(content)).convert("RGB"))
        except Exception:
            pass
    if content[:8] == _PNG_MAGIC:
        try:
            return _decode_png_stdlib(content)
        except ValueError:
            # Valid-but-unsupported PNG (palette, 16-bit, interlaced):
            # fall through to the stub instead of failing the whole
            # Spark task from inside the mapInPandas UDF.
            pass
    if content[:2] == _JPEG_MAGIC:
        try:
            return _decode_jpeg_stdlib(content)
        except ValueError:
            # Outside the supported subset (hierarchical, arithmetic,
            # 12-bit): stub fallback, same contract as PNG above.
            pass
    return _decode_image_stub(content)


def _decode_audio(content: bytes) -> tuple[np.ndarray, int]:
    """Audio decode dispatch: soundfile when available → REAL stdlib
    WAV decoder for RIFF/WAVE payloads → documented stub otherwise."""
    if _soundfile is not None:  # pragma: no cover - lib absent here
        import io

        try:
            x, sr = _soundfile.read(io.BytesIO(content), dtype="float32")
            if x.ndim > 1:
                x = x.mean(axis=1).astype(np.float32)
            return x, int(sr)
        except Exception:
            pass
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        return _decode_wav_stdlib(content)
    return _decode_audio_stub(content)


def image_features(media: DataFrame, batch_rows: int = 64) -> DataFrame:
    """Decode + feature-extract images via mapInPandas.

    Output one narrow row per content_hash (width/height/channels,
    mean luma, a placeholder embedding). The UDF iterates Arrow batches —
    per-batch memory is bounded by batch_rows × payload size.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content_hash, content in zip(pdf["content_hash"], pdf["content"]):
                img = _decode_image(bytes(content))
                h, w, c = img.shape
                luma = float(img.mean())
                emb = (img.astype(np.float32).mean(axis=(0, 1)) / 255.0).tolist()
                rows.append(
                    {
                        "content_hash": content_hash,
                        "width": w,
                        "height": h,
                        "n_channels": c,
                        "mean_luma": luma,
                        "embedding": emb,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "content_hash",
                    "width",
                    "height",
                    "n_channels",
                    "mean_luma",
                    "embedding",
                ],
            )

    deduped = media.dropDuplicates(["content_hash"]).select("content_hash", "content")
    return deduped.mapInPandas(extract, schema=IMAGE_FEATURES_SCHEMA)


RESIZED_SCHEMA = (
    "content_hash string, width int, height int, n_channels int, pixels binary"
)


def _resize_nn(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resample — REAL resize logic in pure numpy (only
    the upstream decode is stubbed): each output pixel takes the source
    pixel at floor(i * src / dst), the standard NN index map."""
    h, w = img.shape[:2]
    ri = np.arange(out_h) * h // out_h
    ci = np.arange(out_w) * w // out_w
    return img[ri][:, ci]


def image_resize(
    media: DataFrame, width: int = 8, height: int = 8, batch_rows: int = 64
) -> DataFrame:
    """Decode → resize → re-emit raw pixels, via mapInPandas.

    The standard thumbnail/normalize step before vision-model feature
    extraction. Same distributed contract as image_features: dedup on
    content_hash upstream, bounded Arrow batches, output keyed by hash;
    ``pixels`` is the row-major uint8 buffer (height x width x channels
    — the array contract a downstream vision UDF consumes).
    """

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content_hash, content in zip(pdf["content_hash"], pdf["content"]):
                img = _decode_image(bytes(content))
                out = _resize_nn(img, height, width)
                rows.append(
                    {
                        "content_hash": content_hash,
                        "width": int(out.shape[1]),
                        "height": int(out.shape[0]),
                        "n_channels": int(out.shape[2]),
                        "pixels": out.tobytes(),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["content_hash", "width", "height", "n_channels", "pixels"],
            )

    deduped = media.dropDuplicates(["content_hash"]).select("content_hash", "content")
    return deduped.mapInPandas(resize, schema=RESIZED_SCHEMA)


def audio_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract audio via mapInPandas (stubbed decode)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content_hash, content in zip(pdf["content_hash"], pdf["content"]):
                samples, sr = _decode_audio(bytes(content))
                rows.append(
                    {
                        "content_hash": content_hash,
                        "n_samples": len(samples),
                        "sample_rate": sr,
                        "duration_s": len(samples) / sr,
                        "rms": float(np.sqrt(np.mean(samples**2))),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "content_hash",
                    "n_samples",
                    "sample_rate",
                    "duration_s",
                    "rms",
                ],
            )

    deduped = media.dropDuplicates(["content_hash"]).select("content_hash", "content")
    return deduped.mapInPandas(extract, schema=AUDIO_FEATURES_SCHEMA)


RESAMPLED_AUDIO_SCHEMA = (
    "content_hash string, sample_rate int, n_samples int, samples binary"
)


def _resample_linear(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Linear-interpolation resample — REAL DSP logic in pure numpy
    (only the upstream decode is stubbed): output sample i sits at
    source position i * sr_in / sr_out and interpolates its two
    neighbors. The standard cheap resampler (a production pipeline
    would swap in a polyphase filter; the operator contract — bounded
    Arrow batches in, hash-keyed float32 buffer out — is identical)."""
    n_out = int(round(len(x) * sr_out / sr_in))
    pos = np.arange(n_out, dtype=np.float64) * sr_in / sr_out
    i0 = np.minimum(pos.astype(np.int64), len(x) - 1)
    i1 = np.minimum(i0 + 1, len(x) - 1)
    frac = (pos - i0).astype(np.float32)
    return (x[i0] * (1.0 - frac) + x[i1] * frac).astype(np.float32)


def audio_resample(media: DataFrame, target_rate: int = 8_000) -> DataFrame:
    """Decode → resample to ``target_rate`` → re-emit raw float32 PCM,
    via mapInPandas. The normalize-sample-rate step before any audio
    model; same distributed contract as the other kernels (dedup on
    content_hash upstream, narrow hash-keyed output)."""

    def resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content_hash, content in zip(pdf["content_hash"], pdf["content"]):
                samples, sr = _decode_audio(bytes(content))
                out = _resample_linear(samples, sr, target_rate)
                rows.append(
                    {
                        "content_hash": content_hash,
                        "sample_rate": target_rate,
                        "n_samples": len(out),
                        "samples": out.tobytes(),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["content_hash", "sample_rate", "n_samples", "samples"],
            )

    deduped = media.dropDuplicates(["content_hash"]).select("content_hash", "content")
    return deduped.mapInPandas(resample, schema=RESAMPLED_AUDIO_SCHEMA)


VIDEO_FRAMES_SCHEMA = (
    "content_hash string, frame_no int, ts_s double, frame_bytes binary"
)


def _decode_video_stub(content: bytes) -> tuple[int, float]:
    """STUB — real impl: av/ffmpeg demux on executors. Deterministic
    fake: (n_frames, fps) derived from byte length, so tests get stable
    content-dependent output with the real contract."""
    n_frames = 30 + (len(content) % 271)
    return n_frames, 30.0


def frame_sample(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Sample every ``every_n``-th video frame via mapInPandas (UDTF
    shape: each input row yields multiple frame rows).

    Output (content_hash, frame_no, ts_s, frame_bytes) — frames keyed by
    the video's content hash, written to their own narrow-ish table and
    never stored back on the media row. The decode kernel is the
    documented deterministic stub (no video codec in this runtime:
    frame payloads are sha256(content ‖ frame_no) bytes); the
    distributed shape — dedup before decode, Arrow batch iteration,
    bounded per-batch memory, one-to-many row expansion — is real.
    """
    import hashlib

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["content_hash", "frame_no", "ts_s", "frame_bytes"]
        for pdf in batches:
            rows = []
            for content_hash, content in zip(pdf["content_hash"], pdf["content"]):
                b = bytes(content)
                n_frames, fps = _decode_video_stub(b)
                for fno in range(0, n_frames, every_n):
                    rows.append(
                        {
                            "content_hash": content_hash,
                            "frame_no": fno,
                            "ts_s": fno / fps,
                            "frame_bytes": hashlib.sha256(
                                b + fno.to_bytes(4, "big")
                            ).digest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    deduped = media.dropDuplicates(["content_hash"]).select("content_hash", "content")
    return deduped.mapInPandas(extract, schema=VIDEO_FRAMES_SCHEMA)
