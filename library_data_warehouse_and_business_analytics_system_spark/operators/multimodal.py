"""Multimodal (image/audio/video) column operators.

Media are opaque ``binary`` payload columns with a typed metadata
struct alongside — the layout a 100 TB training-data lake uses
(payloads in parquet binary columns or object-store refs; all pruning
and shuffling happens on the small typed columns, never the bytes).

Two decode tiers: ``mode="fake"`` derives deterministic
pseudo-metadata/features from the payload's md5 (reproducible in SQL,
so the Spark-side plumbing — schemas, Arrow batch iteration, UDF
signatures, partition preservation — is oracle-checkable end-to-end
on the driver's documents table); ``mode="real"`` actually decodes
pixels — through PIL when importable, else the pure-stdlib PNG
decoder in functions/png_codec.py (this container has no
PIL/cv2/torchaudio). Audio ``mode="real"`` parses PCM WAV with the
stdlib ``wave`` codec. Video ``mode="real"`` parses uncompressed
YUV4MPEG2 (Y4M) streams with the ~40-line parser below (known-signal
round-trip in tests/test_multimodal.py); compressed audio/video would
slot in behind the same mapInPandas signatures via torchaudio/cv2
when available.

All per-row Python work runs in ``mapInPandas`` (Arrow-batched, one
Python worker per partition); nothing here shuffles, so throughput
scales with executors × cores on payload-sized rows.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BinaryType, DoubleType, FloatType,
                               IntegerType, LongType, StringType, StructField,
                               StructType)

#: Typed metadata carried next to every payload.
MEDIA_META_SCHEMA = StructType([
    StructField("kind", StringType()),        # image | audio | video
    StructField("format", StringType()),      # e.g. png, wav, mp4
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_channels", IntegerType()),
    StructField("sample_rate", IntegerType()),
    StructField("duration_ms", LongType()),
])

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("data", BinaryType()),
    StructField("meta", MEDIA_META_SCHEMA),
])

DECODED_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_channels", IntegerType()),
    StructField("mean_pixel", DoubleType()),
])


def _real_image_decoder() -> Callable:
    """payload → (width, height, n_channels, mean_pixel).

    Prefers PIL (any format, C-speed) when importable; otherwise the
    pure-stdlib PNG decoder (functions/png_codec.py) so ``mode="real"``
    works in codec-free containers too. Both produce the same
    statistic: mean over all decoded channel samples in [0, 1]
    (palette images expanded to RGB first)."""
    try:
        import io

        import numpy as _np
        from PIL import Image

        def decode(payload: bytes) -> tuple[int, int, int, float]:
            img = Image.open(io.BytesIO(bytes(payload)))
            if img.mode == "P":
                img = img.convert("RGB")
            arr = _np.asarray(img)
            n_ch = 1 if arr.ndim == 2 else arr.shape[2]
            return img.width, img.height, n_ch, float(arr.mean() / 255.0)

        return decode
    except ImportError:
        from ..functions.png_codec import decode_png
        return decode_png


def fake_decode(payload: bytes) -> tuple[int, int, int, float]:
    """Deterministic pseudo-decode from the payload's md5 — the SQL
    oracle reproduces this with substr/hex-cast over md5(text)."""
    h = hashlib.md5(payload).hexdigest()
    width = 16 + int(h[0:4], 16) % 497
    height = 16 + int(h[4:8], 16) % 497
    n_channels = 1 + int(h[8], 16) % 3
    mean_pixel = int(h[9:13], 16) / 65535.0
    return width, height, n_channels, mean_pixel


def decode_images(df: DataFrame, payload_col: str = "data",
                  id_col: str = "media_id", mode: str = "fake") -> DataFrame:
    """Payload → (dims, channels, mean pixel) via mapInPandas.

    Batch contract: the function receives an iterator of Arrow-sized
    pandas batches (spark.sql.execution.arrow.maxRecordsPerBatch) per
    partition and must stream, never materialize the partition.
    """
    if mode == "real":
        decode = _real_image_decoder()
    elif mode == "fake":
        decode = fake_decode
    else:
        raise ValueError(f"decode_images: unknown mode {mode!r}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [decode(bytes(p)) for p in pdf[payload_col]]
            out = pd.DataFrame(decoded,
                               columns=["width", "height", "n_channels",
                                        "mean_pixel"])
            out.insert(0, "media_id", pdf[id_col].values)
            yield out

    return df.mapInPandas(batches, DECODED_SCHEMA)


FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("embedding", ArrayType(FloatType())),
])


def extract_features(df: DataFrame, dim: int = 64,
                     payload_col: str = "data",
                     id_col: str = "media_id") -> DataFrame:
    """Deterministic fake feature vector per payload (seeded by the
    payload digest). Stands in for a vision/audio encoder; downstream
    ANN/dedup operators (operators/similarity.py, operators/dedup.py)
    consume its ``array<float>`` exactly as they would a real one."""
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            vecs = []
            for p in pdf[payload_col]:
                seed = int.from_bytes(hashlib.md5(bytes(p)).digest()[:8],
                                      "big")
                rng = np.random.default_rng(seed)
                v = rng.standard_normal(dim).astype(np.float32)
                vecs.append((v / np.linalg.norm(v)).tolist())
            yield pd.DataFrame({"media_id": pdf[id_col].values,
                                "embedding": vecs})

    return df.mapInPandas(batches, FEATURES_SCHEMA)


def resize_meta(df: DataFrame, target_w: int, target_h: int,
                meta_col: str = "meta") -> DataFrame:
    """Aspect-preserving resize planning — pure column math on the
    typed metadata (scale factor, output dims, letterbox padding).
    The pixel-level resample belongs in the decode stub; everything a
    planner needs (and everything shuffled at scale) is the metadata."""
    m = F.col(meta_col)
    scale = F.least(F.lit(target_w) / m.width, F.lit(target_h) / m.height)
    out_w = F.floor(m.width * scale).cast("int")
    out_h = F.floor(m.height * scale).cast("int")
    return df.withColumn("resize_plan", F.struct(
        scale.alias("scale"),
        out_w.alias("out_width"),
        out_h.alias("out_height"),
        ((F.lit(target_w) - out_w) / 2).cast("int").alias("pad_x"),
        ((F.lit(target_h) - out_h) / 2).cast("int").alias("pad_y"),
    ))


def sample_frames(df: DataFrame, every_ms: int = 1000,
                  meta_col: str = "meta",
                  id_col: str = "media_id") -> DataFrame:
    """Video → one row per sampled frame timestamp (0, every_ms, …,
    ≤ duration). Pure JVM explode — the frame *reference* (payload
    offset) is computed without touching bytes; actual frame decode is
    the stubbed mapInPandas step. At scale the explode multiplies rows
    before any Python boundary, so the expensive decode runs once per
    sampled frame, embarrassingly parallel."""
    m = F.col(meta_col)
    return (
        df.filter(m.kind == "video")
        .select(
            id_col, meta_col,
            F.explode(F.sequence(F.lit(0).cast("long"), m.duration_ms,
                                 F.lit(every_ms).cast("long"))).alias("frame_ts_ms"))
        .withColumn("frame_idx",
                    (F.col("frame_ts_ms") / every_ms).cast("int"))
        .select(id_col, "frame_idx", "frame_ts_ms")
    )


def documents_as_media(df: DataFrame) -> DataFrame:
    """Adapter: the driver's ``documents`` table as a media corpus
    (utf-8 payloads + synthesized typed metadata). Lets every operator
    above run on real testdata without codec libraries."""
    payload = F.encode("text", "utf-8")
    return df.select(
        F.col("doc_id").alias("media_id"),
        payload.alias("data"),
        F.struct(
            F.when(F.col("doc_id") % 3 == 0, "video")
            .when(F.col("doc_id") % 3 == 1, "image")
            .otherwise("audio").alias("kind"),
            F.lit("raw").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("n_channels"),
            F.lit(16000).alias("sample_rate"),
            (F.col("n_chars").cast("long") * 10).alias("duration_ms"),
        ).alias("meta"),
    )


AUDIO_DECODED_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("sample_rate", IntegerType()),
    StructField("n_channels", IntegerType()),
    StructField("bit_depth", IntegerType()),
    StructField("n_frames", LongType()),
    StructField("duration_ms", LongType()),
    StructField("rms", DoubleType()),
])


def _decode_wav(payload: bytes) -> tuple[int, int, int, int, int, float]:
    """PCM WAV (RIFF) → (sample_rate, n_channels, bit_depth, n_frames,
    duration_ms, rms) via the stdlib ``wave`` module — no codec libs
    needed. RMS is over all samples, normalized to [0, 1] by the bit
    depth's full scale (8-bit WAV is unsigned, wider depths signed)."""
    import array
    import io
    import math
    import wave

    with wave.open(io.BytesIO(bytes(payload))) as w:
        rate = w.getframerate()
        n_ch = w.getnchannels()
        width = w.getsampwidth()
        n_frames = w.getnframes()
        raw = w.readframes(n_frames)
    if width == 1:
        samples = [b - 128 for b in raw]          # unsigned 8-bit
        full = 128.0
    elif width == 2:
        samples = array.array("h", raw)           # signed 16-bit LE
        full = 32768.0
    elif width == 4:
        samples = array.array("i", raw)           # signed 32-bit LE
        full = 2147483648.0
    else:
        raise ValueError(f"unsupported PCM sample width: {width}")
    if samples:
        rms = math.sqrt(sum(s * s for s in samples) / len(samples)) / full
    else:
        rms = 0.0
    return (rate, n_ch, 8 * width, n_frames,
            int(n_frames * 1000 / rate) if rate else 0, rms)


def fake_decode_audio(payload: bytes) -> tuple[int, int, int, int, int, float]:
    """Deterministic pseudo-decode from the payload's md5 (the same
    oracle-reproducible contract as :func:`fake_decode`)."""
    h = hashlib.md5(payload).hexdigest()
    rate = (8000, 16000, 22050, 44100)[int(h[0], 16) % 4]
    n_ch = 1 + int(h[1], 16) % 2
    depth = (8, 16, 32)[int(h[2], 16) % 3]
    n_frames = 1000 + int(h[3:8], 16) % 100_000
    rms = int(h[8:12], 16) / 65535.0
    return rate, n_ch, depth, n_frames, int(n_frames * 1000 / rate), rms


def decode_audio(df: DataFrame, payload_col: str = "data",
                 id_col: str = "media_id", mode: str = "fake") -> DataFrame:
    """Audio payload → typed stats via the same streaming mapInPandas
    contract as :func:`decode_images`. ``mode="real"`` parses PCM WAV
    with the stdlib codec (works in codec-free containers); compressed
    formats would slot in behind the same signature via torchaudio /
    soundfile when available."""
    if mode == "real":
        decode = _decode_wav
    elif mode == "fake":
        decode = fake_decode_audio
    else:
        raise ValueError(f"decode_audio: unknown mode {mode!r}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [decode(bytes(p)) for p in pdf[payload_col]]
            out = pd.DataFrame(decoded,
                               columns=["sample_rate", "n_channels",
                                        "bit_depth", "n_frames",
                                        "duration_ms", "rms"])
            out.insert(0, "media_id", pdf[id_col].values)
            yield out

    return df.mapInPandas(batches, AUDIO_DECODED_SCHEMA)


VIDEO_DECODED_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_frames", LongType()),
    StructField("fps", DoubleType()),
    StructField("duration_ms", LongType()),
    StructField("mean_luma", DoubleType()),
])

#: bytes per frame as a multiple of (width*height), by Y4M colorspace
_Y4M_PLANE_RATIO = {"420": 1.5, "420jpeg": 1.5, "420paldv": 1.5,
                    "420mpeg2": 1.5, "422": 2.0, "444": 3.0, "mono": 1.0}


def _decode_y4m(payload: bytes) -> tuple[int, int, int, float, int, float]:
    """Uncompressed YUV4MPEG2 → (width, height, n_frames, fps,
    duration_ms, mean_luma). mean_luma averages the Y plane over all
    frames, normalized to [0, 1] — the video twin of the PNG
    mean_pixel / WAV rms statistic.

    The format (header line ``YUV4MPEG2 W.. H.. F<num>:<den> [C..]``,
    then per frame a ``FRAME...\\n`` marker + raw planar YUV) is fully
    specified by the mjpegtools public docs; the test generates
    streams by hand and round-trips known signals — the same
    no-external-codec strategy as functions/png_codec.py."""
    data = bytes(payload)
    nl = data.index(b"\n")
    header = data[:nl].decode("ascii", errors="strict")
    fields = header.split(" ")
    if fields[0] != "YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    num, den, cs = 25, 1, "420"
    for f in fields[1:]:
        if not f:
            continue
        tag, val = f[0], f[1:]
        if tag == "W":
            w = int(val)
        elif tag == "H":
            h = int(val)
        elif tag == "F":
            num, den = (int(x) for x in val.split(":"))
        elif tag == "C":
            cs = val
    if w is None or h is None:
        raise ValueError("Y4M header missing W/H")
    if cs not in _Y4M_PLANE_RATIO:
        raise ValueError(f"unsupported Y4M colorspace: {cs}")
    frame_bytes = int(w * h * _Y4M_PLANE_RATIO[cs])
    luma_bytes = w * h

    pos, n_frames, luma_sum = nl + 1, 0, 0
    while pos < len(data):
        fnl = data.index(b"\n", pos)
        if not data[pos:fnl].startswith(b"FRAME"):
            raise ValueError("corrupt Y4M: FRAME marker missing")
        pos = fnl + 1
        frame = data[pos:pos + frame_bytes]
        if len(frame) != frame_bytes:
            raise ValueError("corrupt Y4M: truncated frame")
        luma_sum += sum(frame[:luma_bytes])
        pos += frame_bytes
        n_frames += 1

    fps = num / den
    duration_ms = int(n_frames * 1000 * den // num) if num else 0
    mean_luma = (luma_sum / (n_frames * luma_bytes) / 255.0) \
        if n_frames else 0.0
    return w, h, n_frames, fps, duration_ms, mean_luma


def fake_decode_video(payload: bytes) -> tuple[int, int, int, float, int,
                                               float]:
    """Deterministic pseudo-decode from the payload's md5 (the same
    oracle-reproducible contract as :func:`fake_decode`)."""
    h = hashlib.md5(payload).hexdigest()
    width = 16 + int(h[0:4], 16) % 497
    height = 16 + int(h[4:8], 16) % 497
    n_frames = 1 + int(h[8:12], 16) % 300
    fps = float((10, 24, 25, 30)[int(h[12], 16) % 4])
    duration_ms = n_frames * 1000 // int(fps)
    mean_luma = int(h[13:17], 16) / 65535.0
    return width, height, n_frames, fps, duration_ms, mean_luma


def decode_video(df: DataFrame, payload_col: str = "data",
                 id_col: str = "media_id", mode: str = "fake") -> DataFrame:
    """Video payload → typed stats via the same streaming mapInPandas
    contract as :func:`decode_images` / :func:`decode_audio`.
    ``mode="real"`` parses uncompressed Y4M with the stdlib-only
    parser above; compressed formats would slot in behind the same
    signature via cv2/pyav when available."""
    if mode == "real":
        decode = _decode_y4m
    elif mode == "fake":
        decode = fake_decode_video
    else:
        raise ValueError(f"decode_video: unknown mode {mode!r}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [decode(bytes(p)) for p in pdf[payload_col]]
            out = pd.DataFrame(decoded,
                               columns=["width", "height", "n_frames",
                                        "fps", "duration_ms", "mean_luma"])
            out.insert(0, "media_id", pdf[id_col].values)
            yield out

    return df.mapInPandas(batches, VIDEO_DECODED_SCHEMA)
