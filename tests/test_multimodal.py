"""Multimodal operator tests: mapInPandas plumbing (schema, Arrow batch
shape, partition preservation), deterministic fake decode, frame
sampling, feature extraction feeding the ANN operators."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from library_data_warehouse_and_business_analytics_system_spark.operators import multimodal as MM
from library_data_warehouse_and_business_analytics_system_spark.operators.similarity import brute_force_topk
from library_data_warehouse_and_business_analytics_system_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return MM.documents_as_media(
        load_table(spark, sf_dir, "documents")).cache()


def test_media_schema(media):
    assert [f.name for f in media.schema] == ["media_id", "data", "meta"]
    assert media.schema["data"].dataType.typeName() == "binary"
    meta = media.schema["meta"].dataType
    assert [f.name for f in meta.fields] == [
        "kind", "format", "width", "height", "n_channels",
        "sample_rate", "duration_ms"]


def test_decode_matches_reference_impl(spark, media):
    rows = MM.decode_images(media).orderBy("media_id").limit(5).collect()
    payloads = {r["media_id"]: bytes(r["data"])
                for r in media.orderBy("media_id").limit(5).collect()}
    for r in rows:
        w, h, c, mp = MM.fake_decode(payloads[r["media_id"]])
        assert (r["width"], r["height"], r["n_channels"]) == (w, h, c)
        assert r["mean_pixel"] == mp
        assert 16 <= w <= 512 and 1 <= c <= 3 and 0.0 <= mp <= 1.0


def test_decode_preserves_partitioning_and_rows(media):
    src = media.repartition(7)
    out = MM.decode_images(src)
    # mapInPandas is a narrow transformation: no shuffle, same
    # partitioning — at 100 TB this is what keeps decode embarrassingly
    # parallel.
    assert out.rdd.getNumPartitions() == 7
    assert out.count() == media.count()
    # no Exchange beyond the input's own repartition: decode over the
    # cached input plans shuffle-free.
    cached_plan = MM.decode_images(media) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in cached_plan


def test_decode_streams_arrow_batches(spark, media):
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "32")
    try:
        n = media.count()
        out = MM.decode_images(media.coalesce(1))
        # one partition, forced 32-row Arrow batches: the iterator
        # contract must still produce every row exactly once.
        assert out.count() == n
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")


def test_real_mode_rejects_non_png_payloads(media):
    """Raw-text payloads are not decodable images: the real tier must
    fail loudly (inside the Python worker), never emit fake stats."""
    with pytest.raises(Exception, match="not a PNG"):
        MM.decode_images(media.limit(3), mode="real").collect()


def test_unknown_mode_rejected(media):
    with pytest.raises(ValueError, match="unknown mode"):
        MM.decode_images(media, mode="bogus")


def test_extract_features_deterministic_and_normalized(spark, media):
    f1 = MM.extract_features(media.limit(20), dim=16).collect()
    f2 = MM.extract_features(media.limit(20), dim=16).collect()
    assert {r["media_id"]: r["embedding"] for r in f1} \
        == {r["media_id"]: r["embedding"] for r in f2}
    for r in f1:
        assert len(r["embedding"]) == 16
        assert abs(float(np.linalg.norm(r["embedding"])) - 1.0) < 1e-5


def test_features_feed_ann(spark, media):
    feats = MM.extract_features(media.limit(50), dim=16)
    queries = feats.filter(F.col("media_id") < 3)
    topk = brute_force_topk(feats, queries, "embedding", "media_id", k=5)
    got = topk.groupBy("query_id").count().collect()
    assert all(r["count"] == 5 for r in got) and len(got) > 0


def test_resize_plan(spark, media):
    with_dims = media.withColumn(
        "meta", F.col("meta").withField("width", F.lit(640))
        .withField("height", F.lit(480)))
    plan = MM.resize_meta(with_dims, 224, 224).select("resize_plan").first()[0]
    assert plan["out_width"] == 224 and plan["out_height"] == 168
    assert plan["pad_x"] == 0 and plan["pad_y"] == 28


def test_sample_frames_counts(media):
    frames = MM.sample_frames(media, every_ms=1000)
    per = frames.groupBy("media_id").count()
    meta = media.filter(F.col("meta.kind") == "video") \
        .select("media_id", F.col("meta.duration_ms").alias("d"))
    joined = per.join(meta, "media_id")
    bad = joined.filter(
        F.col("count") != (F.col("d") / 1000).cast("long") + 1).count()
    assert bad == 0
    assert per.count() == meta.count()


def test_fake_decode_unit():
    payload = b"hello world"
    h = hashlib.md5(payload).hexdigest()
    w, hh, c, mp = MM.fake_decode(payload)
    assert w == 16 + int(h[0:4], 16) % 497
    assert hh == 16 + int(h[4:8], 16) % 497
    assert c == 1 + int(h[8], 16) % 3
    assert mp == int(h[9:13], 16) / 65535.0


# ---------------------------------------------------------------------------
# Real PNG decode (functions/png_codec.py): differential against an
# independent encoder written here from the PNG spec — forward
# filtering in the test, inverse filtering in the decoder, so a bug in
# either side breaks the round-trip.


import struct
import zlib

from library_data_warehouse_and_business_analytics_system_spark.functions import png_codec


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload)))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)


def _encode_png(arr: np.ndarray, color_type: int, filters=None,
                palette: bytes | None = None) -> bytes:
    """Independent PNG writer: HxW (gray/palette) or HxWxC uint8 array,
    one filter type per scanline (default all 0)."""
    h = arr.shape[0]
    w = arr.shape[1]
    flat = arr.reshape(h, -1).astype(np.uint8)
    nch = flat.shape[1] // w
    filters = filters or [0] * h
    raw = bytearray()
    prev = np.zeros(flat.shape[1], dtype=np.int16)
    for r in range(h):
        line = flat[r].astype(np.int16)
        f = filters[r]
        out = np.empty_like(line)
        for i in range(len(line)):
            a = int(line[i - nch]) if i >= nch else 0
            b = int(prev[i])
            c = int(prev[i - nch]) if i >= nch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                pred = _paeth(a, b, c)
            out[i] = (int(line[i]) - pred) & 0xFF
        raw.append(f)
        raw += bytes(out.astype(np.uint8))
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    png = png_codec.PNG_MAGIC + _chunk(b"IHDR", ihdr)
    if palette is not None:
        png += _chunk(b"PLTE", palette)
    png += _chunk(b"IDAT", zlib.compress(bytes(raw)))
    png += _chunk(b"IEND", b"")
    return png


@pytest.mark.parametrize("filters", [[0, 0, 0, 0], [1, 2, 3, 4]])
def test_png_decode_rgb_all_filters(filters):
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(4, 5, 3), dtype=np.uint8)
    w, h, nch, mean = png_codec.decode_png(
        _encode_png(arr, color_type=2, filters=filters))
    assert (w, h, nch) == (5, 4, 3)
    assert mean == pytest.approx(arr.mean() / 255.0, abs=1e-12)


def test_png_decode_grayscale_and_rgba():
    rng = np.random.default_rng(11)
    gray = rng.integers(0, 256, size=(3, 7), dtype=np.uint8)
    w, h, nch, mean = png_codec.decode_png(
        _encode_png(gray, color_type=0, filters=[2, 4, 1]))
    assert (w, h, nch) == (7, 3, 1)
    assert mean == pytest.approx(gray.mean() / 255.0, abs=1e-12)
    rgba = rng.integers(0, 256, size=(2, 3, 4), dtype=np.uint8)
    w, h, nch, mean = png_codec.decode_png(_encode_png(rgba, color_type=6))
    assert (w, h, nch) == (3, 2, 4)
    assert mean == pytest.approx(rgba.mean() / 255.0, abs=1e-12)


def test_png_decode_palette_expands_to_rgb():
    palette = bytes([255, 0, 0,  0, 255, 0,  0, 0, 255])  # R, G, B
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    w, h, nch, mean = png_codec.decode_png(
        _encode_png(idx, color_type=3, palette=palette))
    assert (w, h, nch) == (2, 2, 3)
    # 4 pixels, each one pure channel: mean = 255*4/(12*255)
    assert mean == pytest.approx(4 / 12, abs=1e-12)


def test_png_decode_rejects_unsupported():
    arr = np.zeros((2, 2), dtype=np.uint8)
    png16 = bytearray(_encode_png(arr, color_type=0))
    png16[24] = 16  # bit depth byte inside IHDR
    with pytest.raises(ValueError, match="bit depth"):
        png_codec.decode_png(bytes(png16))
    with pytest.raises(ValueError, match="signature"):
        png_codec.decode_png(b"GIF89a...")


def test_real_decode_end_to_end(spark):
    """PNG payloads through the full mapInPandas real tier: dims,
    channels and mean must match the numpy ground truth."""
    rng = np.random.default_rng(3)
    rows = []
    truth = {}
    for i in range(6):
        shape = (4 + i, 3 + i, [1, 3, 4][i % 3])
        arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
        ct = {1: 0, 3: 2, 4: 6}[shape[2]]
        if ct == 0:
            arr = arr[:, :, 0]
        filt = [(r + i) % 5 for r in range(shape[0])]
        rows.append((i, bytearray(_encode_png(arr, color_type=ct,
                                              filters=filt))))
        truth[i] = (shape[1], shape[0], shape[2],
                    pytest.approx(arr.mean() / 255.0, abs=1e-12))
    df = spark.createDataFrame(rows, "media_id long, data binary")
    got = {r.media_id: (r.width, r.height, r.n_channels, r.mean_pixel)
           for r in MM.decode_images(df, mode="real").collect()}
    assert len(got) == 6
    for i, (w, h, nch, mean) in truth.items():
        assert got[i][:3] == (w, h, nch), i
        assert got[i][3] == mean, i


def test_decode_audio_real_wav_roundtrip(spark):
    """Real-tier WAV decode: generate PCM WAVs with the stdlib writer
    (16-bit sine, 8-bit silence, stereo ramp), decode through the
    mapInPandas operator, check every field against the known signal."""
    import io
    import math
    import struct
    import wave

    from library_data_warehouse_and_business_analytics_system_spark.operators.multimodal import (  # noqa: E501
        decode_audio,
    )

    def make_wav(rate, n_ch, width, frames):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(n_ch)
            w.setsampwidth(width)
            w.setframerate(rate)
            w.writeframes(frames)
        return buf.getvalue()

    # 1: 16-bit mono full-scale-half sine, 8000 Hz, 800 frames
    sine = b"".join(struct.pack("<h", int(16384 * math.sin(2 * math.pi *
                                                           440 * i / 8000)))
                    for i in range(800))
    # 2: 8-bit mono silence (unsigned midpoint 128), 16000 Hz
    silence = bytes([128] * 1600)
    # 3: 16-bit stereo constant amplitude 1000
    stereo = struct.pack("<h", 1000) * (2 * 441)
    rows = [(1, make_wav(8000, 1, 2, sine)),
            (2, make_wav(16000, 1, 1, silence)),
            (3, make_wav(44100, 2, 2, stereo))]
    df = spark.createDataFrame(rows, "media_id long, data binary")
    got = {r.media_id: r for r in decode_audio(df, mode="real").collect()}

    r1 = got[1]
    assert (r1.sample_rate, r1.n_channels, r1.bit_depth, r1.n_frames,
            r1.duration_ms) == (8000, 1, 16, 800, 100)
    expected_rms = math.sqrt(sum(
        int(16384 * math.sin(2 * math.pi * 440 * i / 8000)) ** 2
        for i in range(800)) / 800) / 32768.0
    assert math.isclose(r1.rms, expected_rms, rel_tol=1e-12)

    r2 = got[2]
    assert (r2.sample_rate, r2.bit_depth, r2.n_frames, r2.rms) == \
        (16000, 8, 1600, 0.0)

    r3 = got[3]
    assert (r3.sample_rate, r3.n_channels, r3.n_frames) == (44100, 2, 441)
    assert math.isclose(r3.rms, 1000 / 32768.0, rel_tol=1e-12)


def test_decode_audio_fake_tier_deterministic(spark):
    from library_data_warehouse_and_business_analytics_system_spark.operators.multimodal import (  # noqa: E501
        decode_audio,
    )
    df = spark.createDataFrame([(1, b"abc"), (2, b"abc"), (3, b"xyz")],
                               "media_id long, data binary")
    rows = {r.media_id: (r.sample_rate, r.n_channels, r.bit_depth,
                         r.n_frames, r.duration_ms, r.rms)
            for r in decode_audio(df, mode="fake").collect()}
    assert rows[1] == rows[2]          # same payload → same stats
    assert rows[1] != rows[3]
    assert rows[1][0] in (8000, 16000, 22050, 44100)


# ---------------------------------------------------------------------------
# Y4M video decode: streams hand-written by the test (the format is
# public: YUV4MPEG2 header + FRAME markers + raw planar YUV), parsed
# by the stdlib-only decoder — same strategy as the PNG codec above.


def _make_y4m(w, h, frame_lumas, fps=(25, 1), cs="420"):
    ratio = {"420": 1.5, "422": 2.0, "444": 3.0, "mono": 1.0}[cs]
    chroma = int(w * h * ratio) - w * h
    head = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C{cs}\n"
    out = bytearray(head.encode())
    for luma in frame_lumas:
        out += b"FRAME\n"
        out += bytes([luma]) * (w * h)          # constant Y plane
        out += bytes([128]) * chroma            # neutral chroma
    return bytes(out)


def test_y4m_known_signal_roundtrip():
    payload = _make_y4m(8, 4, [100, 200], fps=(30, 1))
    w, h, n, fps, dur, luma = MM._decode_y4m(payload)
    assert (w, h, n) == (8, 4, 2)
    assert fps == 30.0
    assert dur == 2 * 1000 * 1 // 30
    assert luma == 150 / 255.0  # exact: constant planes, integer mean


def test_y4m_colorspaces_and_fractional_fps():
    for cs in ("420", "422", "444", "mono"):
        payload = _make_y4m(4, 4, [50], cs=cs, fps=(30000, 1001))
        w, h, n, fps, dur, luma = MM._decode_y4m(payload)
        assert (w, h, n) == (4, 4, 1), cs
        assert abs(fps - 29.97) < 0.01
        assert luma == 50 / 255.0, cs


def test_y4m_rejects_corrupt_streams():
    good = _make_y4m(4, 4, [10, 20])
    with pytest.raises(ValueError, match="not a YUV4MPEG2"):
        MM._decode_y4m(b"RIFF" + good)
    with pytest.raises(ValueError, match="truncated"):
        MM._decode_y4m(good[:-5])
    with pytest.raises(ValueError, match="unsupported Y4M colorspace"):
        MM._decode_y4m(_make_y4m(4, 4, [10]).replace(b"C420", b"C410"))


def test_decode_video_real_tier_via_spark(spark):
    rows = [(1, _make_y4m(8, 4, [100, 200]), None),
            (2, _make_y4m(4, 4, [0], cs="444"), None)]
    df = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    got = {r.media_id: r for r in
           MM.decode_video(df, mode="real").collect()}
    assert got[1].width == 8 and got[1].n_frames == 2
    assert got[1].mean_luma == 150 / 255.0
    assert got[2].height == 4 and got[2].mean_luma == 0.0


def test_decode_video_fake_matches_reference_impl(spark):
    rows = [(i, f"payload {i}".encode(), None) for i in range(20)]
    df = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    got = {r.media_id: r for r in MM.decode_video(df).collect()}
    for i in range(20):
        w, h, n, fps, dur, luma = MM.fake_decode_video(f"payload {i}".encode())
        r = got[i]
        assert (r.width, r.height, r.n_frames) == (w, h, n)
        assert (r.fps, r.duration_ms) == (fps, dur)
        assert abs(r.mean_luma - luma) < 1e-12
