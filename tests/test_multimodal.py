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


def test_real_mode_is_gated(media):
    with pytest.raises(NotImplementedError):
        MM.decode_images(media, mode="real").collect()


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
