"""Multimodal plumbing: schema/batch-shape/partition-sizing are real; the
decode kernels are deterministic stand-ins (codec libs absent here), so
every op is reproducible and pinnable."""

import hashlib

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def media(spark):
    rows = [(i, hashlib.sha256(f"media{i}".encode()).digest() * (20 + i)) for i in range(8)]
    rows.append((99, None))  # null payload must be skipped everywhere
    return spark.createDataFrame(rows, "media_id long, data binary")


def test_resize_images_shape_and_determinism(spark, media):
    from solrtexttagger_spark.ops.multimodal import resize_images

    out = resize_images(media, width=128, height=96)
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 8 and 99 not in rows
    r = rows[0]
    assert (r["width"], r["height"]) == (128, 96)
    assert len(r["data"]) == (128 * 96) // 64  # payload scales with w*h
    again = {r["media_id"]: bytes(r["data"]) for r in resize_images(media, width=128, height=96).collect()}
    assert {k: bytes(v["data"]) for k, v in rows.items()} == again


def test_sample_frames_explodes_in_batch(spark, media):
    from solrtexttagger_spark.ops.multimodal import sample_frames

    out = sample_frames(media, every_ms=500, max_frames=4)
    rows = out.collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append((r["frame_idx"], r["ts_ms"]))
    assert set(by_media) == set(range(8))
    for mid, frames in by_media.items():
        idxs = sorted(i for i, _ in frames)
        assert idxs == list(range(len(idxs)))  # dense frame indices
        assert all(ts == i * 500 for i, ts in frames)
        assert 1 <= len(frames) <= 4


def test_extract_features_feeds_similarity(spark, media):
    """The feature op's output plugs directly into the ANN operators."""
    from solrtexttagger_spark.ops.multimodal import extract_features
    from solrtexttagger_spark.ops.similarity import cosine_topk

    emb = extract_features(media, dim=8).withColumnRenamed("media_id", "vec_id")
    vals = emb.collect()
    assert all(len(r["embedding"]) == 8 for r in vals)
    assert all(-1.0 <= x <= 1.0 for r in vals for x in r["embedding"])
    top = cosine_topk(emb, [0, 1], k=3)
    got = {}
    for r in top.collect():
        got.setdefault(r["probe_id"], []).append(r["rank"])
    assert got == {0: [1, 2, 3], 1: [1, 2, 3]}


def test_repartition_for_payload(spark, media):
    from solrtexttagger_spark.ops.multimodal import repartition_for_payload

    out = repartition_for_payload(media, target_partition_bytes=1024)
    total = media.where("data is not null").select(F.sum(F.length("data"))).collect()[0][0]
    expect = -(-total // 1024)
    assert out.rdd.getNumPartitions() == expect


def test_empty_and_null_payload_batches(spark):
    """Empty payloads and all-null partitions must not break Arrow dtype
    conversion (empty pandas batches default to float64 without explicit
    Series dtypes — regression pin)."""
    from solrtexttagger_spark.ops.multimodal import (
        extract_features, resize_images, sample_frames,
    )

    edge = spark.createDataFrame([(1, None), (2, b"")], "media_id long, data binary")
    assert sample_frames(edge).count() == 1
    assert resize_images(edge, width=8, height=8).count() == 1
    assert extract_features(edge).count() == 1
    allnull = spark.createDataFrame([(1, None)], "media_id long, data binary").repartition(4)
    assert extract_features(allnull).count() == 0
