"""Multimodal column plumbing: schemas, batch shapes, deterministic stubs."""

import zlib

import pytest
from pyspark.sql import functions as F

from scholarmind_spark.multimodal import (
    decode_images,
    extract_features,
    frame_sample,
    media_byte_stats,
    resize_images,
    synth_media,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    df = synth_media(spark, SF_DIR)
    df.cache().count()
    return df


def test_media_schema(media):
    assert dict(media.dtypes)["content"] == "binary"
    meta = dict(media.dtypes)["media"]
    assert meta.startswith("struct<media_type:string,mime:string,width:int")
    # metadata-only predicates never touch the payload column
    n_img = media.filter(F.col("media.media_type") == "image").count()
    assert n_img > 0


def test_byte_stats_match_payload(media):
    rows = media_byte_stats(media).orderBy("media_id").limit(5).collect()
    src = {r["media_id"]: r for r in media.orderBy("media_id").limit(5).collect()}
    for r in rows:
        assert r["n_bytes"] == len(src[r["media_id"]]["content"])


def test_decode_stub_contract(media):
    out = decode_images(media)
    assert out.columns == [
        "media_id", "media_type", "width", "height", "n_channels", "decode_ok", "decoder",
    ]
    rows = out.collect()
    n_img = media.filter(F.col("media.media_type") == "image").count()
    assert len(rows) == n_img  # one output row per image row
    assert all(r["decode_ok"] for r in rows)


def test_resize_dims(media):
    out = {r["media_id"]: r for r in resize_images(media, max_side=128).collect()}
    src = media.filter(F.col("media.media_type") == "image").select(
        "media_id", "media.width", "media.height"
    ).collect()
    for r in src:
        got = out[r["media_id"]]
        scale = min(1.0, 128 / max(r["width"], r["height"]))
        assert got["width"] == int(r["width"] * scale)
        assert got["height"] == int(r["height"] * scale)
        assert max(got["width"], got["height"]) <= 128


def test_features_shape_and_norm(media):
    rows = extract_features(media).limit(20).collect()
    for r in rows:
        assert len(r["feature"]) == 16
        assert abs(sum(r["feature"]) - 1.0) < 1e-3  # L1-normalized


def test_frame_sample_fanout(media):
    n_video = media.filter(F.col("media.media_type") == "video").count()
    frames = frame_sample(media, n_frames=4)
    assert frames.count() == 4 * n_video
    one = frames.filter(F.col("media_id") == 2).orderBy("frame_no").collect()
    src = media.filter(F.col("media_id") == 2).collect()[0]
    # frames are contiguous slices; timestamps evenly spaced
    dur = src["media"]["duration_ms"]
    assert [r["frame_ts_ms"] for r in one] == [dur * i // 4 for i in range(4)]
    reassembled = b"".join(bytes(r["frame"]) for r in one)
    assert src["content"][: len(reassembled)] == reassembled
    assert zlib.crc32(reassembled) == zlib.crc32(src["content"][: len(reassembled)])
