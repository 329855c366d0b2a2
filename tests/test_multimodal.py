"""Multimodal plumbing tests: schemas, Arrow batch shape, deterministic
stubbed decode, resize math, frame explosion, audio features."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from statschat_ke_spark.functions.multimodal import (
    _decode_payload,
    audio_features,
    decode_images,
    image_features,
    media_from_documents,
    recommended_arrow_conf,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark, corpus_df):
    docs = corpus_df.limit(120).withColumn("doc_id", F.xxhash64("url"))
    m = media_from_documents(docs)
    m.cache().count()
    return m


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == [
        "media_id", "url", "kind", "payload", "meta",
    ]
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_decode_deterministic_and_shapes(media):
    pix = decode_images(media, num_partitions=4).cache()
    rows = pix.collect()
    n_img = media.filter("kind = 'image'").count()
    assert len(rows) == n_img
    for r in rows[:10]:
        assert len(r.pixels) == r.width * r.height * r.channels
    # determinism: second run byte-identical
    rows2 = {r.media_id: bytes(r.pixels) for r in decode_images(media).collect()}
    for r in rows:
        assert bytes(r.pixels) == rows2[r.media_id]


def test_resize(media):
    pix = decode_images(media)
    rs = resize_images(pix, 8, 6).collect()
    for r in rs:
        assert (r.width, r.height) == (8, 6)
        assert len(r.pixels) == 8 * 6 * r.channels
    # resize of a constant image stays constant
    const = np.full((10, 12, 3), 7, dtype=np.uint8)
    yi = (np.arange(6) * 10 // 6)
    xi = (np.arange(8) * 12 // 8)
    assert (const[yi][:, xi] == 7).all()


def test_image_features(media):
    feats = image_features(decode_images(media)).collect()
    for r in feats:
        assert 0.0 <= r.mean_intensity <= 255.0
        assert len(r.channel_means) == 3
    # cross-check one image against local numpy
    one = decode_images(media).limit(1).collect()[0]
    arr = np.frombuffer(one.pixels, dtype=np.uint8)
    f = [r for r in feats if r.media_id == one.media_id][0]
    assert abs(f.mean_intensity - arr.mean()) < 1e-9


def test_sample_frames(media):
    fr = sample_frames(media, every_ms=500, frame_w=4, frame_h=4)
    pdf = fr.toPandas()
    vids = media.filter("kind = 'video'").select("media_id", "meta.duration_ms").collect()
    expect = sum(max(1, int(v.duration_ms) // 500) for v in vids)
    assert len(pdf) == expect
    assert (pdf.groupby("media_id")["frame_idx"].min() == 0).all()
    assert all(len(b) == 4 * 4 * 3 for b in pdf["frame"])


def test_audio_features(media):
    af = audio_features(media).collect()
    n_audio = media.filter("kind = 'audio'").count()
    assert len(af) == n_audio
    for r in af:
        assert 0.0 <= r.rms <= 1.0
        assert 0.0 <= r.zero_crossing_rate <= 1.0


def test_decode_stub_tiles_payload():
    arr = _decode_payload(b"\x01\x02\x03", 2, 2, 3)
    assert arr.shape == (2, 2, 3)
    assert arr.flatten().tolist() == [1, 2, 3, 1, 2, 3, 1, 2, 3, 1, 2, 3]


def test_arrow_conf_bounds():
    conf = recommended_arrow_conf(avg_payload_bytes=4 << 20)
    assert conf["spark.sql.execution.arrow.maxRecordsPerBatch"] == "16"
