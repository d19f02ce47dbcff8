"""Multimodal binary-column plumbing: schema, batch shapes, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ubparquet_spark.functions import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.synth_media_df(spark, 30).cache()


def test_schema_typed_meta(media):
    kinds = dict(media.groupBy("kind").count().collect()[0].asDict())
    assert set(media.columns) == {"media_id", "kind", "payload", "meta"}
    assert dict(media.dtypes)["payload"] == "binary"
    audio = media.filter(F.col("kind") == "audio").select("meta.sample_rate").collect()
    assert all(r.sample_rate == 16000 for r in audio)


def test_decode_requires_explicit_fake(media):
    with pytest.raises(NotImplementedError):
        mm.decode_media(media)


def test_decode_stub_stats_deterministic(spark, media):
    out1 = {r.media_id: r for r in mm.decode_media(media, allow_fake=True).collect()}
    out2 = {r.media_id: r for r in mm.decode_media(media, allow_fake=True).collect()}
    assert len(out1) == media.count()
    for mid, r in out1.items():
        assert r.n_values > 0
        assert 0.0 <= r.min_value <= r.mean_value <= r.max_value < 1.0
        assert out2[mid].mean_value == r.mean_value  # same payload -> same stats
    # image n_values = w*h*c from typed metadata
    img = media.filter(F.col("kind") == "image").select("media_id", "meta").collect()
    for row in img:
        m = row.meta
        assert out1[row.media_id].n_values == m.width * m.height * m.channels


def test_extract_features_shape(media):
    feats = mm.extract_features(media, dim=16).collect()
    assert len(feats) == media.count()
    assert all(len(r.feature) == 16 for r in feats)
    # deterministic across runs
    again = mm.extract_features(media, dim=16).collect()
    assert {r.media_id: tuple(r.feature) for r in feats} == {
        r.media_id: tuple(r.feature) for r in again
    }


def test_frame_sample_plan(media):
    frames = mm.frame_sample(media, every_k=10).collect()
    vids = media.filter(F.col("kind") == "video").select("media_id", "meta.n_frames").collect()
    expected = {(v.media_id, i) for v in vids for i in range(0, v.n_frames, 10)}
    assert {(f.media_id, f.frame_idx) for f in frames} == expected


def test_resize_plan(media):
    plans = mm.resize_plan(media, 224, 224).collect()
    assert all(abs(p.scale_x - 224 / p.src_w) < 1e-12 for p in plans)
    assert all(p.dst_w == 224 and p.dst_h == 224 for p in plans)
