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


def test_ppm_roundtrip_and_comment_header():
    import numpy as np

    from ubparquet_spark.functions.multimodal import decode_ppm, encode_ppm

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (10, 7, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_ppm(encode_ppm(img)), img)
    gray = rng.integers(0, 256, (5, 9), dtype=np.uint8)
    np.testing.assert_array_equal(decode_ppm(encode_ppm(gray)), gray)
    # netpbm comments in the header must be skipped
    with_comment = b"P6\n# a comment line\n7 10\n255\n" + img.tobytes()
    np.testing.assert_array_equal(decode_ppm(with_comment), img)


def test_resize_nearest_matches_numpy_indexing():
    import numpy as np

    from ubparquet_spark.functions.multimodal import resize_nearest

    arr = np.arange(24, dtype=np.uint8).reshape(4, 6)
    out = resize_nearest(arr, 3, 2)
    assert out.shape == (2, 3)
    # identity resize is exact
    np.testing.assert_array_equal(resize_nearest(arr, 6, 4), arr)


def test_real_multimodal_path_end_to_end(spark):
    """decode -> resize -> features over REAL PPM payloads: values must
    match a pure-numpy reference decode of the same bytes."""
    import numpy as np

    from ubparquet_spark.functions.multimodal import (
        decode_ppm,
        decode_resize_features,
        resize_nearest,
        synth_ppm_df,
    )

    df = synth_ppm_df(spark, n=12)
    got = {r["media_id"]: r for r in decode_resize_features(df).collect()}
    raw = {r["media_id"]: bytes(r["payload"]) for r in df.collect()}
    assert set(got) == set(raw)
    for mid, payload in raw.items():
        img = decode_ppm(payload)
        g = got[mid]
        assert (g["height"], g["width"]) == img.shape[:2]
        assert abs(g["mean_r"] - img[:, :, 0].mean()) < 1e-9
        small = resize_nearest(img, 16, 12).astype(np.float64)
        want = (small.mean(axis=2) / 255.0).ravel()
        np.testing.assert_allclose(np.asarray(g["feature"]), want, rtol=1e-6)
