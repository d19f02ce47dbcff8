"""Detector geometry constants + fiducial cuts (reference parity:
detectoroutline.py:5-12, jam_larennet.py:47-55)."""

from __future__ import annotations

import numpy as np

from ubparquet_spark import codec, geometry

from .fixtures import spacepoint_df


def test_constants_match_reference():
    assert geometry.TPC_X == (0.0, 256.0)
    assert geometry.TPC_Y == (-117.0, 117.0)
    assert geometry.TPC_Z == (0.0, 1036.0)
    assert geometry.DETTICK_RANGE == (0.0, 9600.0)
    # detx_range = (ticks - trig) * 0.5 * 0.111 (detectoroutline.py:10-11)
    assert geometry.DETX_RANGE[0] == (0.0 - 3200.0) * 0.5 * 0.111
    assert geometry.DETX_RANGE[1] == (9600.0 - 3200.0) * 0.5 * 0.111


def test_tick_to_x(spark):
    df = spark.createDataFrame([(3200.0,), (3202.0,)], "tick double")
    xs = [r.x for r in df.select(geometry.tick_to_x("tick").alias("x")).collect()]
    assert xs[0] == 0.0
    assert abs(xs[1] - 2.0 * 0.5 * 0.111) < 1e-12


def test_fiducial_cut_scalar_rows(spark):
    rows = [
        (1, 128.0, 0.0, 500.0),     # inside
        (2, -1.0, 0.0, 500.0),      # x below
        (3, 128.0, -118.0, 500.0),  # y below
        (4, 128.0, 0.0, 1037.0),    # z above
        (5, 2.0, 110.0, 1030.0),    # inside, near faces
    ]
    df = spark.createDataFrame(rows, "id long, x double, y double, z double")
    kept = {r.id for r in geometry.fiducial_cut(df).collect()}
    assert kept == {1, 5}
    # a 10 cm margin also drops the near-face point
    kept_m = {r.id for r in geometry.fiducial_cut(df, margin=10.0).collect()}
    assert kept_m == {1}


def test_fiducial_point_cut_matches_numpy(spark, request):
    """Per-point cut over the exploded spacepoint view == the numpy mask
    the reference applies (jam_larennet.py:47-55 shape)."""
    df = spacepoint_df(spark)
    pts = codec.explode_tensor(df, "spacepoint_t", ["run", "subrun", "event"])
    cut = geometry.fiducial_point_cut(pts, "spacepoint_t_point", margin=5.0)
    got = cut.count()

    # numpy golden over the same fixture rows
    rows = df.select("spacepoint_t", "spacepoint_t_shape").collect()
    expect = 0
    for r in rows:
        arr = codec.decode_ndarray(r.spacepoint_t, r.spacepoint_t_shape)
        m = 5.0
        mask = (
            (arr[:, 0] >= 0 + m) & (arr[:, 0] <= 256 - m)
            & (arr[:, 1] >= -117 + m) & (arr[:, 1] <= 117 - m)
            & (arr[:, 2] >= 0 + m) & (arr[:, 2] <= 1036 - m)
        )
        expect += int(mask.sum())
    assert got == expect and got > 0
