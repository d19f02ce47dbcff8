"""Voxel/array operators vs numpy reference implementations.

Each test recomputes the expected result with the same numpy idioms the
reference uses (boolean masks, np.unique, bincount-argmax, floor-div binning)
and checks exact agreement with the distributed plan.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from ubparquet_spark.operators import voxel
from ubparquet_spark.codec import decode_ndarray

from .fixtures import make_spacepoint_events, make_voxel_events, spacepoint_df, voxel_df

KEYS = ["run", "subrun", "event"]


def _np_events(rows, col):
    return {
        (r["run"], r["subrun"], r["event"]): decode_ndarray(
            r[col], r[col + "_shape"]
        )
        for r in rows
    }


def test_mask_filter_matches_numpy(spark):
    rows = make_spacepoint_events(5)
    df = spacepoint_df(spark, 5)
    out = voxel.mask_filter(df, ["spacepoint_t"], "truetriplet_t", KEYS).collect()
    spt = _np_events(rows, "spacepoint_t")
    masks = _np_events(rows, "truetriplet_t")
    for r in out:
        key = (r.run, r.subrun, r.event)
        expected = spt[key][masks[key] == 1]
        got = decode_ndarray(r.spacepoint_t, r.spacepoint_t_shape)
        np.testing.assert_array_equal(got, expected)


def test_mask_filter_cofilters_parallel_tensors(spark):
    rows = make_spacepoint_events(4)
    df = spacepoint_df(spark, 4)
    out = voxel.mask_filter(
        df, ["spacepoint_t", "ssnet_label"], "truetriplet_t", KEYS
    ).collect()
    spt = _np_events(rows, "spacepoint_t")
    lbl = _np_events(rows, "ssnet_label")
    masks = _np_events(rows, "truetriplet_t")
    for r in out:
        key = (r.run, r.subrun, r.event)
        m = masks[key] == 1
        np.testing.assert_array_equal(
            decode_ndarray(r.spacepoint_t, r.spacepoint_t_shape), spt[key][m]
        )
        np.testing.assert_array_equal(
            decode_ndarray(r.ssnet_label, r.ssnet_label_shape).reshape(-1),
            lbl[key][m],
        )


def test_voxelize_matches_numpy(spark):
    rows = make_spacepoint_events(4)
    df = spacepoint_df(spark, 4)
    pts = voxel.points_view(df, "spacepoint_t", KEYS)
    cells = voxel.voxelize(pts, voxel_size=10.0, origin=(0.0, -117.0, 0.0)).collect()
    spt = _np_events(rows, "spacepoint_t")
    expected = {}
    for key, arr in spt.items():
        bins = np.floor(
            (arr[:, :3] - np.array([0.0, -117.0, 0.0])) / 10.0
        ).astype(np.int64)
        for b, q in zip(map(tuple, bins), arr[:, 3]):
            k = key + b
            n, s = expected.get(k, (0, 0.0))
            expected[k] = (n + 1, s + q)
    assert len(cells) == len(expected)
    for c in cells:
        k = (c.run, c.subrun, c.event, c.vx, c.vy, c.vz)
        n, s = expected[k]
        assert c.n_points == n
        assert abs(c.sum_charge - s) < 1e-9


def test_voxelize_majority_label(spark):
    df = spark.createDataFrame(
        [
            # one voxel (0,0,0) with labels 2,2,5 -> mode 2
            (1, 0, 0, 0.5, 0.5, 0.5, 10.0, 2),
            (1, 0, 0, 0.6, 0.2, 0.1, 10.0, 2),
            (1, 0, 0, 0.1, 0.9, 0.8, 10.0, 5),
            # tie in voxel (1,0,0): labels 3,4 -> smaller class id wins
            (1, 0, 0, 1.5, 0.5, 0.5, 10.0, 4),
            (1, 0, 0, 1.6, 0.2, 0.1, 10.0, 3),
        ],
        "run long, subrun long, event long, x double, y double, z double, q double, lbl long",
    )
    out = {
        (r.vx, r.vy, r.vz): r.mode_lbl
        for r in voxel.voxelize(df, voxel_size=1.0, label_col="lbl").collect()
    }
    assert out[(0, 0, 0)] == 2
    assert out[(1, 0, 0)] == 3


def test_instance_regrain_matches_numpy(spark):
    """Full voxel_to_instance_data.py semantics vs a direct numpy replay."""
    rows = make_voxel_events(5)
    df = voxel_df(spark, 5)
    out = voxel.instance_regrain(df).collect()
    expected = {}
    for r in rows:
        key = (r["run"], r["subrun"], r["event"])
        coord = decode_ndarray(r["voxcoord"], r["voxcoord_shape"])
        lab = decode_ndarray(r["voxlabel"], r["voxlabel_shape"]).reshape(-1)
        inst = decode_ndarray(r["voxinstance"], r["voxinstance_shape"]).reshape(-1)
        ss = decode_ndarray(r["voxssnet"], r["voxssnet_shape"]).reshape(-1)
        keep = lab == 1
        coord, inst, ss = coord[keep], inst[keep], ss[keep]
        for i in np.unique(inst):
            if i == 0:
                continue
            sel = inst == i
            mode = int(np.argmax(np.bincount(ss[sel].astype(int))))
            expected[key + (int(i),)] = (coord[sel], mode)
    assert len(out) == len(expected)
    for r in out:
        coords_exp, mode_exp = expected[(r.run, r.subrun, r.event, r.instance)]
        got = decode_ndarray(r.instvoxcoord, r.instvoxcoord_shape)
        np.testing.assert_array_equal(got, coords_exp)
        assert r.label == mode_exp


def test_dedup_audit(spark):
    rows = make_voxel_events(4)
    df = voxel_df(spark, 4)
    pts = voxel.points_view(df, "voxcoord", KEYS)
    # fixture coords are unique per event (reference invariant) -> clean
    assert voxel.dedup_audit(pts, ["x", "y", "z"]).count() == 0
    # duplicate every point -> every coord flagged
    dup = pts.unionByName(pts)
    n_coords = pts.count()
    assert voxel.dedup_audit(dup, ["x", "y", "z"]).count() == n_coords


def test_coo_dense_roundtrip(spark):
    rng = np.random.default_rng(3)
    dense = np.zeros((20, 30))
    idx = rng.choice(600, 40, replace=False)
    dense[idx // 30, idx % 30] = rng.uniform(1, 10, 40)
    coo = [
        (int(r), int(c), float(dense[r, c]))
        for r, c in zip(*np.nonzero(dense))
    ]
    df = spark.createDataFrame(coo, "row int, col int, value double")
    back = voxel.coo_to_dense_pandas(df, (20, 30))
    np.testing.assert_array_equal(back, dense)
    sparse_again = voxel.dense_to_coo(df, "value")
    assert sparse_again.count() == 40


def test_clip_scale(spark):
    df = spark.createDataFrame(
        [([0.0, 40.0, 800.0],)], "voxfeat array<double>"
    )
    out = df.select(
        voxel.clip_scale("voxfeat", scale=40.0, lo=0.0, hi=10.0).alias("n")
    ).collect()[0].n
    assert out == [0.0, 1.0, 10.0]
