"""Deterministic synthetic ubparquet-shaped event fixtures (FIXTURES.md A).

Shapes/dtypes follow the reference schema docstring
(``/root/reference/larmatch2d/larmatch_dataset.py:16-59``) and the voxel
converter (``dlmerged2parquet.py:90-120``), at small N for tests.
"""

from __future__ import annotations

import numpy as np

from ubparquet_spark.codec import encode_ndarray

RNG_SEED = 42


def make_spacepoint_events(n_events: int = 8, seed: int = RNG_SEED) -> list[dict]:
    """A1-shaped rows: spacepoint_t (N,4) float, ssnet_label (N,) long,
    truetriplet (N,) long in {0,1}, keyed by (run, subrun, event)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_events):
        n = int(rng.integers(50, 200))
        spt = np.empty((n, 4), dtype=np.float64)
        spt[:, 0] = rng.uniform(0, 256.4, n)   # x
        spt[:, 1] = rng.uniform(-117, 117, n)  # y
        spt[:, 2] = rng.uniform(0, 1036, n)    # z
        spt[:, 3] = rng.uniform(0, 200, n)     # charge
        ssnet = rng.integers(0, 7, n).astype(np.int64)
        true_t = (rng.random(n) < 0.6).astype(np.int64)
        flat, shape = encode_ndarray(spt)
        sflat, sshape = encode_ndarray(ssnet)
        tflat, tshape = encode_ndarray(true_t)
        rows.append(
            {
                "run": 1,
                "subrun": i // 4,
                "event": i % 4,
                "spacepoint_t": flat,
                "spacepoint_t_shape": shape,
                "ssnet_label": [int(v) for v in sflat],
                "ssnet_label_shape": sshape,
                "truetriplet_t": [int(v) for v in tflat],
                "truetriplet_t_shape": tshape,
            }
        )
    return rows


def make_voxel_events(n_events: int = 6, seed: int = RNG_SEED) -> list[dict]:
    """A2-shaped rows: voxcoord (V,3) long (unique per event), voxfeat (V,3)
    float, voxlabel/voxssnet/voxinstance (V,) long."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_events):
        v = int(rng.integers(40, 120))
        # unique integer coords per event (invariant larvoxel_dataset.py:101-110)
        coords = rng.choice(40 * 40 * 40, size=v, replace=False)
        voxcoord = np.stack(
            [coords // 1600, (coords // 40) % 40, coords % 40], axis=1
        ).astype(np.int64)
        voxfeat = rng.uniform(0, 400, (v, 3))
        voxlabel = (rng.random(v) < 0.7).astype(np.int64)
        voxssnet = rng.integers(0, 7, v).astype(np.int64)
        voxinstance = rng.integers(0, 5, v).astype(np.int64)
        row = {"run": 1, "subrun": 0, "event": i}
        for name, arr in [
            ("voxcoord", voxcoord),
            ("voxfeat", voxfeat),
            ("voxlabel", voxlabel),
            ("voxssnet", voxssnet),
            ("voxinstance", voxinstance),
        ]:
            flat, shape = encode_ndarray(arr)
            row[name] = flat
            row[name + "_shape"] = shape
        rows.append(row)
    return rows


SPACEPOINT_DDL = (
    "run long, subrun long, event long, "
    "spacepoint_t array<double>, spacepoint_t_shape array<long>, "
    "ssnet_label array<long>, ssnet_label_shape array<long>, "
    "truetriplet_t array<long>, truetriplet_t_shape array<long>"
)

VOXEL_DDL = (
    "run long, subrun long, event long, "
    "voxcoord array<long>, voxcoord_shape array<long>, "
    "voxfeat array<double>, voxfeat_shape array<long>, "
    "voxlabel array<long>, voxlabel_shape array<long>, "
    "voxssnet array<long>, voxssnet_shape array<long>, "
    "voxinstance array<long>, voxinstance_shape array<long>"
)


def spacepoint_df(spark, n_events: int = 8, seed: int = RNG_SEED):
    return spark.createDataFrame(make_spacepoint_events(n_events, seed), SPACEPOINT_DDL)


def voxel_df(spark, n_events: int = 6, seed: int = RNG_SEED):
    return spark.createDataFrame(make_voxel_events(n_events, seed), VOXEL_DDL)
