"""Grid-bucketed radius self-join vs brute-force numpy distances."""

from __future__ import annotations

import numpy as np

from ubparquet_spark.operators import spatial, voxel

from .fixtures import make_spacepoint_events, spacepoint_df

KEYS = ["run", "subrun", "event"]


def test_radius_self_join_matches_bruteforce(spark):
    rows = make_spacepoint_events(3)
    df = spacepoint_df(spark, 3)
    pts = voxel.points_view(df, "spacepoint_t", KEYS)
    r = 60.0
    got = {
        (e.run, e.subrun, e.event, e.a_id, e.b_id)
        for e in spatial.radius_self_join(pts, r).collect()
    }
    expected = set()
    for row in rows:
        arr = np.array(row["spacepoint_t"]).reshape(row["spacepoint_t_shape"])[:, :3]
        d = np.sqrt(((arr[:, None, :] - arr[None, :, :]) ** 2).sum(-1))
        a_idx, b_idx = np.nonzero((d <= r) & ~np.eye(len(arr), dtype=bool))
        for a, b in zip(a_idx, b_idx):
            expected.add((row["run"], row["subrun"], row["event"], int(a), int(b)))
    assert got == expected
    assert len(expected) > 0  # the radius actually selects pairs


def test_radius_join_distance_values(spark):
    df = spark.createDataFrame(
        [
            (1, 0, 0, 0, 0.0, 0.0, 0.0),
            (1, 0, 0, 1, 3.0, 4.0, 0.0),   # dist 5
            (1, 0, 0, 2, 100.0, 0.0, 0.0), # far away
        ],
        "run long, subrun long, event long, idx long, x double, y double, z double",
    )
    edges = spatial.radius_self_join(df, 6.0).collect()
    pairs = {(e.a_id, e.b_id): e.dist for e in edges}
    assert set(pairs) == {(0, 1), (1, 0)}
    assert abs(pairs[(0, 1)] - 5.0) < 1e-12


def test_scatter_add_vector_elementwise(spark):
    """Vector scatter-add: element-wise sums per destination vs numpy."""
    edges = spark.createDataFrame(
        [
            (1, 0, 0, 10, [1.0, 2.0, 3.0]),
            (1, 0, 0, 10, [0.5, 0.5, 0.5]),
            (1, 0, 0, 20, [2.0, 0.0, -1.0]),
        ],
        "run long, subrun long, event long, b_id long, feat array<double>",
    )
    out = {
        r.b_id: r.sum_feat
        for r in spatial.scatter_add_vector(edges, "feat").collect()
    }
    assert out[10] == [1.5, 2.5, 3.5]
    assert out[20] == [2.0, 0.0, -1.0]


def test_neighbor_degree_and_scatter_add(spark):
    df = spark.createDataFrame(
        [
            (1, 0, 0, 0, 0.0, 0.0, 0.0),
            (1, 0, 0, 1, 1.0, 0.0, 0.0),
            (1, 0, 0, 2, 2.0, 0.0, 0.0),
        ],
        "run long, subrun long, event long, idx long, x double, y double, z double",
    )
    edges = spatial.radius_self_join(df, 1.5)
    deg = spatial.neighbor_degree_stats(edges).collect()[0]
    # chain 0-1-2: edges (0,1),(1,0),(1,2),(2,1)
    assert deg.n_edges == 4 and deg.n_nodes == 3
    sums = {
        r.b_id: r.sum_dist
        for r in spatial.scatter_add(edges.withColumnRenamed("dist", "dist"), "dist").collect()
    }
    assert abs(sums[1] - 2.0) < 1e-12  # two unit edges into node 1
