"""Ragged-tensor codec: round-trip exactness and invariants (FIXTURES.md C)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ubparquet_spark import codec

from .fixtures import make_spacepoint_events, spacepoint_df


def test_numpy_roundtrip_exact():
    rng = np.random.default_rng(7)
    for shape in [(5,), (4, 3), (2, 3, 4), (1, 7), (9, 1)]:
        arr = rng.standard_normal(shape)
        flat, s = codec.encode_ndarray(arr)
        back = codec.decode_ndarray(flat, s)
        np.testing.assert_array_equal(arr, back)
        assert int(np.prod(s)) == len(flat)


def test_numpy_roundtrip_int_dtypes():
    arr = np.arange(24, dtype=np.int64).reshape(4, 6)
    flat, s = codec.encode_ndarray(arr)
    back = codec.decode_ndarray(flat, s, dtype=np.int64)
    np.testing.assert_array_equal(arr, back)
    assert back.dtype == np.int64


def test_column_pairing(spark):
    df = spacepoint_df(spark)
    assert codec.tensor_columns(df) == [
        "spacepoint_t",
        "ssnet_label",
        "truetriplet_t",
    ]
    assert "spacepoint_t_shape" not in codec.data_columns(df)


def test_validate_tensors_clean(spark):
    df = spacepoint_df(spark)
    assert codec.validate_tensors(df).count() == 0


def test_validate_tensors_catches_corruption(spark):
    df = spacepoint_df(spark).withColumn(
        "spacepoint_t", F.slice(F.col("spacepoint_t"), 1, 7)
    )
    bad = codec.validate_tensors(df)
    assert bad.filter(F.col("column") == "spacepoint_t").count() > 0


def test_explode_reassemble_roundtrip_exact(spark):
    """decode(encode(tensor)) == tensor through the distributed path:
    explode to per-point rows, reassemble, compare flat+shape exactly."""
    df = spacepoint_df(spark)
    keys = ["run", "subrun", "event"]
    pts = codec.explode_tensor(df, "spacepoint_t", keys)
    back = codec.reassemble_tensor(pts, "spacepoint_t_point", keys)
    joined = df.select(
        *keys,
        F.col("spacepoint_t").alias("orig"),
        F.col("spacepoint_t_shape").alias("orig_shape"),
    ).join(back, keys)
    mismatch = joined.filter(
        (F.col("orig") != F.col("spacepoint_t"))
        | (F.col("orig_shape") != F.col("spacepoint_t_shape"))
    )
    assert mismatch.count() == 0
    assert joined.count() == df.count()


def test_explode_point_values_match_numpy(spark):
    rows = make_spacepoint_events(3)
    df = spacepoint_df(spark, 3)
    pts = (
        codec.explode_tensor(df, "spacepoint_t", ["run", "subrun", "event"])
        .orderBy("run", "subrun", "event", "idx")
        .collect()
    )
    expected = {}
    for r in rows:
        arr = np.array(r["spacepoint_t"]).reshape(r["spacepoint_t_shape"])
        expected[(r["run"], r["subrun"], r["event"])] = arr
    for p in pts:
        arr = expected[(p.run, p.subrun, p.event)]
        np.testing.assert_array_equal(np.array(p.spacepoint_t_point), arr[p.idx])


def test_explode_tensors_parallel_alignment(spark):
    """Parallel tensors of one event share leading dim (C5): the co-exploded
    view aligns point i of (N,4) spacepoints with label i of (N,)."""
    rows = make_spacepoint_events(2)
    df = spacepoint_df(spark, 2)
    out = (
        codec.explode_tensors(
            df,
            ["spacepoint_t", "ssnet_label"],
            ["run", "subrun", "event"],
        )
        .orderBy("event", "idx")
        .collect()
    )
    for r in rows:
        labels = np.array(r["ssnet_label"])
        pts = [o for o in out if o.event == r["event"]]
        assert len(pts) == r["spacepoint_t_shape"][0]
        for o in pts:
            assert o.ssnet_label[0] == labels[o.idx]


def test_map_view_lookup(spark):
    """Parallel-list map -> MapType -> element_at lookup (J1 probe side)."""
    df = spark.createDataFrame(
        [([101, 205, 333], [1, 2, 3])],
        "voxinstancelist array<long>, voxidlist array<long>",
    )
    out = codec.map_view(df, "voxinstancelist", "voxidlist", "inst2id")
    row = out.select(
        F.element_at("inst2id", F.lit(205)).alias("hit"),
        F.element_at("inst2id", F.lit(999)).alias("miss"),
    ).collect()[0]
    assert row.hit == 2 and row.miss is None


@pytest.mark.parametrize("shape", [(13, 1), (1, 5), (30, 4)])
def test_roundtrip_parquet_edge_shapes(spark, tmp_path, shape):
    """Write → read → decode round-trip through actual Parquet files."""
    rng = np.random.default_rng(0)
    arr = rng.standard_normal(shape)
    flat, s = codec.encode_ndarray(arr)
    df = spark.createDataFrame(
        [{"event": 0, "x": flat, "x_shape": s}],
        "event long, x array<double>, x_shape array<long>",
    )
    path = str(tmp_path / "t.parquet")
    df.write.mode("overwrite").parquet(path)
    row = spark.read.parquet(path).collect()[0]
    back = codec.decode_ndarray(row.x, row.x_shape)
    np.testing.assert_array_equal(arr, back)


def test_explode_axis1_matches_numpy_columns(spark):
    """voxkplabel-style (k, N) tensors (dlmerged2parquet.py:100-120): the
    axis=1 per-point view must equal the numpy column arr[:, j]."""
    rng = np.random.default_rng(11)
    arr = rng.standard_normal((6, 9))  # (k=6 features, V=9 points)
    flat, shape = codec.encode_ndarray(arr)
    df = spark.createDataFrame(
        [(1, flat, shape)], "event long, kp array<double>, kp_shape array<long>"
    )
    pts = codec.explode_tensor(df, "kp", ["event"], axis=1).collect()
    assert len(pts) == 9
    for r in pts:
        np.testing.assert_array_equal(np.array(r.kp_point), arr[:, r.idx])


def test_transpose_then_axis0_roundtrip(spark):
    """transpose_tensor((k,N)) -> (N,k) layout; the default axis-0 explode
    over the transposed tensor equals the axis-1 explode of the original,
    and reassembly round-trips the transposed tensor exactly."""
    rng = np.random.default_rng(12)
    arr = rng.standard_normal((6, 7))
    flat, shape = codec.encode_ndarray(arr)
    df = spark.createDataFrame(
        [(1, flat, shape)], "event long, kp array<double>, kp_shape array<long>"
    )
    t = codec.transpose_tensor(df, "kp")
    row = t.collect()[0]
    np.testing.assert_array_equal(
        codec.decode_ndarray(row.kp, row.kp_shape), arr.T
    )
    pts = codec.explode_tensor(t, "kp", ["event"]).collect()  # axis=0 now
    for r in pts:
        np.testing.assert_array_equal(np.array(r.kp_point), arr[:, r.idx])
    back = codec.reassemble_tensor(
        codec.explode_tensor(t, "kp", ["event"]), "kp_point", ["event"]
    ).collect()[0]
    np.testing.assert_array_equal(
        codec.decode_ndarray(back.kp, back.kp_shape), arr.T
    )


def test_explode_axis1_empty_tensor(spark):
    """V = 0 (empty event): no phantom rows from either axis."""
    df = spark.createDataFrame(
        [(1, [], [6, 0])], "event long, kp array<double>, kp_shape array<long>"
    )
    assert codec.explode_tensor(df, "kp", ["event"], axis=1).count() == 0
    assert codec.transpose_tensor(df, "kp").collect()[0].kp == []
