"""Invariant checks flag seeded corruption and pass on clean data."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from ubparquet_spark import quality
from ubparquet_spark.codec import encode_ndarray

from .fixtures import spacepoint_df, voxel_df

KEYS = ["run", "subrun", "event"]


def test_audit_clean_fixtures(spark):
    df = spacepoint_df(spark, 6)
    report = quality.audit(df, KEYS)
    assert report == {
        "unique_key": 0,
        "shape_products": 0,
        "parallel_leading_dims": 0,
    }


def test_unique_key_violation(spark):
    df = spacepoint_df(spark, 4)
    dup = df.unionByName(df.limit(1))
    assert quality.check_unique_key(dup, KEYS).count() == 1


def test_parallel_dims_violation(spark):
    df = spacepoint_df(spark, 3).withColumn(
        "ssnet_label_shape", F.array(F.lit(7))
    )
    bad = quality.check_parallel_leading_dims(
        df, ["spacepoint_t", "ssnet_label"], KEYS
    )
    assert bad.count() == 3


def test_value_bounds_plane_indices(spark):
    """The wireimg plane-index sanity check (C4): col index must stay
    below the plane image width (2400 for U/V, 3456 for Y)."""
    rng = np.random.default_rng(5)
    rows = []
    for ev, width_ok in [(0, True), (1, False)]:
        n = 50
        hi = 2399 if width_ok else 2600  # event 1 exceeds the U-plane width
        coords = np.column_stack(
            [rng.integers(0, 1008, n), rng.integers(0, hi + 1, n)]
        ).astype(np.int64)
        coords[0, 1] = hi  # force the extreme to be present
        flat, shape = encode_ndarray(coords)
        rows.append(
            {"run": 1, "subrun": 0, "event": ev, "wireimg_coord0": flat,
             "wireimg_coord0_shape": shape}
        )
    df = spark.createDataFrame(
        rows,
        "run long, subrun long, event long, "
        "wireimg_coord0 array<long>, wireimg_coord0_shape array<long>",
    )
    bad = quality.check_value_bounds(df, "wireimg_coord0", hi=2399, keys=KEYS)
    assert [r.event for r in bad.collect()] == [1]


def test_no_duplicate_points(spark):
    df = voxel_df(spark, 3)
    assert quality.check_no_duplicate_points(df, "voxcoord", KEYS).count() == 0
    # corrupt: duplicate the first voxel of each event by doubling the array
    dup = df.withColumn(
        "voxcoord", F.concat(F.slice("voxcoord", 1, 3), F.col("voxcoord"))
    ).withColumn(
        "voxcoord_shape",
        F.array(
            (F.element_at("voxcoord_shape", 1) + 1).cast("long"), F.lit(3).cast("long")
        ),
    )
    assert quality.check_no_duplicate_points(dup, "voxcoord", KEYS).count() == 3


def test_star_schema_audit_healthy_and_detects_violations(spark, sf_dir):
    """The driver tables pass every relational invariant; a corrupted
    frame is caught by the same checks."""
    from pyspark.sql import functions as F

    from ubparquet_spark.io import load_table
    from ubparquet_spark.quality import (
        audit_star_schema,
        check_derived_column,
        check_referential_integrity,
    )

    assert all(v == 0 for v in audit_star_schema(spark, sf_dir).values())

    # inject an orphan FK and a derived-column lie; both must be caught
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    bad_orders = orders.withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") == 0, F.lit(10**9)).otherwise(F.col("o_custkey")),
    )
    orphans = check_referential_integrity(
        bad_orders, cust, "o_custkey", "c_custkey"
    ).collect()
    assert [r["orphan_key"] for r in orphans] == [10**9]

    docs = load_table(spark, sf_dir, "documents")
    bad_docs = docs.withColumn(
        "n_chars",
        F.when(F.col("doc_id") == 1, F.lit(-5)).otherwise(F.col("n_chars")),
    )
    bad = check_derived_column(
        bad_docs, "n_chars", F.length("text").cast("long"), ["doc_id"]
    ).collect()
    assert len(bad) == 1 and bad[0]["doc_id"] == 1 and bad[0]["stored"] == -5
