"""Morton key correctness vs numpy bit interleaving + clustering property."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from ubparquet_spark.operators import zorder


def _morton3_np(x, y, z, bits=10):
    out = np.zeros_like(x, dtype=np.int64)
    for b in range(bits):
        out |= ((x >> b) & 1) << (3 * b)
        out |= ((y >> b) & 1) << (3 * b + 1)
        out |= ((z >> b) & 1) << (3 * b + 2)
    return out


def test_morton_key_matches_numpy(spark):
    rng = np.random.default_rng(11)
    xyz = rng.integers(0, 1024, (200, 3)).astype(np.int64)
    df = spark.createDataFrame(
        [(int(i), int(a), int(b), int(c)) for i, (a, b, c) in enumerate(xyz)],
        "id long, xb long, yb long, zb long",
    )
    got = {
        r.id: r.key
        for r in df.select(
            "id", zorder.morton3_key("xb", "yb", "zb").alias("key")
        ).collect()
    }
    expected = _morton3_np(xyz[:, 0], xyz[:, 1], xyz[:, 2])
    for i in range(len(xyz)):
        assert got[i] == int(expected[i])


def test_zorder_write_clusters_rows(spark, tmp_path):
    """Neighboring points land in the same file; far points do not mix: the
    per-file Morton ranges must be (nearly) disjoint after a range write."""
    rng = np.random.default_rng(3)
    pts = rng.uniform(0, 256, (4000, 3))
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in pts],
        "x double, y double, z double",
    )
    out = str(tmp_path / "zsorted")
    zorder.write_zordered(df, out, bin_size=4.0, n_files=8)
    back = spark.read.parquet(out).withColumn(
        "file", F.element_at(F.split(F.input_file_name(), "/"), -1)
    )
    ranges = {
        r.file: (r.lo, r.hi)
        for r in back.groupBy("file")
        .agg(F.min("zorder").alias("lo"), F.max("zorder").alias("hi"))
        .collect()
    }
    spans = sorted(ranges.values())
    assert len(spans) >= 2
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2  # range partitioning: files cover disjoint key ranges
