"""Small-file compaction planner: plan properties, determinism, and the
apply path (content-preserving rewrite into ~target-size files)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from ubparquet_spark.operators.compaction import (
    build_manifest,
    compact_parquet_dir,
    compaction_summary,
    plan_compaction,
)

TARGET = 1000


def _manifest(spark, sizes, parts=None):
    if parts is None:
        rows = [(f"f{i:04d}", s) for i, s in enumerate(sizes)]
        return spark.createDataFrame(rows, "path string, bytes long")
    rows = [(f"f{i:04d}", s, p) for i, (s, p) in enumerate(zip(sizes, parts))]
    return spark.createDataFrame(rows, "path string, bytes long, pkey string")


def _check_plan(rows, sizes_by_path, target):
    """The planner's contract, checked exhaustively on a collected plan."""
    groups: dict = {}
    for r in rows:
        if r["action"] == "keep":
            assert sizes_by_path[r["path"]] >= target
            assert r["group"] is None
        else:
            assert sizes_by_path[r["path"]] < target
            key = (r["pkey"] if "pkey" in r.__fields__ else None, r["group"])
            groups.setdefault(key, []).append(sizes_by_path[r["path"]])
    for (_, gid), sizes in groups.items():
        # no group exceeds target + its largest member (< 2x target)
        assert sum(sizes) < target + max(sizes)
    # group ids are dense from 0 per partition bucket
    by_bucket: dict = {}
    for (bucket, gid), _ in groups.items():
        by_bucket.setdefault(bucket, set()).add(gid)
    for gids in by_bucket.values():
        assert gids == set(range(len(gids)))


def test_plan_properties_and_determinism(spark):
    rng = random.Random(7)
    sizes = [rng.randrange(1, 2500) for _ in range(200)]
    m = _manifest(spark, sizes)
    plan1 = plan_compaction(m, TARGET).collect()
    plan2 = plan_compaction(m, TARGET).collect()
    sizes_by_path = {f"f{i:04d}": s for i, s in enumerate(sizes)}
    _check_plan(plan1, sizes_by_path, TARGET)
    assert sorted(map(tuple, plan1)) == sorted(map(tuple, plan2))
    # every file appears exactly once
    assert sorted(r["path"] for r in plan1) == sorted(sizes_by_path)
    # all small-file bytes land in rewrite groups; kept bytes untouched
    total_small = sum(s for s in sizes if s < TARGET)
    assert (
        sum(sizes_by_path[r["path"]] for r in plan1 if r["action"] == "rewrite")
        == total_small
    )


def test_plan_respects_partition_buckets(spark):
    sizes = [100, 200, 300, 400, 1500, 250]
    parts = ["a", "a", "b", "b", "a", "b"]
    m = _manifest(spark, sizes, parts)
    plan = plan_compaction(
        m, TARGET, partition_cols=["pkey"]
    ).collect()
    sizes_by_path = {f"f{i:04d}": s for i, s in enumerate(sizes)}
    _check_plan(plan, sizes_by_path, TARGET)
    # files from different hive partitions never share a group id WITHIN
    # the same bucket key (group ids are per-bucket, so the pair
    # (pkey, group) is the output unit)
    seen = {}
    for r in plan:
        if r["action"] == "rewrite":
            seen.setdefault((r["pkey"], r["group"]), []).append(r["path"])
    assert ("a", 0) in seen and ("b", 0) in seen


def test_summary_counts(spark):
    sizes = [100] * 10 + [5000]
    m = _manifest(spark, sizes)
    s = {
        r["action"]: r
        for r in compaction_summary(plan_compaction(m, TARGET)).collect()
    }
    assert s["keep"]["n_files"] == 1 and s["keep"]["n_bytes"] == 5000
    assert s["rewrite"]["n_files"] == 10 and s["rewrite"]["n_bytes"] == 1000
    assert s["keep"]["n_groups"] == 0 and s["rewrite"]["n_groups"] == 1


def test_compact_parquet_dir_preserves_content(spark, tmp_path):
    """Apply path: fragmented directory -> fewer files, identical rows."""
    src = str(tmp_path / "frag")
    out = str(tmp_path / "compacted")
    df = spark.range(0, 5000).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    )
    # 25 small shards
    df.repartition(25).write.parquet(src)
    import os

    n_before = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    manifest = build_manifest(spark, src)
    assert manifest.count() == n_before
    target = int(
        manifest.agg(F.sum("bytes")).collect()[0][0] // 3
    )  # aim for ~3-4 output files
    compact_parquet_dir(spark, src, target, out_dir=out)
    n_after = len([f for f in os.listdir(out) if f.endswith(".parquet")])
    assert n_after < n_before
    got = spark.read.parquet(out)
    assert got.count() == 5000
    assert got.agg(F.sum("v")).collect()[0][0] == df.agg(F.sum("v")).collect()[0][0]
    assert got.select(F.countDistinct("id")).collect()[0][0] == 5000


def test_invalid_target_raises(spark):
    import pytest

    m = _manifest(spark, [10, 20])
    with pytest.raises(ValueError, match="target_bytes"):
        plan_compaction(m, 0)
