"""Small-file compaction planner: plan properties, determinism,
idempotence, and the apply path (content-preserving rewrite)."""

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
MIN = (3 * TARGET) // 4  # the default keep threshold


def _manifest(spark, sizes, parts=None):
    if parts is None:
        rows = [(f"f{i:04d}", s) for i, s in enumerate(sizes)]
        return spark.createDataFrame(rows, "path string, bytes long")
    rows = [(f"f{i:04d}", s, p) for i, (s, p) in enumerate(zip(sizes, parts))]
    return spark.createDataFrame(rows, "path string, bytes long, pkey string")


def _check_plan(rows, sizes_by_path, target, min_bytes, n_buckets=1):
    """The planner's contract, checked exhaustively on a collected plan."""
    groups: dict = {}
    for r in rows:
        bucket = r["pkey"] if "pkey" in r.__fields__ else None
        if r["action"] == "keep":
            assert r["group"] is None
        else:
            assert sizes_by_path[r["path"]] < min_bytes
            assert r["group"] is not None
            groups.setdefault((bucket, r["group"]), []).append(
                sizes_by_path[r["path"]]
            )
    for sizes in groups.values():
        assert len(sizes) >= 2  # singleton groups are demoted to keep
        # no group exceeds target + its largest member
        assert sum(sizes) < target + max(sizes)


def test_plan_properties_and_determinism(spark):
    rng = random.Random(7)
    sizes = [rng.randrange(1, 2500) for _ in range(200)]
    m = _manifest(spark, sizes)
    plan1 = plan_compaction(m, TARGET).collect()
    plan2 = plan_compaction(m, TARGET).collect()
    sizes_by_path = {f"f{i:04d}": s for i, s in enumerate(sizes)}
    _check_plan(plan1, sizes_by_path, TARGET, MIN)
    assert sorted(map(tuple, plan1)) == sorted(map(tuple, plan2))
    # every file appears exactly once
    assert sorted(r["path"] for r in plan1) == sorted(sizes_by_path)
    # healthy files (>= min) are always kept
    for r in plan1:
        if sizes_by_path[r["path"]] >= MIN:
            assert r["action"] == "keep"


def test_maintenance_loop_converges(spark):
    """The fixpoint contract: every applied pass merges >= 2 files per
    group, so the file count strictly decreases until the plan is empty
    (single-pass idempotence is NOT promised; convergence is)."""
    rng = random.Random(13)
    sizes = {f"f{i:04d}": rng.randrange(1, 900) for i in range(150)}
    passes = 0
    while True:
        plan = plan_compaction(
            _manifest(spark, [sizes[k] for k in sorted(sizes)]), TARGET
        ).collect()
        relabel = {f"f{i:04d}": k for i, k in enumerate(sorted(sizes))}
        rewrites = [r for r in plan if r["action"] == "rewrite"]
        if not rewrites:
            break
        passes += 1
        assert passes <= 8, "maintenance loop failed to converge"
        nxt = {}
        for r in plan:
            s_ = sizes[relabel[r["path"]]]
            if r["action"] == "keep":
                nxt[f"k{passes}_{relabel[r['path']]}"] = s_
            else:
                key = f"g{passes}_{r['group']:04d}"
                nxt[key] = nxt.get(key, 0) + s_
        assert len(nxt) < len(sizes)  # strictly fewer files each pass
        sizes = nxt
    assert passes >= 1


def test_plan_respects_partition_buckets(spark):
    sizes = [100, 200, 300, 400, 1500, 250]
    parts = ["a", "a", "b", "b", "a", "b"]
    m = _manifest(spark, sizes, parts)
    plan = plan_compaction(m, TARGET, partition_cols=["pkey"]).collect()
    sizes_by_path = {f"f{i:04d}": s for i, s in enumerate(sizes)}
    _check_plan(plan, sizes_by_path, TARGET, MIN, n_buckets=2)
    seen = {}
    for r in plan:
        if r["action"] == "rewrite":
            seen.setdefault((r["pkey"], r["group"]), []).append(r["path"])
    # small files merged within their own hive partition, never across
    assert ("a", 0) in seen and ("b", 0) in seen
    assert sorted(seen[("a", 0)]) == ["f0000", "f0001"]
    assert sorted(seen[("b", 0)]) == ["f0002", "f0003", "f0005"]


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
    """Apply path: fragmented directory -> fewer files, identical rows,
    and the maintenance loop converges (re-plan finds no rewrites)."""
    src = str(tmp_path / "frag")
    out = str(tmp_path / "compacted")
    df = spark.range(0, 5000).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    )
    df.repartition(25).write.parquet(src)
    import os

    n_before = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    manifest = build_manifest(spark, src)
    assert manifest.count() == n_before
    target = int(manifest.agg(F.sum("bytes")).collect()[0][0] // 3) + 1
    compact_parquet_dir(spark, src, target, out_dir=out)
    n_after = len([f for f in os.listdir(out) if f.endswith(".parquet")])
    assert n_after < n_before
    got = spark.read.parquet(out)
    assert got.count() == 5000
    assert got.agg(F.sum("v")).collect()[0][0] == df.agg(F.sum("v")).collect()[0][0]
    assert got.select(F.countDistinct("id")).collect()[0][0] == 5000
    # convergence in the applied loop: any remaining rewrite group must
    # hold >= 2 files, so one more pass would strictly reduce the count
    replan = plan_compaction(build_manifest(spark, out), target)
    regroups = (
        replan.filter(F.col("action") == "rewrite")
        .groupBy("group")
        .count()
        .collect()
    )
    assert all(r["count"] >= 2 for r in regroups)


def test_invalid_target_raises(spark):
    import pytest

    m = _manifest(spark, [10, 20])
    with pytest.raises(ValueError, match="target_bytes"):
        plan_compaction(m, 0)
    with pytest.raises(ValueError, match="min_bytes"):
        plan_compaction(m, 100, min_bytes=200)


def test_distributed_apply_matches_local_apply(spark, tmp_path):
    """The executor-parallel apply (round 11) must preserve content and
    converge exactly like the driver-side loop, on a multi-partition
    fragmented fixture."""
    import os

    from ubparquet_spark.operators.compaction import (
        compact_parquet_dir_distributed,
    )

    src = str(tmp_path / "frag_d")
    out = str(tmp_path / "compacted_d")
    df = spark.range(0, 5000).select(
        F.col("id"), (F.col("id") * 3).alias("v")
    )
    df.repartition(25).write.parquet(src)
    n_before = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    manifest = build_manifest(spark, src)
    target = int(manifest.agg(F.sum("bytes")).collect()[0][0] // 3) + 1
    plan = compact_parquet_dir_distributed(spark, src, target, out_dir=out)
    n_after = len([f for f in os.listdir(out) if f.endswith(".parquet")])
    assert n_after < n_before
    # content preservation: same rows, no dup, no loss
    got = spark.read.parquet(out)
    assert got.count() == 5000
    assert got.select(F.countDistinct("id")).collect()[0][0] == 5000
    assert (
        got.agg(F.sum("v")).collect()[0][0]
        == df.agg(F.sum("v")).collect()[0][0]
    )
    # one output file per rewrite group + one per kept file
    n_groups = len(
        {r["group"] for r in plan.collect() if r["action"] == "rewrite"}
    )
    n_keep = plan.filter("action = 'keep'").count()
    assert n_after == n_groups + n_keep
    # convergence contract through the distributed path
    replan = plan_compaction(build_manifest(spark, out), target)
    regroups = (
        replan.filter(F.col("action") == "rewrite")
        .groupBy("group")
        .count()
        .collect()
    )
    assert all(r["count"] >= 2 for r in regroups)


def test_distributed_apply_respects_partition_buckets(spark, tmp_path):
    """Bucketed plans: group ids restart per bucket — the distributed
    apply must key groups by (bucket, group) and never merge across
    buckets."""
    import os

    import pyarrow.parquet as pq
    import duckdb

    from ubparquet_spark.operators.compaction import (
        apply_compaction_distributed,
    )

    src = tmp_path / "bucketed"
    src.mkdir()
    # two hive-style buckets, 4 tiny files each, with a bucket column
    for b in ("x", "y"):
        for i in range(4):
            duckdb.sql(
                f"COPY (SELECT j AS id, '{b}' AS pkey FROM range({i * 10},"
                f" {i * 10 + 10}) t(j)) TO"
                f" '{src}/{b}{i}.parquet' (FORMAT PARQUET)"
            )
    manifest = build_manifest(spark, str(src)).withColumn(
        "pkey", F.expr("substring(reverse(split(path, '/'))[0], 1, 1)")
    )
    plan = plan_compaction(manifest, 10**6, partition_cols=["pkey"])
    assert plan.filter("action = 'rewrite'").count() == 8
    out = str(tmp_path / "bucketed_out")
    stats = apply_compaction_distributed(
        spark, plan, out_dir=out, partition_cols=["pkey"]
    )
    outs = sorted(r["out_path"] for r in stats.collect())
    assert len(outs) == 2  # one merged file per bucket, none across
    for p in outs:
        t = pq.read_table(p)
        assert len(set(t["pkey"].to_pylist())) == 1  # bucket purity
        assert len(t) == 40
    got = spark.read.parquet(out)
    assert got.count() == 80
    assert got.select(F.countDistinct("pkey")).collect()[0][0] == 2
