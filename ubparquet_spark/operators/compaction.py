"""Small-file compaction planning — the table-maintenance operator a
100 TB lake needs continuously.

Streaming sinks, per-partition writers, and incremental CDC merges leave
tables as thousands of undersized part files; every downstream scan then
pays one task + one footer read + one open per file, and the NameNode /
object-store listing itself becomes a bottleneck.  The standard remedy
(Delta OPTIMIZE, Iceberg rewrite_data_files) is: group small files into
~target-size output groups, rewrite each group as one file, leave
already-big files alone.

``plan_compaction`` is the PLANNER: given a file manifest (path, bytes —
exactly what a ``LIST`` / ``input_file_name()`` pass produces), it assigns
every under-target file to an output group such that

- groups are filled size-DESCENDING first-fit-style (a deterministic
  greedy cumulative-sum bin assignment: files sorted by (bytes DESC,
  path), group = floor(running_bytes_before / target)), so every group
  except possibly the last per partition-bucket is >= ~target/2 full and
  no group exceeds target + one file;
- files already >= ``target_bytes`` are passed through untouched
  (``group = NULL``, ``action = 'keep'``) — rewriting a big file is pure
  write amplification;
- planning is per ``partition_cols`` bucket when given (files from
  different hive partitions must not merge — their rows belong to
  different directories).

The planner is a DataFrame program (one ranked pass over the manifest —
the manifest is file-grain, MILLIONS of rows at 100 TB, not billions, but
still far too big for the driver), so it composes with any executor:
``compact_parquet_dir`` applies a plan to a local directory by reading
each group and rewriting it as one file (the local[32] twin of the
cluster rewrite job; at scale you'd submit one job per group batch).

Determinism: ties in size break on path, so the same manifest always
yields the same plan — safe to re-run after a partial failure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def plan_compaction(
    manifest: DataFrame,
    target_bytes: int,
    *,
    path_col: str = "path",
    size_col: str = "bytes",
    partition_cols: list[str] | None = None,
    min_bytes: int | None = None,
) -> DataFrame:
    """``manifest`` + (``action``, ``group``): ``action`` ∈ {'keep',
    'rewrite'}; ``group`` is a 0-based output-group id per partition
    bucket (NULL for kept files).

    Files of at least ``min_bytes`` (default ¾ × target, the Iceberg
    rewrite convention) are healthy and kept — compaction OUTPUT lands
    around target, so the keep threshold must sit below target or every
    maintenance cycle would rewrite the previous cycle's output forever.
    A rewrite group that would contain exactly ONE file is demoted to
    'keep' (rewriting a lone file achieves nothing).  With both rules
    the maintenance loop CONVERGES: every applied pass merges >= 2 files
    per group, so the file count strictly decreases until no multi-file
    group remains and the plan is empty — the same fixpoint contract as
    Iceberg/Delta bin-packing (single-pass idempotence is not guaranteed
    for adversarial size distributions; a group can land under
    ``min_bytes`` and merge once more next pass).

    The greedy rule: within each partition bucket, order under-threshold
    files by (bytes DESC, path) and put a file in
    ``group = floor(cumulative_bytes_before_it / target_bytes)``.
    Size-descending order gives the first-fit-decreasing flavour: big
    fragments seed groups, slivers top them up, and every group's
    content is <= target_bytes + (its first file).
    """
    from ubparquet_spark.operators.ranks import blocked_cumsum

    if target_bytes <= 0:
        raise ValueError(f"target_bytes must be positive, got {target_bytes}")
    if min_bytes is None:
        min_bytes = (3 * target_bytes) // 4
    if not (0 < min_bytes <= target_bytes):
        raise ValueError(
            f"min_bytes must be in (0, target_bytes], got {min_bytes}"
        )
    parts = list(partition_cols or [])
    small = manifest.filter(F.col(size_col) < min_bytes)
    big = manifest.filter(F.col(size_col) >= min_bytes).select(
        *manifest.columns,
        F.lit("keep").alias("action"),
        F.lit(None).cast("long").alias("group"),
    )
    # blocked_cumsum orders ascending; cumulate on negated size so the
    # walk is size-DESCENDING, path tie-break keeps the order total
    # (order_cols must be unique — paths are).
    ordered = small.withColumn("_negb", -F.col(size_col))
    summed = blocked_cumsum(
        ordered,
        ["_negb", path_col],
        {"_before": (size_col, "exclusive")},
        part_cols=parts or None,
    )
    grouped = summed.withColumn(
        "_g",
        F.floor(F.col("_before") / F.lit(int(target_bytes))).cast("long"),
    )
    # demote singleton groups: count over the (bucket, group) key — a
    # window over the already-bounded plan artifact, <= files-per-group
    # rows per partition
    wg = Window.partitionBy(*parts, "_g")
    planned = grouped.withColumn(
        "_gn", F.count(F.lit(1)).over(wg)
    ).select(
        *manifest.columns,
        F.when(F.col("_gn") > 1, F.lit("rewrite"))
        .otherwise(F.lit("keep"))
        .alias("action"),
        F.when(F.col("_gn") > 1, F.col("_g")).alias("group"),
    )
    return big.unionByName(planned)


def compaction_summary(plan: DataFrame, *, size_col: str = "bytes") -> DataFrame:
    """Per-action rollup of a plan: files, bytes, output groups — the
    numbers an operator reviews before paying for the rewrite."""
    return plan.groupBy("action").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum(size_col).cast("long").alias("n_bytes"),
        F.countDistinct("group").alias("n_groups"),
    )


def build_manifest(spark, directory: str) -> DataFrame:
    """Local-FS manifest helper for tests/examples: (path, bytes) for the
    parquet part files under ``directory``.  On a cluster the manifest
    comes from the catalog / object-store listing instead."""
    import os

    rows = [
        (os.path.join(directory, f), os.path.getsize(os.path.join(directory, f)))
        for f in sorted(os.listdir(directory))
        if f.endswith(".parquet")
    ]
    return spark.createDataFrame(rows, "path string, bytes long")


def compact_parquet_dir(
    spark, directory: str, target_bytes: int, *, out_dir: str
) -> DataFrame:
    """Apply a compaction plan to a local parquet directory: each rewrite
    group becomes ONE output file (coalesce(1) per group read — the
    local[32] twin of a cluster rewrite job); kept files are copied
    through unchanged.  Returns the plan that was applied."""
    import os
    import shutil

    plan = plan_compaction(build_manifest(spark, directory), target_bytes)
    rows = plan.collect()  # file-grain and local-only by contract
    os.makedirs(out_dir, exist_ok=True)
    for r in rows:
        if r["action"] == "keep":
            shutil.copy(r["path"], os.path.join(out_dir, os.path.basename(r["path"])))
    groups: dict[int, list[str]] = {}
    for r in rows:
        if r["action"] == "rewrite":
            groups.setdefault(int(r["group"]), []).append(r["path"])
    for gid, paths in sorted(groups.items()):
        (
            spark.read.parquet(*paths)
            .coalesce(1)
            .write.mode("append")
            .parquet(out_dir)
        )
    return plan


def apply_compaction_distributed(
    spark, plan: DataFrame, *, out_dir: str, partition_cols: list[str] | None = None
) -> DataFrame:
    """Distributed APPLY (round 11, VERDICT r10 #7): execute a
    ``plan_compaction`` plan with ONE executor task per rewrite group —
    the cluster-shaped path ``compact_parquet_dir``'s driver-side loop
    stands in for locally.

    Each rewrite group's row set is collapsed to one (group, paths) row;
    the group table is hash-repartitioned on ``group`` so groups spread
    across executors, and a ``mapInPandas`` stage reads each group's
    files with pyarrow and writes exactly one merged output file.  Kept
    files copy through in their own tasks.  No driver-side loop over
    groups — the driver only triggers the job and receives the per-file
    stats rollup (group-grain, bounded by the plan size).

    Crash/retry safety: output names are deterministic functions of the
    group id (or source basename), and writes overwrite — a re-run or a
    speculative duplicate task converges to the same bytes, the same
    idempotence contract as the planner.  ``out_dir`` must be shared
    storage (object store / DFS) on a real cluster; executor-local ==
    driver-local under local[*].

    ``partition_cols`` must name the same bucket columns the plan was
    built with (group ids restart per bucket): they join the group key
    and the output filename, so two buckets never merge.

    Returns the stats frame: (action, group, n_files, out_path) — one
    row per output file, already materialized (the writes have run)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    parts = list(partition_cols or [])

    groups = (
        plan.filter(F.col("action") == "rewrite")
        .groupBy(*parts, "group")
        .agg(F.sort_array(F.collect_list("path")).alias("paths"))
        .withColumn(
            "_bucket",
            F.concat_ws(
                "-", *[F.col(c).cast("string") for c in parts]
            )
            if parts
            else F.lit(""),
        )
        .repartition(*parts, "group")
    )

    def _rewrite(batches):
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        for pdf in batches:
            out = []
            for gid, bucket, paths in zip(
                pdf["group"], pdf["_bucket"], pdf["paths"]
            ):
                tables = [pq.read_table(p) for p in paths]
                merged = pa.concat_tables(tables)
                tag = f"{bucket}-" if bucket else ""
                dst = os.path.join(
                    out_dir, f"part-compact-{tag}g{int(gid):06d}.parquet"
                )
                pq.write_table(merged, dst)
                out.append(("rewrite", int(gid), len(paths), dst))
            yield pd.DataFrame(
                out, columns=["action", "group", "n_files", "out_path"]
            )

    def _copy(batches):
        import shutil

        import pandas as pd

        for pdf in batches:
            out = []
            for p in pdf["path"]:
                dst = os.path.join(out_dir, os.path.basename(p))
                shutil.copy(p, dst)
                out.append(("keep", None, 1, dst))
            yield pd.DataFrame(
                out, columns=["action", "group", "n_files", "out_path"]
            )

    stats_schema = (
        "action string, group long, n_files int, out_path string"
    )
    rewritten = groups.mapInPandas(_rewrite, stats_schema)
    kept = (
        plan.filter(F.col("action") == "keep")
        .select("path")
        .mapInPandas(_copy, stats_schema)
    )
    stats = rewritten.unionByName(kept).localCheckpoint()  # runs the writes
    return stats


def compact_parquet_dir_distributed(
    spark, directory: str, target_bytes: int, *, out_dir: str
) -> DataFrame:
    """Plan + distributed apply for a local parquet directory — the
    executor-parallel twin of :func:`compact_parquet_dir` (same plan,
    same convergence contract, writes happen in executor tasks)."""
    plan = plan_compaction(build_manifest(spark, directory), target_bytes)
    apply_compaction_distributed(spark, plan, out_dir=out_dir)
    return plan
