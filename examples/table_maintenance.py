"""Table-maintenance workflow demo: the small-files problem, end to end.

A streaming sink fragments a table into dozens of undersized part files;
this script shows the maintenance loop a 100 TB lake runs continuously:

  1. fragment a table the way a micro-batch file sink would,
  2. build the file manifest and PLAN compaction
     (``operators.compaction.plan_compaction`` — deterministic
     size-descending grouping, big files passed through),
  3. review the plan summary (files/bytes/groups per action),
  4. APPLY it (each rewrite group becomes one file),
  5. verify: fewer files, byte-identical content (count + checksum),
  6. re-plan on the compacted output — the loop CONVERGES: every applied
     pass merges >= 2 files per group, so the count strictly shrinks to
     a fixpoint (a small tail group may merge once more; that's the same
     contract Iceberg/Delta bin-packing gives).

Run: python examples/table_maintenance.py [sf_dir] [workdir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from ubparquet_spark.operators.compaction import (
    build_manifest,
    compact_parquet_dir,
    compaction_summary,
    plan_compaction,
)
from ubparquet_spark.session import get_session


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    work = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="maint_")
    spark = get_session("table-maintenance")

    frag = os.path.join(work, "orders_fragmented")
    out = os.path.join(work, "orders_compacted")

    # 1. fragment: 40 small shards, the micro-batch-sink pathology
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    orders.repartition(40).write.mode("overwrite").parquet(frag)

    # 2. manifest -> plan (~4 target files)
    manifest = build_manifest(spark, frag)
    total = manifest.agg(F.sum("bytes")).collect()[0][0]
    target = int(total // 4) + 1
    plan = plan_compaction(manifest, target)

    # 3. review
    print(f"manifest: {manifest.count()} files, {total} bytes, target {target}")
    compaction_summary(plan).show()

    # 4. apply
    compact_parquet_dir(spark, frag, target, out_dir=out)

    # 5. verify
    def checksum(path: str):
        df = spark.read.parquet(path)
        return (
            df.count(),
            df.agg(
                F.sum(F.crc32(F.concat_ws("|", *sorted(df.columns))))
            ).collect()[0][0],
        )

    before, after = checksum(frag), checksum(out)
    n_before = len([f for f in os.listdir(frag) if f.endswith(".parquet")])
    n_after = len([f for f in os.listdir(out) if f.endswith(".parquet")])
    print(f"files: {n_before} -> {n_after}; rows+checksum equal: {before == after}")
    assert before == after and n_after < n_before

    # 6. idempotence: the compacted table needs (almost) no rewrites
    replan = plan_compaction(build_manifest(spark, out), target)
    n_rewrite = replan.filter(F.col("action") == "rewrite").count()
    print(f"re-plan on compacted output: {n_rewrite} files would rewrite")
    spark.stop()


if __name__ == "__main__":
    main()
