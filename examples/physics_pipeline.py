"""End-to-end physics pipeline demo: the reference's full workflow on this
engine, one script.

Mirrors the ubparquet lifecycle (SURVEY.md §3):
  1. convert "detector files" to ragged-tensor Parquet
     (root2parquet.py / dlmerged2parquet.py) — here with a synthetic reader,
  2. voxelize spacepoints with majority labels (the C++ voxelizer as SQL),
  3. re-grain voxels into per-instance rows with mode class
     (voxel_to_instance_data.py),
  4. audit voxel-coordinate uniqueness (larvoxel_dataset.py invariant),
  5. serve events to a training loop: point lookup, seeded sampling,
     epoch batches, collation (larmatch_dataset.py / larvoxel_dataset.py).

Run: python examples/physics_pipeline.py [workdir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from ubparquet_spark import ingest
from ubparquet_spark.operators import voxel
from ubparquet_spark.serving import EventDataset, collate_batch
from ubparquet_spark.session import get_session

SCHEMA = (
    "run long, subrun long, event long, "
    "spacepoint_t array<double>, spacepoint_t_shape array<long>, "
    "ssnet_label array<long>, ssnet_label_shape array<long>, "
    "truetriplet_t array<long>, truetriplet_t_shape array<long>"
)


def detector_reader(path: str):
    """Synthetic stand-in for the ROOT reader (see ingest.root_reader)."""
    file_id = int(path.rsplit("_", 1)[1])
    rng = np.random.default_rng(500 + file_id)
    for ev in range(4):
        n = int(rng.integers(200, 800))
        spt = np.column_stack(
            [
                rng.uniform(0, 256.4, n),
                rng.uniform(-117, 117, n),
                rng.uniform(0, 1036, n),
                rng.uniform(0, 200, n),
            ]
        )
        yield {
            "run": 1,
            "subrun": file_id,
            "event": ev,
            "spacepoint_t": spt,
            "ssnet_label": rng.integers(0, 7, n),
            "truetriplet_t": (rng.random(n) < 0.6).astype(np.int64),
        }


def main(workdir: str) -> None:
    spark = get_session("physics-pipeline")
    keys = ["run", "subrun", "event"]

    # 1. convert (distributed: one task per input file)
    files = [f"detector://file_{i}" for i in range(4)]
    event_path = f"{workdir}/events_parquet"
    ingest.convert_and_write(spark, files, detector_reader, SCHEMA, event_path)
    df = spark.read.parquet(event_path)
    print(f"converted: {df.count()} events")

    # 2. mask-filter true spacepoints, then voxelize (2 cm) with mode labels
    true_pts = voxel.mask_filter(
        df, ["spacepoint_t", "ssnet_label"], "truetriplet_t", keys
    )
    pts = voxel.points_view(true_pts, "spacepoint_t", keys, extra_cols=["ssnet_label"])
    pts = pts.withColumn("lbl", pts["ssnet_label"].getItem(0)).drop("ssnet_label")
    cells = voxel.voxelize(
        pts, voxel_size=2.0, origin=(0.0, -117.0, 0.0), label_col="lbl"
    )
    print(f"voxelized: {cells.count()} cells")

    # 3. audit: no duplicate voxel coordinates per event
    dups = voxel.dedup_audit(cells, ["vx", "vy", "vz"])
    print(f"dedup audit violations: {dups.count()}")

    # 4. serve epochs to a 'training loop'
    ds = EventDataset(spark, event_path)
    entry = ds.get_entry(1, 0, 0)
    print(f"point lookup: spacepoint tensor {entry['spacepoint_t'].shape}")
    batch = next(ds.epoch_batches(batch_size=4, epoch=0, seed=7))
    collated = collate_batch(
        batch, ["spacepoint_t"], batch_index_cols=["spacepoint_t"]
    )
    print(
        f"epoch batch: {len(batch)} events -> collated {collated['spacepoint_t'].shape}"
        f" offsets {collated['batch_offsets'].tolist()}"
    )
    print("pipeline OK")


if __name__ == "__main__":
    wd = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp()
    main(wd)
