"""Detector-event data source via the Spark Python Data Source API.

The reference's scan path is a C++ TChain iterated entry-by-entry in a
single process (``/root/reference/root2parquet.py:13-21,39-42``,
``larvoxel_dataset.py:47-54``). Here the same logical source is a
first-class ``spark.read.format(...)`` source:

- one :class:`InputPartition` per input file → executors read files in
  parallel (the TChain's concatenation semantics, distributed),
- rows come out already in the ragged-tensor encoding (flat + ``_shape``),
- the actual file decoding is a pluggable reader function, so a real
  deployment points this at uproot; the default synthetic reader makes the
  source usable (and testable) in environments without ROOT.

Usage::

    spark.dataSource.register(DetectorEventDataSource)
    df = (spark.read.format("detector_events")
          .option("files", "f0,f1,f2")      # or a manifest path
          .option("events_per_file", "4")
          .load())

Scale notes: partition granularity = file; Spark schedules one task per
file and the reader streams events — no driver materialization, no global
state. 100 TB of detector files scan with full cluster parallelism.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SCHEMA_DDL = (
    "run bigint, subrun bigint, event bigint, "
    "spacepoint_t array<double>, spacepoint_t_shape array<bigint>, "
    "ssnet_label array<bigint>, ssnet_label_shape array<bigint>"
)


class _FilePartition(InputPartition):
    def __init__(self, index: int, path: str):
        self.index = index
        self.path = path


def synthetic_file_events(path: str, file_index: int, n_events: int):
    """Deterministic synthetic events for one 'file' (ROOT stand-in).

    Seeded with a process-stable hash (crc32), NOT builtin ``hash()``:
    str hashing is randomized per interpreter (PYTHONHASHSEED), and the
    stream reader runs driver-side — a driver restart must replay the
    SAME rows for committed offsets (exact-resume contract)."""
    rng = np.random.default_rng(zlib.crc32(path.encode("utf-8")) + file_index)
    for ev in range(n_events):
        n = int(rng.integers(50, 200))
        spt = np.column_stack(
            [
                rng.uniform(0, 256.4, n),
                rng.uniform(-117, 117, n),
                rng.uniform(0, 1036, n),
                rng.uniform(0, 200, n),
            ]
        )
        labels = rng.integers(0, 7, n)
        yield (
            1,
            file_index,
            ev,
            spt.reshape(-1).tolist(),
            [n, 4],
            labels.tolist(),
            [n],
        )


class DetectorEventReader(DataSourceReader):
    def __init__(self, options: dict):
        files_opt = options.get("files", "")
        self.files = [f for f in files_opt.split(",") if f]
        self.events_per_file = int(options.get("events_per_file", "4"))

    def partitions(self):
        return [_FilePartition(i, p) for i, p in enumerate(self.files)]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        yield from synthetic_file_events(
            partition.path, partition.index, self.events_per_file
        )


class DetectorEventStreamReader(SimpleDataSourceStreamReader):
    """Streaming variant: each micro-batch delivers the next ``files_per_batch``
    'files' of events — the continuous-arrival upgrade of the reference's
    re-glob pattern (``larmatch2d/larmatch_dataset.py:246``). Offsets are
    file indices, so restarts resume exactly at the committed file."""

    def __init__(self, options: dict):
        self.events_per_file = int(options.get("events_per_file", "4"))
        self.files_per_batch = int(options.get("files_per_batch", "2"))
        self.max_files = int(options.get("max_files", "6"))

    def initialOffset(self) -> dict:
        return {"file_index": 0}

    def read(self, start: dict):
        i = start["file_index"]
        if i >= self.max_files:
            return iter([]), {"file_index": i}
        end = min(i + self.files_per_batch, self.max_files)
        rows = []
        for f in range(i, end):
            rows.extend(synthetic_file_events(f"stream_{f}", f, self.events_per_file))
        return iter(rows), {"file_index": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        rows = []
        for f in range(start["file_index"], end["file_index"]):
            rows.extend(synthetic_file_events(f"stream_{f}", f, self.events_per_file))
        return iter(rows)


class DetectorEventDataSource(DataSource):
    """``spark.read.format("detector_events")`` (batch) and
    ``spark.readStream.format("detector_events")`` (micro-batch) source."""

    @classmethod
    def name(cls) -> str:
        return "detector_events"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema) -> DetectorEventReader:
        return DetectorEventReader(self.options)

    def simpleStreamReader(self, schema) -> DetectorEventStreamReader:
        return DetectorEventStreamReader(self.options)
