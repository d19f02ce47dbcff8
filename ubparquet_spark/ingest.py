"""Ingestion: event-source files → ragged-tensor Parquet, distributed.

The reference converters (``/root/reference/root2parquet.py:13-85``,
``dlmerged2parquet.py:122-291``) run single-process: loop entries, build a
dict of per-column lists in driver memory, write one Parquet file at the
end. That caps at RAM and one core (SURVEY.md §3.1). Here the same job is a
Spark pipeline:

  file list → repartition → per-partition read+encode (mapInPandas) →
  distributed sorted Parquet write

ROOT ingestion itself is environment-gated: Spark cannot read ROOT natively
and this container has no ``uproot``; pass any ``reader`` callable
(``path -> iterator of event dicts``) — a real deployment plugs an
uproot-based reader, tests use a deterministic synthetic one. The encode
step (numpy → flatten+shape columns) is the reference's exact convention
(``root2parquet.py:72-80``).

Scale notes: one task per input file (or bundle), no driver materialization,
output sorted by the event key within partitions so Parquet row-group stats
prune later point lookups. 100 TB of ROOT converts with as many executors
as you have files.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ubparquet_spark.codec import encode_ndarray
from ubparquet_spark.io import write_parquet

#: reader signature: file path -> iterator of {col: scalar | np.ndarray}
EventReader = Callable[[str], Iterable[dict]]


def encode_event(event: dict) -> dict:
    """Encode one event dict: every ndarray becomes (flat, shape) column
    pair; scalars pass through (reference encode loop,
    ``root2parquet.py:70-80``)."""
    out: dict = {}
    for k, v in event.items():
        if isinstance(v, np.ndarray):
            flat, shape = encode_ndarray(v)
            out[k] = flat
            out[k + "_shape"] = shape
        else:
            out[k] = v
    return out


def convert_files(
    spark: SparkSession,
    paths: list[str],
    reader: EventReader,
    schema_ddl: str,
    *,
    tasks_per_file: int = 1,
) -> DataFrame:
    """Distributed conversion plan: one row per event, encoded columns.

    ``reader`` runs inside executors (must be importable/picklable); each
    input file is one unit of parallelism."""
    paths_df = spark.createDataFrame([(p,) for p in paths], "path string")
    paths_df = paths_df.repartition(max(1, len(paths) * tasks_per_file))

    def convert(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path in pdf["path"]:
                rows = [encode_event(ev) for ev in reader(path)]
                if rows:
                    yield pd.DataFrame(rows)

    return paths_df.mapInPandas(convert, schema_ddl)


def convert_and_write(
    spark: SparkSession,
    paths: list[str],
    reader: EventReader,
    schema_ddl: str,
    out_path: str,
    *,
    compression: str = "zstd",
    sort_by_event_key: bool = True,
) -> None:
    """Full converter job: read → encode → sorted compressed Parquet sink
    (the ``dlmerged2parquet`` CLI equivalent, minus the single-process cap)."""
    df = convert_files(spark, paths, reader, schema_ddl)
    write_parquet(
        df,
        out_path,
        compression=compression,
        sort_within_partitions_by=(
            ["run", "subrun", "event"] if sort_by_event_key else None
        ),
    )


def root_reader(
    tree: str,
    branches: list[str] | None = None,
    *,
    step_size: str | int = "100 MB",
) -> EventReader:
    """ROOT-file ``EventReader`` factory over ``uproot`` (pure-Python ROOT
    I/O — no PyROOT/C++ needed on executors).

    Returns a ``path -> iterator of event dicts`` callable for
    :func:`convert_files`: one dict per tree entry, jagged branches as
    per-entry numpy arrays (which :func:`encode_event` turns into the
    flat+shape column pair), scalar branches passed through. This is the
    reference's entry loop (``root2parquet.py:39-42``:
    ``for ientry in range(nentries): kploader.load_entry(ientry)``) minus
    the single-process cap — each executor task streams its own file in
    ``step_size`` chunks, so memory is bounded per task.

    The ``uproot`` import happens inside the returned reader (executor
    side) and is environment-gated: this container ships without uproot,
    so calling the reader raises ``NotImplementedError`` — the Spark
    plumbing around it is exercised with synthetic readers in tests."""

    def read(path: str) -> Iterator[dict]:
        try:
            import uproot
        except ImportError as e:  # pragma: no cover - env-gated
            raise NotImplementedError(
                "uproot is not installed; supply a custom EventReader to "
                "convert_files()/convert_and_write()"
            ) from e
        with uproot.open(path) as f:
            t = f[tree]
            names = list(branches) if branches else list(t.keys())
            for batch in t.iterate(names, library="np", step_size=step_size):
                n = len(batch[names[0]])
                for i in range(n):
                    yield {k: batch[k][i] for k in names}

    return read
