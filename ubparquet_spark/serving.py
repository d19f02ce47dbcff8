"""Event-serving dataset: the reference's PyTorch-facing loader, Spark-first.

Replaces ``larmatchDataset`` (``/root/reference/larmatch2d/larmatch_dataset.py``):
same capabilities — multi-file schema-merged scan (``:93,246``), column
projection (``:95-98``), ``__len__`` (``:107``), point lookup by
``(run, subrun, event)`` (``:137-142``), random item sampling (``:144-163``),
epoch iteration with partition splits (``larvoxel_dataset.py:56-94,196-201``),
and batch collation with batch-index provenance (``:203-286``) — but with the
per-row ``.rdd.collect()`` pickle path (noted "SLOW ASF" at ``:188-192``)
replaced by Arrow batch transfer, the retry-sampling loop replaced by a
single rand-keyed top-n job, and all randomness seeded.

Scale notes: epoch iteration streams partition-at-a-time to the driver via
``toLocalIterator`` (one small job per partition, never one per item, and
never a full-table driver materialize); decode happens driver-side per row
batch, or can be pushed into executors via ``mapInArrow`` for distributed
consumers. Point lookups push the
conjunctive key predicate into Parquet row-group pruning — write event files
sorted by the key (``io.write_parquet(sort_within_partitions_by=...)``) to
keep them fast.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ubparquet_spark import codec
from ubparquet_spark.io import read_parquet
from ubparquet_spark.operators.sampling import (
    epoch_order,
    partition_slice,
    sample_n,
)

EVENT_KEY = ["run", "subrun", "event"]


def _decode_pandas_row(row: dict, tensor_cols: list[str]) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    for k, v in row.items():
        if codec.is_shape_column(k):
            continue
        if k in tensor_cols:
            out[k] = codec.decode_ndarray(v, row[codec.shape_column(k)])
        else:
            out[k] = v
    return out


class EventDataset:
    """Map-style dataset over ragged-tensor event Parquet files."""

    def __init__(
        self,
        spark: SparkSession,
        *paths: str,
        columns: list[str] | None = None,
        merge_schema: bool = True,
    ) -> None:
        self.spark = spark
        df = read_parquet(spark, *paths, merge_schema=merge_schema)
        if columns:
            # project data columns together with their shape siblings
            cols = []
            for c in columns:
                cols.append(c)
                if codec.shape_column(c) in df.columns:
                    cols.append(codec.shape_column(c))
            df = df.select(*EVENT_KEY, *cols)
        self.df: DataFrame = df
        self.tensor_cols = codec.tensor_columns(df)
        self._len: int | None = None

    def __len__(self) -> int:
        if self._len is None:
            self._len = self.df.count()
        return self._len

    # -- point lookup (P4) --------------------------------------------------
    def get_entry(self, run: int, subrun: int, event: int) -> dict[str, np.ndarray] | None:
        rows = (
            self.df.filter(
                (F.col("run") == run)
                & (F.col("subrun") == subrun)
                & (F.col("event") == event)
            )
            .toPandas()
            .to_dict("records")
        )
        if not rows:
            return None
        return _decode_pandas_row(rows[0], self.tensor_cols)

    # -- seeded sampling (R1) ------------------------------------------------
    def sample(self, n: int, seed: int) -> list[dict[str, np.ndarray]]:
        pdf = sample_n(self.df, n, seed).toPandas()
        return [
            _decode_pandas_row(r, self.tensor_cols) for r in pdf.to_dict("records")
        ]

    # -- epoch iteration (R2/R5 + U2 collate edge) ---------------------------
    def epoch_batches(
        self,
        batch_size: int,
        epoch: int = 0,
        seed: int = 0,
        partition: tuple[int, int] | None = None,
    ) -> Iterator[list[dict[str, np.ndarray]]]:
        """Yield decoded event batches in a deterministic per-epoch random
        order. ``partition=(i, n)`` serves worker i's disjoint slice."""
        df = self.df
        if partition is not None:
            i, n = partition
            df = partition_slice(df, i, n, EVENT_KEY)
        df = epoch_order(df, epoch, seed)
        # toLocalIterator streams one partition at a time to the driver
        # (plus one prefetched) — unlike toArrow(), which materialized the
        # ENTIRE epoch in driver memory before the first batch came out.
        batch: list[dict[str, np.ndarray]] = []
        for row in df.toLocalIterator(prefetchPartitions=True):
            batch.append(_decode_pandas_row(row.asDict(), self.tensor_cols))
            if len(batch) == batch_size:
                yield batch
                batch = []
        if batch:
            yield batch


def collate_batch(
    events: list[dict[str, np.ndarray]],
    tensor_cols: list[str],
    *,
    batch_index_cols: list[str] | None = None,
) -> dict[str, np.ndarray]:
    """U2 batch assembly (``larvoxel_dataset.py:203-286``): concatenate each
    tensor across events; for ``batch_index_cols``, prepend the batch index
    as an extra leading column (``voxcoord[:,0]=ib`` pattern, ``:264-268``)."""
    out: dict[str, np.ndarray] = {}
    batch_index_cols = batch_index_cols or []
    for col in tensor_cols:
        parts = []
        for ib, ev in enumerate(events):
            arr = ev[col]
            if col in batch_index_cols:
                idx = np.full((arr.shape[0], 1), ib, dtype=arr.dtype)
                arr = np.concatenate([idx, arr], axis=1)
            parts.append(arr)
        out[col] = np.concatenate(parts, axis=0)
    out["batch_offsets"] = np.cumsum(
        [0] + [ev[tensor_cols[0]].shape[0] for ev in events[:-1]]
    )
    return out
