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

Scale notes: epoch iteration is Arrow end-to-end — executors assemble
columnar chunks (``mapInArrow`` + IPC, ``operators.sampling.
iter_arrow_batches``), the driver streams one chunk per ``toLocalIterator``
row and decodes tensors vectorized (one flatten + reshape per column, no
per-row ``asDict``/pickle), with memory bounded partition-at-a-time and
never a full-table driver materialize. Point lookups push the
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
    iter_arrow_batches,
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


def _decode_arrow_batch(batch, tensor_cols: list[str]) -> list[dict[str, np.ndarray]]:
    """Columnar decode of one pyarrow RecordBatch into per-event dicts.

    Tensor columns decode VECTORIZED: one ``flatten()`` per column gives a
    contiguous values buffer, list lengths give the row boundaries, and
    each event's ndarray is a reshape over a slice — no per-element Python.
    The stored Arrow dtype is preserved (a float32 tensor stays float32;
    the old per-row ``asDict`` path promoted everything to float64 through
    Python floats)."""
    n = batch.num_rows
    events: list[dict[str, np.ndarray]] = [{} for _ in range(n)]
    shape_cols = {codec.shape_column(t) for t in tensor_cols}
    for idx, name in enumerate(batch.schema.names):
        if name in shape_cols:
            continue
        col = batch.column(idx)
        if name in tensor_cols:
            shp = batch.column(batch.schema.get_field_index(codec.shape_column(name)))
            import pyarrow.compute as pc

            flat = col.flatten().to_numpy(zero_copy_only=False)
            lens = pc.fill_null(pc.list_value_length(col), 0).to_numpy(
                zero_copy_only=False
            )
            offs = np.concatenate([[0], np.cumsum(lens)])
            sflat = shp.flatten().to_numpy(zero_copy_only=False)
            slens = pc.fill_null(pc.list_value_length(shp), 0).to_numpy(
                zero_copy_only=False
            )
            soffs = np.concatenate([[0], np.cumsum(slens)])
            for i in range(n):
                shape = sflat[soffs[i] : soffs[i + 1]]
                events[i][name] = flat[offs[i] : offs[i + 1]].reshape(list(shape))
        else:
            for i, v in enumerate(col.to_pylist()):
                events[i][name] = v
    return events


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
        sort_partitions: int | None = 8,
    ) -> Iterator[list[dict[str, np.ndarray]]]:
        """Yield decoded event batches in a deterministic per-epoch random
        order. ``partition=(i, n)`` serves worker i's disjoint slice.

        ``sort_partitions`` sizes the epoch sort's output partitioning for
        the sequential driver drain: ``toLocalIterator`` schedules ~one
        job per partition, so the default 8 trades sort parallelism for
        drain scheduling (measured 2.2x epoch throughput over the 32-way
        default, BENCHNOTES round 8). Pass ``None`` to keep the session's
        shuffle parallelism (huge per-worker slices where sort width
        matters more)."""
        df = self.df
        if partition is not None:
            i, n = partition
            df = partition_slice(df, i, n, EVENT_KEY)
        df = epoch_order(df, epoch, seed, num_partitions=sort_partitions)
        # Arrow all the way to the driver: iter_arrow_batches assembles
        # columnar chunks ON EXECUTORS (mapInArrow + IPC), the driver
        # streams one chunk per toLocalIterator row and decodes tensors
        # vectorized — no per-row asDict/pickle anywhere on the path.
        # Order is the epoch_order sort: the chunker is narrow and
        # partitions arrive in order.
        # warm-start ramp: the first chunk is ONE training batch, so the
        # GPU sees data as soon as batch_size rows exist driver-side;
        # steady-state chunks stay large to amortize IPC (measured in
        # examples/serving_bench.py, BENCHNOTES round 9)
        batch: list[dict[str, np.ndarray]] = []
        arrow_rows = max(256, batch_size * 8)
        for ab in iter_arrow_batches(
            df, batch_rows=arrow_rows, first_rows=batch_size
        ):
            batch.extend(_decode_arrow_batch(ab, self.tensor_cols))
            while len(batch) >= batch_size:
                yield batch[:batch_size]
                batch = batch[batch_size:]
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
