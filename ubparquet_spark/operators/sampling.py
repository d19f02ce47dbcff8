"""Sampling / shuffling / partition serving (SURVEY.md §2.6, R1-R5).

The reference's serving loop samples one event per __getitem__ with a
retry-until-nonempty Bernoulli loop (``larmatch2d/larmatch_dataset.py:144-163``)
and epoch-level random permutations re-drawn on exhaustion
(``larvoxel_dataset.py:66-69,81-94``). Every operator here is **seeded** so
behavior is reproducible (SURVEY.md §7 hard part 3), and the per-row pickle
collect path is replaced with Arrow batches.

Scale notes: ``sample_n`` uses rand-keyed top-k (one job, no retry loop);
epoch ordering uses ``rand(seed)`` sort — a full shuffle, but that IS the
semantic (global permutation); ``partition_slice`` reproduces the
deterministic ``set_partition(i, n)`` contract (``larvoxel_dataset.py:196-201``)
via hash-mod so workers get disjoint covers without a shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bernoulli_sample(df: DataFrame, fraction: float, seed: int) -> DataFrame:
    """R1: seeded Bernoulli row sample (``df.sample(False, f)`` at
    ``larmatch_dataset.py:151``, but reproducible)."""
    return df.sample(withReplacement=False, fraction=fraction, seed=seed)


def sample_n(df: DataFrame, n: int, seed: int) -> DataFrame:
    """R1 without the retry loop: guaranteed-n sample via rand-keyed top-n
    (replaces sample→limit→count→retry, ``larmatch_dataset.py:144-163``)."""
    return df.orderBy(F.rand(seed)).limit(n)


def epoch_order(
    df: DataFrame, epoch: int, seed: int = 0, num_partitions: int | None = None
) -> DataFrame:
    """R2: deterministic per-epoch global permutation
    (``rng.choice(n, size=n)`` at ``larvoxel_dataset.py:68``, seeded).

    ``num_partitions`` controls the range-sort's output partitioning.
    ``None`` keeps ``spark.sql.shuffle.partitions`` (right when the
    permuted frame feeds further distributed stages). A SMALL explicit
    count is right when the frame is drained sequentially at the driver
    (``serving.epoch_batches``): ``toLocalIterator`` schedules roughly
    one job per partition, and at 32 partitions that scheduling overhead
    dominated the serving epoch — measured round 8 (BENCHNOTES): 8
    partitions beat 32 by 2.2x on epoch throughput and 3x on first-batch
    latency, while 1 forfeits sort parallelism. The random key is
    materialized through the exchange so partitioning and ordering see
    the SAME draw — identical global order to ``orderBy(rand)``."""
    if num_partitions is None:
        return df.orderBy(F.rand(seed + epoch))
    return (
        df.withColumn("_epoch_r", F.rand(seed + epoch))
        .repartitionByRange(num_partitions, "_epoch_r")
        .sortWithinPartitions("_epoch_r")
        .drop("_epoch_r")
    )


def partition_slice(df: DataFrame, i: int, n: int, key_cols: list[str]) -> DataFrame:
    """R5: deterministic worker slice ``i`` of ``n``
    (``set_partition``, ``larvoxel_dataset.py:196-201``). Hash-mod on the
    event key gives disjoint, stable covers with no shuffle."""
    h = F.abs(F.xxhash64(*[F.col(c) for c in key_cols]))
    return df.filter(h % n == i)


def array_subsample(
    df: DataFrame, col: str, k: int, seed: int, out_col: str | None = None
) -> DataFrame:
    """R3: sample up to ``k`` elements of an array column without
    replacement (``kploader.sample_data`` surface, ``root2parquet.py:58-60``).

    Deterministic given (seed, row key): elements are ranked by xxhash64 of
    (seed, element position, first element bytes) — a cheap reproducible
    pseudo-shuffle, JVM-side."""
    out_col = out_col or col
    ranked = (
        f"array_sort(transform(sequence(1, size({col})), i ->"
        f" struct(xxhash64({seed}, i, element_at({col}, i)) AS h,"
        f" element_at({col}, i) AS v)))"
    )
    return df.withColumn(
        out_col, F.expr(f"transform(slice({ranked}, 1, {k}), s -> s.v)")
    )


def iter_arrow_batches(
    df: DataFrame, batch_rows: int = 1024, first_rows: int | None = None
) -> Iterator["object"]:
    """U3 serving edge: iterate pyarrow RecordBatch objects (replaces the
    per-row ``.rdd.collect()`` pickle path the reference flags as slow,
    ``larmatch_dataset.py:188-192``).

    Batches are assembled ON EXECUTORS: a ``mapInArrow`` pass re-chunks
    each task's Arrow batches to ``batch_rows`` rows and serializes every
    chunk to Arrow IPC bytes, so what crosses to the driver is one binary
    row PER CHUNK — the driver deserializes whole columnar batches and
    never touches individual rows (the previous form did ``row.asDict()``
    → ``RecordBatch.from_pylist`` on the driver, which bounded memory but
    was pickle-rate-bound per row: at 100× the serving edge went
    driver-CPU-bound).

    Streaming still goes through ``toLocalIterator(prefetchPartitions=
    True)`` — driver memory stays bounded by one partition (+ one
    prefetched), never the whole table. Row order is preserved (the
    chunker is a narrow per-partition pass; partitions arrive in order).
    The final chunk of each PARTITION may be shorter than ``batch_rows``
    (executor tasks can't see across partition boundaries); callers that
    need exact batch sizes re-slice downstream (``serving.epoch_batches``
    does).

    ``first_rows`` is the warm-start ramp (round 9, VERDICT r8 #6): each
    partition's FIRST chunk is cut at ``first_rows`` instead of
    ``batch_rows``, so the driver's first yield waits on a training-batch-
    sized chunk rather than the full steady-state chunk — the measured
    first-batch-latency lever (big chunks amortize IPC overhead at steady
    state but multiply time-to-first-data). Later chunks are unchanged."""
    import pyarrow as pa

    batch_rows = int(batch_rows)
    if batch_rows < 1:
        raise ValueError(f"batch_rows must be >= 1, got {batch_rows}")
    if first_rows is None:
        first_rows = batch_rows
    else:
        first_rows = int(first_rows)
        if first_rows < 1:
            raise ValueError(f"first_rows must be >= 1, got {first_rows}")

    def _ipc(batch: "pa.RecordBatch") -> bytes:
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, batch.schema) as w:
            w.write_batch(batch)
        return sink.getvalue().to_pybytes()

    def _wrap(payload: bytes) -> "pa.RecordBatch":
        return pa.RecordBatch.from_arrays(
            [pa.array([payload], type=pa.binary())], names=["ipc"]
        )

    def chunker(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        pending: list[pa.RecordBatch] = []
        n = 0
        target = first_rows
        for b in batches:
            if b.num_rows == 0:
                continue
            pending.append(b)
            n += b.num_rows
            while n >= target:
                tbl = pa.Table.from_batches(pending)
                head = tbl.slice(0, target).combine_chunks()
                yield _wrap(_ipc(head.to_batches()[0]))
                rest = tbl.slice(target)
                pending = rest.to_batches()
                n = rest.num_rows
                target = batch_rows
        if n:
            tail = pa.Table.from_batches(pending).combine_chunks()
            yield _wrap(_ipc(tail.to_batches()[0]))

    out = df.mapInArrow(chunker, "ipc binary")
    for row in out.toLocalIterator(prefetchPartitions=True):
        with pa.ipc.open_stream(pa.py_buffer(bytes(row.ipc))) as reader:
            yield from reader
