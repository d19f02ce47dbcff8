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


def epoch_order(df: DataFrame, epoch: int, seed: int = 0) -> DataFrame:
    """R2: deterministic per-epoch global permutation
    (``rng.choice(n, size=n)`` at ``larvoxel_dataset.py:68``, seeded)."""
    return df.orderBy(F.rand(seed + epoch))


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


def iter_arrow_batches(df: DataFrame, batch_rows: int = 1024) -> Iterator["object"]:
    """U3 serving edge: iterate pyarrow RecordBatch objects (replaces the
    per-row ``.rdd.collect()`` pickle path the reference flags as slow,
    ``larmatch_dataset.py:188-192``).

    Streams via ``toLocalIterator(prefetchPartitions=True)`` — driver
    memory is bounded by ONE partition (+ one prefetched), not the whole
    table. The previous ``df.toArrow()`` form collected the entire
    DataFrame into driver memory before yielding the first batch — the
    modern form of the reference's full-materialize path, and the thing
    that would OOM the driver first at 100 TB."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    schema = to_arrow_schema(df.schema)
    buf: list[dict] = []
    for row in df.toLocalIterator(prefetchPartitions=True):
        buf.append(row.asDict(recursive=True))
        if len(buf) >= batch_rows:
            yield pa.RecordBatch.from_pylist(buf, schema=schema)
            buf = []
    if buf:
        yield pa.RecordBatch.from_pylist(buf, schema=schema)
