"""Ragged-tensor codec: the reference's core data convention.

An N-d array ``X`` of one event is stored as two columns:
``X: array<primitive>`` (row-major flattened) and ``X_shape: array<long>``
(encode: ``/root/reference/root2parquet.py:72-80``; decode:
``/root/reference/readparquet.py:25-31`` and
``larmatch2d/larmatch_dataset.py:203-205``). A column named ``<name>_shape``
is metadata for ``<name>`` (convention tested by suffix at
``readparquet.py:22-27``).

This module provides:
- numpy-side encode/decode for ingestion edges,
- DataFrame-side pairing/validation utilities,
- ``explode_tensor`` / ``reassemble_tensor``: the canonical per-point view of
  a flattened ``(N, k)`` tensor and its exact-order inverse — the foundation
  for array-column filters (P5), voxelization (A5) and instance re-grain (A4)
  while preserving row-major flatten order so round-trips are bit-exact.

Scale notes: explode produces one row per leading-dim slice — a narrow,
pipelined transform (no shuffle). Reassembly groups by the event key and
sorts positions within each group; at cluster scale the group fits one
event's points (O(100K), ``README.md:13``) which is well within executor
memory, and the shuffle is keyed by the event key — the natural partitioning
for every downstream per-event operator.
"""

from __future__ import annotations

from collections.abc import Iterable

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SHAPE_SUFFIX = "_shape"


# ---------------------------------------------------------------------------
# numpy edge (ingestion / serving)
# ---------------------------------------------------------------------------

def encode_ndarray(arr: np.ndarray) -> tuple[list, list[int]]:
    """N-d numpy array -> (row-major flat list, shape list)."""
    return arr.reshape(-1).tolist(), list(arr.shape)


def decode_ndarray(flat: Iterable, shape: Iterable[int], dtype=None) -> np.ndarray:
    """(flat values, shape) -> N-d numpy array (readparquet.py:25-31)."""
    a = np.asarray(list(flat), dtype=dtype)
    return a.reshape(list(shape))


# ---------------------------------------------------------------------------
# column-pairing convention (P3)
# ---------------------------------------------------------------------------

def is_shape_column(name: str) -> bool:
    return name.endswith(SHAPE_SUFFIX)


def shape_column(name: str) -> str:
    return name + SHAPE_SUFFIX


def data_columns(df: DataFrame) -> list[str]:
    """All non-shape columns (the reference skips ``*_shape`` when
    enumerating data columns, readparquet.py:21-27)."""
    return [c for c in df.columns if not is_shape_column(c)]


def tensor_columns(df: DataFrame) -> list[str]:
    """Columns that have a sibling ``<name>_shape`` column."""
    cols = set(df.columns)
    return [c for c in df.columns if not is_shape_column(c) and shape_column(c) in cols]


def validate_tensors(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Invariant check (FIXTURES.md C2): ``product(shape) == size(data)``
    for every tensor pair. Returns the violating (column, row) records —
    empty means valid."""
    cols = cols or tensor_columns(df)
    checks = []
    for c in cols:
        prod = F.aggregate(
            F.col(shape_column(c)),
            F.lit(1).cast("long"),
            lambda acc, x: acc * x,
        )
        checks.append(
            df.select(
                F.lit(c).alias("column"),
                F.size(F.col(c)).cast("long").alias("flat_size"),
                prod.alias("shape_product"),
            ).filter(F.col("flat_size") != F.col("shape_product"))
        )
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


# ---------------------------------------------------------------------------
# canonical per-point view of a flattened (N, k) tensor
# ---------------------------------------------------------------------------

def row_width(shape_col: Column) -> Column:
    """k = product of trailing dims (1 for 1-d tensors)."""
    return F.when(F.size(shape_col) <= 1, F.lit(1).cast("long")).otherwise(
        F.aggregate(
            F.slice(shape_col, 2, F.size(shape_col) - 1),
            F.lit(1).cast("long"),
            lambda acc, x: acc * x,
        )
    )


def explode_tensor(
    df: DataFrame,
    col: str,
    keys: list[str],
    *,
    point_col: str | None = None,
    idx_col: str = "idx",
    axis: int = 0,
) -> DataFrame:
    """One row per point of a flattened 2-d (or (N, ...)) tensor.

    ``axis=0`` (default): points along the LEADING dim — one row per slice
    ``data[i*k : (i+1)*k]`` of an ``(N, k)`` tensor (row-major, matching
    ``root2parquet.py:73``).

    ``axis=1``: points along the TRAILING dim of a 2-d ``(k, N)`` tensor —
    the reference's transposed families, e.g. ``voxkplabel (6, V)``
    (``dlmerged2parquet.py:100-120``): point j is the strided gather
    ``[flat[j], flat[N+j], ..., flat[(k-1)N+j]]``, so the per-point view is
    a length-k array exactly like the axis-0 case.

    ``idx_col`` preserves order for exact reassembly. Both forms are
    narrow, JVM-side transforms — no shuffle."""
    point_col = point_col or col + "_point"
    shape = F.col(shape_column(col))
    if axis == 0:
        k = row_width(shape)
        n = F.element_at(shape, 1)
        # guard n == 0: sequence(0, -1) infers step -1, phantom rows
        idx = F.when(n > 0, F.sequence(F.lit(0).cast("long"), n - 1)).otherwise(
            F.array().cast("array<long>")
        )
        pairs = F.transform(
            idx,
            lambda i: F.struct(
                i.alias("i"),
                F.slice(F.col(col), (i * k + 1).cast("int"), k.cast("int")).alias("pt"),
            ),
        )
    elif axis == 1:
        k = F.element_at(shape, 1)
        n = F.element_at(shape, 2)
        idx = F.when(n > 0, F.sequence(F.lit(0).cast("long"), n - 1)).otherwise(
            F.array().cast("array<long>")
        )
        pairs = F.transform(
            idx,
            lambda j: F.struct(
                j.alias("i"),
                F.transform(
                    F.sequence(F.lit(0).cast("long"), k - 1),
                    lambda f: F.element_at(F.col(col), (f * n + j + 1).cast("int")),
                ).alias("pt"),
            ),
        )
    else:
        raise ValueError(f"axis must be 0 or 1, got {axis}")
    return df.select(
        *keys, F.explode(pairs).alias("_e")
    ).select(
        *keys,
        F.col("_e.i").alias(idx_col),
        F.col("_e.pt").alias(point_col),
    )


def transpose_tensor(df: DataFrame, col: str, *, out_col: str | None = None) -> DataFrame:
    """Canonicalize a flattened 2-d ``(k, N)`` tensor to ``(N, k)`` layout
    (flat + shape both rewritten), so downstream per-point operators can use
    the default axis-0 view. Pure JVM gather — no shuffle, no UDF."""
    out_col = out_col or col
    shape = F.col(shape_column(col))
    k = F.element_at(shape, 1)
    n = F.element_at(shape, 2)
    total = (k * n).cast("long")
    elem_type = dict(df.dtypes)[col]
    flat = F.when(
        total > 0,
        F.transform(
            F.sequence(F.lit(0).cast("long"), total - 1),
            # new index i = (point j = i div k, feature f = i mod k)
            # -> original element (f, j) at f*N + j
            lambda i: F.element_at(
                F.col(col), ((i % k) * n + F.floor(i / k) + 1).cast("int")
            ),
        ),
    ).otherwise(F.array().cast(elem_type))
    return df.withColumn(out_col, flat).withColumn(
        shape_column(out_col), F.array(n, k)
    )


def explode_tensors(
    df: DataFrame, cols: list[str], keys: list[str], idx_col: str = "idx"
) -> DataFrame:
    """Co-explode parallel tensors sharing leading dim N (FIXTURES.md C5):
    one output row per point with one array column per tensor. This is the
    canonical view for mask filters over parallel arrays
    (P5, ``view_spacepoint_data.ipynb:cell-7``: ``pos[truetriplet==1]``)."""
    first = cols[0]
    k_exprs = {c: row_width(F.col(shape_column(c))) for c in cols}
    n = F.element_at(F.col(shape_column(first)), 1)
    idx = F.when(n > 0, F.sequence(F.lit(0).cast("long"), n - 1)).otherwise(
        F.array().cast("array<long>")
    )
    pairs = F.transform(
        idx,
        lambda i: F.struct(
            i.alias("i"),
            *[
                F.slice(
                    F.col(c), (i * k_exprs[c] + 1).cast("int"), k_exprs[c].cast("int")
                ).alias(c)
                for c in cols
            ],
        ),
    )
    out = df.select(*keys, F.explode(pairs).alias("_e"))
    return out.select(
        *keys,
        F.col("_e.i").alias(idx_col),
        *[F.col(f"_e.{c}").alias(c) for c in cols],
    )


def map_view(
    df: DataFrame, keys_col: str, vals_col: str, out_col: str = "map"
) -> DataFrame:
    """MapType view over the parallel-list map encoding (SURVEY.md §7 hard
    part 6): the reference stores a key-value map as two parallel list
    columns (``voxinstancelist``/``voxidlist``,
    ``dlmerged2parquet.py:253-261``) and re-zips a dict at read time
    (``view_voxel_data.ipynb:cell-5``). Storage keeps the parallel lists
    (file fidelity); this adds the queryable map for lookups with
    ``element_at`` — the J1 hash-map lookup join surface."""
    return df.withColumn(out_col, F.map_from_arrays(F.col(keys_col), F.col(vals_col)))


def reassemble_tensor(
    df: DataFrame,
    point_col: str,
    keys: list[str],
    *,
    out_col: str | None = None,
    idx_col: str = "idx",
) -> DataFrame:
    """Inverse of :func:`explode_tensor`: group points back into one
    flattened tensor + shape per key, ordered by ``idx_col`` so the
    row-major flatten order is preserved exactly (SURVEY.md §7 hard part 1).

    Uses ``sort_array`` on collected (idx, point) structs — deterministic
    regardless of shuffle order."""
    out_col = out_col or point_col.removesuffix("_point")
    sorted_pts = F.sort_array(
        F.collect_list(F.struct(F.col(idx_col).alias("i"), F.col(point_col).alias("pt")))
    )
    flat = F.flatten(F.transform(sorted_pts, lambda s: s["pt"]))
    width = F.size(F.element_at(sorted_pts, 1)["pt"]).cast("long")
    return df.groupBy(*keys).agg(
        flat.alias(out_col),
        F.array(F.count(F.lit(1)).cast("long"), width).alias(shape_column(out_col)),
    )
