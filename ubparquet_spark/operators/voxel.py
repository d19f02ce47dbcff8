"""Voxel/event-array operators over ragged-tensor tables.

Re-expresses the reference's physics data-prep as Catalyst-optimizable
DataFrame ops:

- :func:`mask_filter`     P5 boolean-mask filters over parallel arrays
  (``view_spacepoint_data.ipynb:cell-7``: ``pos[truetriplet==1]``;
  ``voxel_to_instance_data.py:31-43``).
- :func:`voxelize`        A5 spatial binning + feature agg + majority label
  (C++ voxelizer call sites ``dlmerged2parquet.py:72-77,219``).
- :func:`instance_regrain` A4/A3: the full ``voxel_to_instance_data.py:23-69``
  job as one query — group voxels by instance, collect coords, mode label.
- :func:`dedup_audit`     A1 duplicate-coordinate audit
  (``larvoxel_dataset.py:101-110``).
- :func:`coo_to_dense` / :func:`dense_to_coo`  F11/F12 sparse pivots
  (notebook cells 11-13; ``dlmerged2parquet.py:227-229``).
- :func:`clip_scale`      F4/F5 normalization (``larvoxel_dataset.py:144``:
  ``np.clip(voxfeat/40, 0, 10)``) as a higher-order array transform.

Scale notes: everything shuffles at most once, keyed by either the event key
or the voxel/instance grain. ``mode`` uses the two-pass count+argmax shape
(partial-aggregatable) rather than collecting values. No Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ubparquet_spark.codec import explode_tensors, reassemble_tensor

EVENT_KEY = ["run", "subrun", "event"]


def mask_filter(
    df: DataFrame,
    tensor_cols: list[str],
    mask_col: str,
    keys: list[str] = EVENT_KEY,
    *,
    mask_value: int = 1,
) -> DataFrame:
    """Keep points where the parallel 1-d label tensor equals ``mask_value``,
    co-filtering all ``tensor_cols`` while preserving row-major order.

    Equivalent of ``pos[truetriplet_t == 1]`` over flattened storage; returns
    re-encoded flat+shape columns."""
    pts = explode_tensors(df, [*tensor_cols, mask_col], keys)
    kept = pts.filter(F.element_at(F.col(mask_col), 1) == mask_value)
    out = None
    for c in tensor_cols:
        part = reassemble_tensor(
            kept.select(*keys, "idx", F.col(c).alias(f"{c}_point")),
            f"{c}_point",
            keys,
        )
        out = part if out is None else out.join(part, keys)
    return out


def points_view(
    df: DataFrame,
    coord_col: str,
    keys: list[str] = EVENT_KEY,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Canonical per-point view: one row per point with scalar x/y/z (+charge
    for (N,4) spacepoints) columns, from flattened storage."""
    cols = [coord_col, *(extra_cols or [])]
    pts = explode_tensors(df, cols, keys)
    width_cols = [
        F.element_at(F.col(coord_col), i + 1).alias(name)
        for i, name in enumerate(["x", "y", "z", "q"])
    ]
    return pts.select(*keys, "idx", *width_cols[:4], *(extra_cols or []))


def voxelize(
    points: DataFrame,
    *,
    voxel_size: float = 1.0,
    keys: list[str] = EVENT_KEY,
    coord_cols: tuple[str, str, str] = ("x", "y", "z"),
    charge_col: str = "q",
    label_col: str | None = None,
    origin: tuple[float, float, float] = (0.0, 0.0, 0.0),
) -> DataFrame:
    """Spatial binning (A5): ``groupBy(floor((coord - origin)/size))`` with
    count, summed+averaged charge, and (optionally) majority label per voxel.

    The reference's C++ voxelizer (1 cm bins, ``dlmerged2parquet.py:72-74``)
    as pure Spark — partial-aggregatable, one shuffle on (event, voxel)."""
    bins = [
        F.floor((F.col(c) - F.lit(o)) / F.lit(voxel_size)).alias(f"v{c}")
        for c, o in zip(coord_cols, origin)
    ]
    binned = points.select(*keys, *bins, charge_col, *( [label_col] if label_col else [] ))
    bin_names = [f"v{c}" for c in coord_cols]
    cells = binned.groupBy(*keys, *bin_names).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum(charge_col).alias("sum_charge"),
        (F.sum(charge_col) / F.count(F.lit(1))).alias("avg_charge"),
    )
    if not label_col:
        return cells
    counts = binned.groupBy(*keys, *bin_names, label_col).agg(
        F.count(F.lit(1)).alias("_n")
    )
    w = Window.partitionBy(*keys, *bin_names).orderBy(
        F.desc("_n"), F.asc(label_col)
    )
    majority = (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*keys, *bin_names, F.col(label_col).alias("mode_" + label_col))
    )
    return cells.join(majority, [*keys, *bin_names])


def instance_regrain(
    df: DataFrame,
    keys: list[str] = EVENT_KEY,
    *,
    coord_col: str = "voxcoord",
    label_filter_col: str = "voxlabel",
    instance_col: str = "voxinstance",
    class_col: str = "voxssnet",
) -> DataFrame:
    """The ``voxel_to_instance_data.py:23-69`` pipeline as one query:
    drop ghost voxels (``voxlabel != 1``, ``:33``), drop background
    (``instance == 0``), group by (event, instance), emit collected coords
    (flat + shape, order-preserving) and the majority-vote class
    (``np.argmax(np.bincount(sslist))``, ``:63`` — ties broken by smaller
    class id, matching argmax-of-bincount semantics)."""
    pts = explode_tensors(
        df, [coord_col, label_filter_col, instance_col, class_col], keys
    )
    kept = pts.filter(
        (F.element_at(F.col(label_filter_col), 1) == 1)
        & (F.element_at(F.col(instance_col), 1) != 0)
    ).select(
        *keys,
        "idx",
        F.element_at(F.col(instance_col), 1).alias("instance"),
        F.element_at(F.col(class_col), 1).alias("_cls"),
        F.col(coord_col).alias("_coord"),
    )
    gkeys = [*keys, "instance"]
    coords = reassemble_tensor(
        kept.select(*gkeys, "idx", F.col("_coord").alias("instvoxcoord_point")),
        "instvoxcoord_point",
        gkeys,
    )
    cls_counts = kept.groupBy(*gkeys, "_cls").agg(F.count(F.lit(1)).alias("_n"))
    w = Window.partitionBy(*gkeys).orderBy(F.desc("_n"), F.asc("_cls"))
    labels = (
        cls_counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*gkeys, F.col("_cls").alias("label"))
    )
    return coords.join(labels, gkeys)


def dedup_audit(
    points: DataFrame,
    cols: list[str],
    keys: list[str] = EVENT_KEY,
) -> DataFrame:
    """Duplicate-coordinate audit (A1, ``larvoxel_dataset.py:101-110``):
    rows whose ``cols`` tuple appears more than once within an event."""
    return (
        points.groupBy(*keys, *cols)
        .agg(F.count(F.lit(1)).alias("n_dup"))
        .filter(F.col("n_dup") > 1)
    )


def dense_to_coo(
    df: DataFrame,
    value_col: str,
    row_col: str = "row",
    col_col: str = "col",
) -> DataFrame:
    """F12: keep only non-zero cells of a (row, col, value) dense table."""
    return df.filter(F.col(value_col) != 0).select(row_col, col_col, value_col)


def coo_to_dense_pandas(
    df: DataFrame,
    shape: tuple[int, int],
    row_col: str = "row",
    col_col: str = "col",
    value_col: str = "value",
):
    """F11: materialize a dense 2-d numpy image from COO rows — an edge
    (visualization) utility; dense images never flow through the engine
    (notebooks build them only to render, cells 11-13)."""
    import numpy as np

    pdf = df.select(row_col, col_col, value_col).toPandas()
    dense = np.zeros(shape, dtype=float)
    dense[pdf[row_col].to_numpy(), pdf[col_col].to_numpy()] = pdf[value_col].to_numpy()
    return dense


def clip_scale(
    col: Column | str,
    *,
    scale: float = 1.0,
    lo: float | None = None,
    hi: float | None = None,
) -> Column:
    """F4/F5 element-wise normalize of an array column:
    ``clip(x / scale, lo, hi)`` (``larvoxel_dataset.py:144``:
    ``np.clip(voxfeat/40.0, 0, 10.0)``) — JVM-side ``transform``."""
    c = F.col(col) if isinstance(col, str) else col

    def fn(x):
        y = x / F.lit(scale)
        if lo is not None:
            y = F.greatest(y, F.lit(float(lo)))
        if hi is not None:
            y = F.least(y, F.lit(float(hi)))
        return y

    return F.transform(c, fn)
