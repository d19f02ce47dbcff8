"""Z-order (Morton) spatial clustering for Parquet layout.

Sorting spacepoint/voxel tables by a Morton key interleaving the 3-D bin
bits keeps spatially-near points in the same Parquet row groups, so 3-D
range predicates (fiducial cuts, detector regions — P6,
``larennet/jam_larennet.py:47-55``) prune row groups on ALL axes instead of
just the primary sort column. This is the standard lakehouse data-clustering
technique (Delta/Iceberg ``ZORDER BY``), expressed as a plain column so it
works on vanilla Parquet.

Pure JVM bit arithmetic — one expression, no UDF, no shuffle beyond the
requested sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per axis (3 x 10 = 30-bit keys; 1024 bins per axis)
BITS = 10


def morton3_key(
    x_bin: Column | str, y_bin: Column | str, z_bin: Column | str, *, bits: int = BITS
) -> Column:
    """Interleave the low ``bits`` of three non-negative bin indices:
    key bit (3b+0) = x bit b, (3b+1) = y bit b, (3b+2) = z bit b."""
    cols = [F.col(c) if isinstance(c, str) else c for c in (x_bin, y_bin, z_bin)]
    terms = []
    for b in range(bits):
        for axis, c in enumerate(cols):
            terms.append(
                (F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1)))
                * F.lit(1 << (3 * b + axis))
            )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("long")


def with_zorder(
    points: DataFrame,
    *,
    coord_cols: tuple[str, str, str] = ("x", "y", "z"),
    bin_size: float = 1.0,
    origin: tuple[float, float, float] = (0.0, 0.0, 0.0),
    out_col: str = "zorder",
    bits: int = BITS,
) -> DataFrame:
    """Add a Morton key column computed from binned coordinates (clamped to
    the representable range)."""
    bins = []
    for c, o in zip(coord_cols, origin):
        raw = F.floor((F.col(c) - F.lit(o)) / F.lit(bin_size)).cast("long")
        bins.append(F.least(F.greatest(raw, F.lit(0)), F.lit((1 << bits) - 1)))
    return points.withColumn(out_col, morton3_key(*bins, bits=bits))


def write_zordered(
    points: DataFrame,
    path: str,
    *,
    coord_cols: tuple[str, str, str] = ("x", "y", "z"),
    bin_size: float = 1.0,
    origin: tuple[float, float, float] = (0.0, 0.0, 0.0),
    n_files: int | None = None,
    compression: str = "zstd",
) -> None:
    """Write points clustered by Morton key: repartitionByRange on the key
    (range partitioning keeps the global order across files) + sort within
    partitions, so every row group covers a compact spatial cell."""
    keyed = with_zorder(
        points, coord_cols=coord_cols, bin_size=bin_size, origin=origin
    )
    if n_files:
        keyed = keyed.repartitionByRange(n_files, "zorder")
    (
        keyed.sortWithinPartitions("zorder")
        .write.mode("overwrite")
        .option("compression", compression)
        .parquet(path)
    )
