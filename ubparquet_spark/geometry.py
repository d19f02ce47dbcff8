"""Detector geometry: TPC active volume constants + fiducial-cut helpers.

Centralizes the constants the reference scatters across its plotting and
training scripts (``/root/reference/detectoroutline.py:5-11`` — TPC volume
``x [0,256] cm, y [-117,117] cm, z [0,1036] cm``, detector tick range and
trigger tick; used as hard cuts in ``larennet/jam_larennet.py:47-55``).
These are the published MicroBooNE LArTPC active-volume dimensions.

Helpers are plain Column predicates so the cut composes with any plan —
pushed into the Parquet scan when applied to top-level columns, or mapped
over per-point array views (codec P5 mask filters) JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# TPC active volume, cm (detectoroutline.py:5-8)
TPC_X = (0.0, 256.0)
TPC_Y = (-117.0, 117.0)
TPC_Z = (0.0, 1036.0)

# detector readout ticks (detectoroutline.py:9-12)
DETTICK_RANGE = (0.0, 9600.0)
TPCTRIG_TICK = 3200.0
CM_PER_TICK = 0.5 * 0.111  # drift velocity 0.111 cm/us x 0.5 us/tick
DETX_RANGE = (
    (DETTICK_RANGE[0] - TPCTRIG_TICK) * CM_PER_TICK,
    (DETTICK_RANGE[1] - TPCTRIG_TICK) * CM_PER_TICK,
)


def tick_to_x(tick: Column | str) -> Column:
    """Drift coordinate (cm) from a readout tick (detectoroutline.py:10-11)."""
    tick = F.col(tick) if isinstance(tick, str) else tick
    return (tick - F.lit(TPCTRIG_TICK)) * F.lit(CM_PER_TICK)


def in_tpc(x: Column, y: Column, z: Column, *, margin: float = 0.0) -> Column:
    """True when (x, y, z) lies inside the TPC active volume shrunk by
    ``margin`` cm on every face (margin=0: the P6 range predicate the
    reference applies in jam_larennet.py:47-55)."""
    m = float(margin)
    return (
        (x >= TPC_X[0] + m) & (x <= TPC_X[1] - m)
        & (y >= TPC_Y[0] + m) & (y <= TPC_Y[1] - m)
        & (z >= TPC_Z[0] + m) & (z <= TPC_Z[1] - m)
    )


def fiducial_cut(
    df: DataFrame,
    x: str = "x",
    y: str = "y",
    z: str = "z",
    *,
    margin: float = 0.0,
) -> DataFrame:
    """Row-level fiducial cut on scalar coordinate columns. Six simple
    range predicates — Catalyst pushes them into the Parquet scan
    (PushedFilters), so out-of-volume row groups never leave storage."""
    return df.filter(in_tpc(F.col(x), F.col(y), F.col(z), margin=margin))


def in_tpc_point(point_col: str, *, margin: float = 0.0) -> Column:
    """Per-point fiducial predicate over a length->=3 array column
    ``[x, y, z, ...]`` (the codec's per-point view, e.g.
    ``spacepoint_t_point``)."""
    p = F.col(point_col)
    return in_tpc(
        F.element_at(p, 1), F.element_at(p, 2), F.element_at(p, 3), margin=margin
    )


def fiducial_point_cut(
    df: DataFrame, point_col: str, *, margin: float = 0.0
) -> DataFrame:
    """Fiducial cut over an exploded per-point view (P5/P6 composition):
    keeps in-volume points; narrow filter, no shuffle."""
    return df.filter(in_tpc_point(point_col, margin=margin))
