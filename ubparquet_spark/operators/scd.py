"""Run compaction: collapse consecutive equal states into validity ranges.

The gaps-and-islands / SCD-type-2 build: given an ordered change log
(one row per observation of a ``state`` per entity), emit one row per
RUN of consecutive equal states, with ``valid_from``/``valid_to``
half-open validity bounds and an ``is_current`` flag — the standard
slowly-changing-dimension compaction a warehouse applies to CDC feeds
(the complementary operator to :mod:`ubparquet_spark.operators.diff`,
which computes the change feed itself).

The reference's event logs keep one row per (run, subrun, event)
observation (``/root/reference/root2parquet.py:49``); this operator is
the history-table view of such a log.

Scale notes (100 TB design):

- Both raw-row window functions (the lag that detects a state flip and
  the running sum that numbers runs) share ONE window spec partitioned
  by the entity key — high-cardinality by construction (an entity id),
  so no single task ever sorts more than one entity's history. One
  Exchange.
- The run group-by keys on (entity, run_id), a superset of the window's
  hash partitioning, so it reuses the exchange (subset rule) — the
  collapse is map-side.
- The ``lead`` that closes each validity range runs over the COLLAPSED
  rows (≤ runs per entity, not raw observations), again partitioned by
  the entity key.

If the natural entity key were low-cardinality (e.g. a handful of
device classes), swap the windows for
:func:`ubparquet_spark.operators.segmented.segmented_lead` — the raw
observation grain here is per-entity, so the plain window is the right
tool.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def collapse_runs(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
    state_col: str,
    *,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """One row per maximal run of consecutive equal ``state_col`` values.

    ``order_cols`` must totally order rows within a ``keys`` group
    (include a unique row key as tie-break). Output columns: ``keys``,
    ``state_col``, ``from_col`` (first order_cols[0] of the run),
    ``to_col`` (next run's ``from_col``; null on the last run),
    ``run_len`` and ``is_current``. Ranges are half-open:
    ``[valid_from, valid_to)``.
    """
    keys = list(keys)
    order_cols = list(order_cols)
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    state = F.col(state_col)
    # null-safe flip detection: a run breaks on the first row of the
    # group or whenever the state differs from the previous row's
    flip = F.when(
        (F.row_number().over(w) == 1) | ~F.lag(state).over(w).eqNullSafe(state),
        F.lit(1),
    ).otherwise(F.lit(0))
    runs = (
        df.withColumn("_run", F.sum(flip).over(w))
        .groupBy(*keys, "_run")
        .agg(
            F.min(state_col).alias(state_col),
            F.min(order_cols[0]).alias(from_col),
            F.count(F.lit(1)).alias("run_len"),
        )
    )
    w_runs = Window.partitionBy(*keys).orderBy("_run")
    return runs.select(
        *keys,
        state_col,
        from_col,
        F.lead(from_col).over(w_runs).alias(to_col),
        "run_len",
        F.lead(from_col).over(w_runs).isNull().alias("is_current"),
    )
