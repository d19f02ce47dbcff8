"""Segmented (bucketed) lead/lag: ordered-window neighbours WITHOUT a
whole-partition sort in one task.

``F.lead(x).over(Window.partitionBy(k).orderBy(t))`` funnels every row of a
partition through a single task's sort.  That is the right plan when the
partition key is high-cardinality (millions of small partitions), but a
scale-killer when it is LOW-cardinality — e.g. ``event_type`` with a handful
of values over 100 TB of events, where one task would sort an entire type's
history (the same pathology ``plans/packing.py`` avoids for its global
prefix sum and ``operators/ranks.py`` avoids for global ranks).

``segmented_lead`` splits each logical partition into time buckets:

1. per-(partition, bucket) ``lead`` — each window task sees only one
   bucket's rows (bounded by data density per bucket, tunable via the
   bucket width);
2. a per-bucket FIRSTS artifact (one row per non-empty (partition, bucket):
   the target value of the bucket's first row in order) — a tiny ``lead``
   over buckets per partition hands each bucket the first value of the NEXT
   non-empty bucket;
3. rows that are last in their bucket take that handoff value; everything
   else keeps its in-bucket lead.  The global last row per partition stays
   NULL, exactly like the plain window.

The firsts artifact has (buckets-per-partition × partitions) rows — e.g.
daily buckets over a decade × 10 event types ≈ 37k rows — so its window is
trivially one small task and it broadcasts back to the big side, whose
(partition, bucket) hash partitioning from step 1 is reused unchanged (no
second shuffle of the fact rows).

Equivalence contract (tested against the plain window in
``tests/test_segmented.py``):

- ``bucket`` must be a monotone non-decreasing function of the FIRST order
  column alone (rows with equal order prefix land in the same bucket) —
  e.g. ``us DIV 86400000000`` when ordering by ``us``;
- ``order_cols`` must be a total order within each partition (the same
  requirement plain ``lead`` has for deterministic output).

Reference parity: the reference has no windowed neighbour operator at all —
its per-event iteration is a single-process Python loop
(``/root/reference/larmatch2d/larmatch_dataset.py:163-192``); this operator
exists so the Spark port of that access pattern survives low-cardinality
partition keys at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: default bucket width for microsecond-epoch order columns: one day
DAY_US = 86_400 * 10**6

_SEG = "__seg"
_NEXT_FIRST = "__seg_next_first"
_PREV_LAST = "__seg_prev_last"


def segmented_lead(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[str],
    target: str,
    bucket: Column,
    out_col: str,
) -> DataFrame:
    """Add ``out_col`` = ``lead(target)`` over (part_cols ordered by
    order_cols), computed with per-bucket windows + a boundary handoff
    instead of one whole-partition sort task.  See module docstring for
    the bucket/order contract."""
    assert out_col not in df.columns, f"{out_col} already present"
    b = df.withColumn(_SEG, bucket)

    # `lead(lit(1)) IS NULL` marks the bucket's last row explicitly —
    # coalescing on `lead(target) IS NULL` instead would mis-fire when the
    # NEXT row's target is legitimately NULL.  Both functions share the
    # window spec, so this is still a single Window operator.
    w_in = Window.partitionBy(*part_cols, _SEG).orderBy(*order_cols)
    led = b.withColumn(out_col, F.lead(target).over(w_in)).withColumn(
        "__seg_is_last", F.lead(F.lit(1)).over(w_in).isNull()
    )

    # first row (in order) of every non-empty bucket, via struct-min:
    # order_cols are a total order, so the min struct IS the first row
    firsts = (
        b.groupBy(*part_cols, _SEG)
        .agg(
            F.min(
                F.struct(*[F.col(c) for c in order_cols], F.col(target).alias("_t"))
            ).alias("_f")
        )
        .select(*part_cols, _SEG, F.col("_f._t").alias("_first_t"))
    )
    # lead over BUCKETS (one row per non-empty bucket): tiny per-partition
    # windows even when the fact-side partition would be 100 TB
    w_b = Window.partitionBy(*part_cols).orderBy(_SEG)
    handoff = firsts.withColumn(_NEXT_FIRST, F.lead("_first_t").over(w_b)).select(
        *part_cols, _SEG, _NEXT_FIRST
    )

    out = (
        led.join(F.broadcast(handoff), [*part_cols, _SEG], "left")
        .withColumn(
            out_col,
            F.when(F.col("__seg_is_last"), F.col(_NEXT_FIRST)).otherwise(
                F.col(out_col)
            ),
        )
        .drop(_SEG, _NEXT_FIRST, "__seg_is_last")
    )
    return out


def segmented_lag(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[str],
    target: str,
    bucket: Column,
    out_col: str,
) -> DataFrame:
    """Mirror of :func:`segmented_lead` for ``lag``: per-bucket ``lag``
    plus a per-bucket LASTS artifact (struct-max = last row in order) led
    backwards with ``lag`` over buckets, so each bucket's first row takes
    the previous non-empty bucket's last value.  Same bucket/order
    contract as segmented_lead; the global first row per partition stays
    NULL like the plain window."""
    assert out_col not in df.columns, f"{out_col} already present"
    b = df.withColumn(_SEG, bucket)

    w_in = Window.partitionBy(*part_cols, _SEG).orderBy(*order_cols)
    lagged = b.withColumn(out_col, F.lag(target).over(w_in)).withColumn(
        "__seg_is_first", F.lag(F.lit(1)).over(w_in).isNull()
    )

    lasts = (
        b.groupBy(*part_cols, _SEG)
        .agg(
            F.max(
                F.struct(*[F.col(c) for c in order_cols], F.col(target).alias("_t"))
            ).alias("_l")
        )
        .select(*part_cols, _SEG, F.col("_l._t").alias("_last_t"))
    )
    w_b = Window.partitionBy(*part_cols).orderBy(_SEG)
    handoff = lasts.withColumn(_PREV_LAST, F.lag("_last_t").over(w_b)).select(
        *part_cols, _SEG, _PREV_LAST
    )

    out = (
        lagged.join(F.broadcast(handoff), [*part_cols, _SEG], "left")
        .withColumn(
            out_col,
            F.when(F.col("__seg_is_first"), F.col(_PREV_LAST)).otherwise(
                F.col(out_col)
            ),
        )
        .drop(_SEG, _PREV_LAST, "__seg_is_first")
    )
    return out
