"""Exact distributed quantiles via the value distribution.

Spark's exact ``percentile`` aggregate buffers every value of a group in one
task's memory and sorts there — O(group size) memory on a single core, the
same wall the reference hit with whole-table materialization
(``/root/reference/readparquet.py:8``). This operator computes the same
linearly-interpolated quantile (``quantile_cont`` semantics) from the value
DISTRIBUTION instead:

1. ``groupBy(keys, value).count()`` — fully parallel, map-side combined;
   memory is O(distinct values), not O(rows);
2. running total over values within each key (window over the distinct
   values only);
3. the quantile index ``h = (n-1)*p`` is located in the running total and
   interpolated between the two bracketing order statistics.

Interpolation matches DuckDB's ``quantile_cont`` and Spark's ``percentile``:
``v = v_lo + (v_hi - v_lo) * (h - floor(h))`` with 0-based order statistics.

At 100 TB the expensive step is the distribution groupBy (one shuffle);
the window sorts only distinct values per key. For near-unique value columns
the distinct count approaches the row count and the per-key sort returns as
the bottleneck — there, pre-bin values to a fixed grain or use
``percentile_approx`` (``q_sketch_stats``).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_quantiles(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    probs: Mapping[str, float],
) -> DataFrame:
    """Per-``keys`` exact quantiles of ``value_col``.

    ``probs`` maps output column name -> probability in [0, 1]. Also emits
    ``n_rows``. One shuffle for the distribution, one window pass over the
    distinct values, one final aggregation per key."""
    keys = list(keys)
    v = F.col(value_col).cast("double").alias("_v")
    dist = df.select(*keys, v).groupBy(*keys, "_v").agg(
        F.count(F.lit(1)).alias("_c")
    )
    w = Window.partitionBy(*keys).orderBy("_v")
    dist = dist.withColumn("_cum", F.sum("_c").over(w)).withColumn(
        "_n", F.sum("_c").over(Window.partitionBy(*keys))
    )
    aggs = [F.max("_n").alias("_n")]
    for name, p in probs.items():
        # h = (n-1)*p, 0-based; bracketing order statistics are the first
        # values whose running count reaches floor(h)+1 and ceil(h)+1
        h = (F.col("_n") - 1) * F.lit(float(p))
        aggs.append(
            F.min(
                F.when(F.col("_cum") >= F.floor(h) + 1, F.col("_v"))
            ).alias(f"_lo_{name}")
        )
        aggs.append(
            F.min(
                F.when(F.col("_cum") >= F.ceil(h) + 1, F.col("_v"))
            ).alias(f"_hi_{name}")
        )
    out = dist.groupBy(*keys).agg(*aggs)
    cols = [*keys]
    for name, p in probs.items():
        h = (F.col("_n") - 1) * F.lit(float(p))
        frac = h - F.floor(h)
        lo, hi = F.col(f"_lo_{name}"), F.col(f"_hi_{name}")
        cols.append((lo + (hi - lo) * frac).alias(name))
    cols.append(F.col("_n").alias("n_rows"))
    return out.select(*cols)
