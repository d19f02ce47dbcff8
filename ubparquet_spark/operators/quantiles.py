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

At 100 TB the expensive step is the distribution groupBy (one shuffle).
The running total comes from ``operators.ranks.blocked_cumsum`` with the
quantile keys as ``part_cols`` (round 6): a plain
``Window.partitionBy(keys).orderBy(value)`` puts each key's ENTIRE
distinct-value distribution in one task — for low-cardinality keys over
near-unique values (integer cents of a price column) that is rows/n_keys
through a single sort. The blocked form range-partitions (key, value),
so every sort is bounded at ~table/partitions rows regardless of key
cardinality or value uniqueness; only the n_tasks x n_keys offset table
is broadcast. For monitoring at extreme scale ``percentile_approx``
(``q_sketch_stats``) remains the cheap sketch alternative.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ubparquet_spark.operators.ranks import blocked_cumsum, use_plain_keyed_window


def exact_quantiles(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    probs: Mapping[str, float],
    *,
    high_cardinality_keys: bool | None = None,
    n_keys: int | None = None,
    fuse_distribution: bool = False,
) -> DataFrame:
    """Per-``keys`` exact quantiles of ``value_col``.

    ``probs`` maps output column name -> probability in [0, 1]. Also emits
    ``n_rows``. One shuffle for the distribution, one window pass over the
    distinct values, one final aggregation per key.

    ``high_cardinality_keys`` picks the running-total strategy
    (round-7 key-cardinality stress, examples/keyed_cumsum_stress.py):

    - ``None`` (default, round 8) — AUTO: dispatch on the measured
      crossover via :func:`use_plain_keyed_window`. Pass ``n_keys`` when
      the key cardinality is known (keeps plan construction fully lazy);
      otherwise a one-job ``approx_count_distinct`` probe over the key
      columns runs at construction time.
    - ``False`` — blocked_cumsum: bounded per-task sorts at ANY
      per-key domain size, but the n_tasks x n_keys offset table is
      broadcast. Right for few keys over near-unique values; measured
      3.8x faster than the window at 10M rows / 1 key, and it is the
      only strategy that FINISHES that shape at 100M. Memory note for
      extreme single-machine stresses: the 1e8-row keyed run needs
      ``SPARK_GRAFT_DRIVER_MEM=48g`` in local mode — the lazy-checkpoint
      artifact competes with window-sort execution memory under the 8g
      default (BENCHNOTES round 7).
    - ``True`` — plain ``Window.partitionBy(keys)``: no offset table at
      all; each key's distinct-value domain sorts in one task, fine when
      keys are many (domains small). Measured 2.7x faster at 10M rows /
      100k keys, where the blocked offset table is 3.2M rows and its
      broadcast dominates. Crossover is roughly where rows/n_keys drops
      below ~rows/n_tasks, i.e. n_keys > n_tasks.

    Both strategies are result-identical (pinned by tests); the choice
    is physical only. With ``keys=[]`` only the blocked strategy is
    bounded (the window variant would be a single-task global window),
    so ``high_cardinality_keys=True`` is rejected there and AUTO always
    resolves to blocked.

    ``fuse_distribution=True`` (round 12, guide §2.4; blocked strategy
    only): ride the distribution groupBy on the SAME range exchange the
    blocked running total needs — range-partition the raw (keys, value)
    rows first, then aggregate (RangePartitioning satisfies the
    aggregation's clustering requirement, so no second exchange). One
    exchange instead of two. The trade is map-side partial aggregation:
    the fused exchange carries raw rows, not pre-combined counts — right
    when the value domain is NEAR-UNIQUE (prices, measurements: distinct
    grain ~ row grain, so partial aggregation saved nothing), wrong for
    bounded domains (keep the default: their distribution shuffle is
    tiny). Result-identical either way (pinned by tests)."""
    keys = list(keys)
    if high_cardinality_keys and not keys:
        raise ValueError(
            "high_cardinality_keys=True with keys=[] would build an "
            "unpartitioned global window; the default blocked strategy "
            "is the bounded plan for a global quantile"
        )
    if high_cardinality_keys is None:
        high_cardinality_keys = use_plain_keyed_window(df, keys, n_keys=n_keys)
    if fuse_distribution and high_cardinality_keys:
        raise ValueError(
            "fuse_distribution applies to the blocked strategy only"
        )
    v = F.col(value_col).cast("double").alias("_v")
    base = df.select(*keys, v)
    if fuse_distribution:
        from ubparquet_spark.operators.ranks import _shuffle_partitions

        base = base.repartitionByRange(
            _shuffle_partitions(base), *keys, "_v"
        )
    dist = base.groupBy(*keys, "_v").agg(F.count(F.lit(1)).alias("_c"))
    if high_cardinality_keys:
        from pyspark.sql import Window

        w_run = (
            Window.partitionBy(*keys)
            .orderBy("_v")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        dist = dist.withColumn("_cum", F.sum("_c").over(w_run)).withColumn(
            "_n", F.sum("_c").over(Window.partitionBy(*keys))
        )
    else:
        dist = blocked_cumsum(
            dist,
            ["_v"],
            {"_cum": ("_c", "inclusive")},
            part_cols=keys,
            totals={"_n": "_c"},
            pre_partitioned=fuse_distribution,
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


def exact_quantiles_multi(
    df: DataFrame,
    keys: Sequence[str],
    specs: Mapping[str, Mapping[str, float]],
    *,
    fuse_distribution: bool = False,
) -> DataFrame:
    """Exact quantiles of SEVERAL value columns in ONE scan.

    ``specs`` maps value column -> {output name: probability}. Equivalent
    to joining one :func:`exact_quantiles` per column, but reads the input
    once: the columns are unpivoted (explode of (var, value) structs — a
    narrow transform), the distribution groupBy keys on (keys, var, value),
    and the window partitions by (keys, var). ``n_rows`` reports the first
    column's non-null count. Output names must be globally unique.

    ``fuse_distribution`` — as in :func:`exact_quantiles`: one range
    exchange carries the exploded raw rows and the distribution groupBy
    rides it (no hash exchange). Right when the value columns are
    dominated by near-unique domains."""
    keys = list(keys)
    cols = list(specs)
    # _var is a TINYINT position id, not the column-name string (round 11,
    # guide §2.3 narrower types): the tag rides every row of the exploded
    # long format through the distribution shuffle and the range exchange,
    # and the output names are applied from `specs` order at the end, so
    # a 1-byte id carries the same information as the ~15-char name.
    structs = [
        F.struct(
            F.lit(i).cast("tinyint").alias("_var"),
            F.col(c).cast("double").alias("_v"),
        )
        for i, c in enumerate(cols)
    ]
    base = df.select(*keys, F.explode(F.array(*structs)).alias("_e")).select(
        *keys, "_e._var", "_e._v"
    )
    if fuse_distribution:
        from ubparquet_spark.operators.ranks import _shuffle_partitions

        base = base.repartitionByRange(
            _shuffle_partitions(base), *keys, "_var", "_v"
        )
    dist = base.groupBy(*keys, "_var", "_v").agg(F.count(F.lit(1)).alias("_c"))
    dist = blocked_cumsum(
        dist,
        ["_v"],
        {"_cum": ("_c", "inclusive")},
        part_cols=[*keys, "_var"],
        totals={"_n": "_c"},
        pre_partitioned=fuse_distribution,
    )
    # quantiles at the (keys, var) grain — h uses that var's own n
    aggs = [F.max("_n").alias("_n")]
    for c, probs in specs.items():
        for name, p in probs.items():
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
    lvl = dist.groupBy(*keys, "_var").agg(*aggs)
    var_id = {c: i for i, c in enumerate(cols)}
    value_cols = []
    for c, probs in specs.items():
        for name, p in probs.items():
            h = (F.col("_n") - 1) * F.lit(float(p))
            frac = h - F.floor(h)
            lo, hi = F.col(f"_lo_{name}"), F.col(f"_hi_{name}")
            value_cols.append(
                F.when(F.col("_var") == var_id[c], lo + (hi - lo) * frac).alias(name)
            )
    lvl = lvl.select(
        *keys,
        "_var",
        *value_cols,
        F.when(F.col("_var") == var_id[cols[0]], F.col("_n")).alias("_n0"),
    )
    # collapse the var rows: each output name is non-null on exactly one row
    return lvl.groupBy(*keys).agg(
        *[
            F.min(name).alias(name)
            for c, probs in specs.items()
            for name in probs
        ],
        F.max("_n0").alias("n_rows"),
    )
