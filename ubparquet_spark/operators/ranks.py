"""Distributed exact ranking without single-task window partitions.

A plain ``row_number()/percent_rank()/ntile()`` window partitioned by a
low-cardinality column (e.g. 5 order priorities) forces each partition —
20 % of the table — through ONE task's sort: correct at sf0.1, a
scale-killer at 100 TB.

Technique (classic two-pass distributed ranking, one big-table shuffle):

  1. range-partition rows by (group, order) keys and sort WITHIN each
     partition — each task holds a contiguous, sorted slice of the global
     order, sized ~table/partitions,
  2. tag rows with ``monotonically_increasing_id()`` — consecutive within
     a partition in sort order, so ``id - min(id within (task, group))``
     IS the local rank, with no window and (crucially) no second
     exchange: a ``row_number() over (partition by task_id)`` window
     would force a full re-shuffle on task_id because Catalyst cannot
     know the data is already partitioned that way,
  3. shift local ranks by the count of rows in earlier tasks of the same
     group — a tiny (n_tasks × n_groups)-row min/count table, broadcast
     back.

The offset table's own window IS partitioned per group, but over n_tasks
rows, not n_rows. Requires a total order: ``order_cols`` must be unique
within a group (include a row key) so ``row_number == rank``.

Assumption: ``monotonically_increasing_id`` is consecutive within a
partition — true of Spark's implementation (partition_index << 33 | row
offset) even though the API contract only promises monotonicity. This is
now VERIFIED IN-PLAN on every run, not just assumed: the offset table
carries ``max(_g) - min(_g) + 1 == count`` per (task, group) — rows of a
group are contiguous within a sorted partition, so consecutiveness holds
iff that identity holds for every (task, group) — and any violation
raises through ``raise_error`` at execution time. The canary costs
nothing measurable (it rides the existing n_tasks × n_groups aggregate)
and turns a silent wrong-rank under a future Spark id-scheme change into
a loud failure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: materialize-once checkpoints inside ranked()/blocked_cumsum(). Always on
#: in production; plan-shape tests flip it off to inspect the otherwise
#: checkpoint-truncated range-partition subtree (semantics-neutral either
#: way — the flag only controls whether the artifact is reused or re-derived).
_CHECKPOINT = True


def _maybe_checkpoint(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=False) if _CHECKPOINT else df


def _shuffle_partitions(df: DataFrame) -> int:
    """Shuffle-partition count with a fallback for non-numeric confs
    (``spark.sql.shuffle.partitions`` may be set to ``auto`` under some
    resource managers) and a >=1 clamp (``repartition(0)`` is an error)."""
    raw = df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    try:
        n = int(raw)
    except (TypeError, ValueError):
        n = df.sparkSession.sparkContext.defaultParallelism
    return max(1, n)


def use_plain_keyed_window(
    df: DataFrame, keys: list[str], *, n_keys: int | None = None
) -> bool:
    """Pick the keyed running-total strategy from the measured crossover.

    Returns True when a plain ``Window.partitionBy(keys)`` is the right
    physical plan, False when :func:`blocked_cumsum` is. The rule is the
    round-7 key-cardinality stress (BENCHNOTES r7, measured on
    examples/keyed_cumsum_stress.py): the blocked form wins 2.4–3.8×
    when ``n_keys`` is far below the task count (its per-task sorts are
    bounded; the plain window funnels rows/n_keys through single tasks)
    and is the only strategy that finishes at 100M rows / few keys; the
    plain keyed window wins ~1.6× once ``n_keys >= n_tasks`` (per-key
    domains are already small, and the blocked n_tasks × n_keys offset
    broadcast dominates).

    ``n_keys`` — caller-known key cardinality; when omitted, a single
    ``approx_count_distinct`` probe over the key columns runs HERE
    (one cheap column-pruned job at dispatch time — pass ``n_keys`` to
    keep plan construction fully lazy). ``keys == []`` is always the
    blocked strategy: the "window" alternative would be an unpartitioned
    global window through one task."""
    if not keys:
        return False
    if n_keys is None:
        probe = F.struct(*[F.col(k) for k in keys]) if len(keys) > 1 else F.col(keys[0])
        n_keys = df.agg(F.approx_count_distinct(probe)).first()[0]
    return n_keys >= _shuffle_partitions(df)


def _null_safe_join_broadcast(
    local: DataFrame, offsets: DataFrame, part_cols: list[str]
) -> DataFrame:
    """Broadcast-join ``offsets`` back onto ``local`` on ``(_pid,
    part_cols)`` with NULL-SAFE equality on the group keys.

    A ``join(..., ["_pid", *part_cols])`` name-list join is null-unsafe:
    a NULL group key (kept as an ordinary group by ``groupBy`` — and by
    the ``Window.partitionBy`` these operators replace) would silently
    vanish from the output. ``eqNullSafe`` keys remain valid
    BroadcastHashJoin keys, so the physical plan is unchanged for
    non-null keys."""
    l, o = local.alias("_lhs"), offsets.alias("_rhs")
    cond = F.col("_lhs._pid") == F.col("_rhs._pid")
    for c in part_cols:
        cond &= F.col(f"_lhs.{c}").eqNullSafe(F.col(f"_rhs.{c}"))
    return l.join(F.broadcast(o), cond).drop(
        F.col("_rhs._pid"), *[F.col(f"_rhs.{c}") for c in part_cols]
    )


def ranked(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[str],
    *,
    rank_col: str = "rank",
    n_col: str = "n_rows",
    num_partitions: int | None = None,
) -> DataFrame:
    """``df`` + two columns: ``rank_col`` — the exact 1-based rank of the
    row within its ``part_cols`` group under ``order_cols`` (which must be
    unique within a group), and ``n_col`` — the group's row count."""
    sort_cols = [*part_cols, *order_cols]
    if num_partitions is None:
        num_partitions = _shuffle_partitions(df)
    # lazy checkpoint (round 11, guide §2.4): the sorted slice feeds BOTH
    # the offset branch and the final join — without it, column pruning
    # specializes the two subtrees into two separate range Exchanges (no
    # ReuseExchange), so the input executed 3x (range-bound sampling +
    # two map stages) and shuffled 2x. With it the input executes once
    # for sampling (which materializes the artifact) and both consumers
    # read the one artifact. Same rationale as blocked_cumsum below.
    #
    # Size-aware skip (round 12, guide §2.4/§5): when EVERY input column
    # is a sort key, column pruning cannot specialize the two subtrees —
    # the branch Exchanges stay byte-identical and AQE reuses the one
    # shuffle's files (ReusedExchange), so the checkpoint's planning +
    # materialization job buys nothing and just serializes the plan into
    # an extra barrier (the measured q_order_price_ranks/q_price_deciles
    # r11 regression). Cross-branch consistency of _pid/_g holds because
    # (part_cols, order_cols) is a total order (in-partition row order is
    # fully determined, so both branches assign identical ids) and the
    # explicit numPartitions pins the shuffle against AQE re-layout.
    # Callers with payload columns keep the checkpoint: their pruned
    # subtrees would otherwise become two separate fact shuffles.
    checkpoint = set(df.columns) != set(sort_cols)
    local = (
        df.repartitionByRange(num_partitions, *[F.col(c) for c in sort_cols])
        .sortWithinPartitions(*[F.asc(c) for c in sort_cols])
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_g", F.monotonically_increasing_id())
    )
    if checkpoint:
        local = _maybe_checkpoint(local)
    per_task_group = local.groupBy("_pid", *part_cols).agg(
        F.min("_g").alias("_min_g"),
        F.max("_g").alias("_max_g"),
        F.count(F.lit(1)).alias("_cnt"),
    )
    w_before = (
        Window.partitionBy(*part_cols)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # consecutiveness canary: ids are consecutive within a partition iff
    # max - min + 1 == count for every (task, group) slice (group rows are
    # contiguous in the sorted partition). Folded into _off (0 when sound)
    # so column pruning can never eliminate it.
    canary = F.when(
        F.col("_max_g") - F.col("_min_g") + 1 == F.col("_cnt"), F.lit(0)
    ).otherwise(
        F.raise_error(
            F.lit(
                "ranked(): monotonically_increasing_id not consecutive "
                "within a partition — Spark id scheme changed; ranks "
                "would be wrong"
            )
        ).cast("int")
    )
    offsets = per_task_group.select(
        "_pid",
        *part_cols,
        "_min_g",
        (F.coalesce(F.sum("_cnt").over(w_before), F.lit(0)) + canary).alias(
            "_off"
        ),
        F.sum("_cnt").over(Window.partitionBy(*part_cols)).alias(n_col),
    )
    return (
        _null_safe_join_broadcast(local, offsets, part_cols)
        .withColumn(rank_col, F.col("_g") - F.col("_min_g") + 1 + F.col("_off"))
        .drop("_pid", "_g", "_min_g", "_off")
    )


def blocked_cumsum(
    df: DataFrame,
    order_cols: list[str],
    sums: dict[str, tuple],
    *,
    part_cols: list[str] | None = None,
    totals: dict[str, str] | None = None,
    num_partitions: int | None = None,
    pre_partitioned: bool = False,
) -> DataFrame:
    """``df`` + exact running sums under ``order_cols``, distributed —
    global by default, per ``part_cols`` group when given.

    Replaces the single-task ``SUM() OVER (ORDER BY v)`` pattern on
    value-distribution tables whose distinct-value domain is NOT
    quantization-bounded (near-unique cents, gap seconds): the naive
    global ordered window funnels the whole distribution through one
    task's sort. Here:

    1. range-partition by ``order_cols`` and sort within each partition —
       each task holds a contiguous slice of the global order, sized
       ~table/partitions; the slice is checkpointed so the offset branch
       and the window branch read ONE materialized artifact instead of
       re-running the upstream scan (column pruning would otherwise
       specialize the two subtrees and defeat exchange reuse);
    2. per-task totals -> running offsets over earlier tasks (a tiny
       n_tasks-row window) broadcast back;
    3. in-task running sums via a window partitioned on the task id —
       every window partition is bounded at ~table/partitions rows.

    ``sums`` maps output column -> ``(input column/Column, kind)`` with
    kind ``"inclusive"`` (rows <= current) or ``"exclusive"`` (rows <
    current, 0 for the group's first row). ``order_cols`` must be unique
    within a ``part_cols`` group (true of a value-distribution table
    keyed by the value). ``totals`` (output column -> input
    column/Column) optionally appends per-group grand-total columns;
    they ride the SAME per-(task, group) aggregate AND the same offset
    window table as the running sums (one unbounded-per-group window
    spec alongside the ordered one — no extra exchange, no second
    artifact scan, no crossJoin), reaching every row through the one
    broadcast join.

    ``part_cols`` is for LOW-cardinality grouping keys — exactly the
    case where a ``Window.partitionBy(keys).orderBy(v)`` over a
    near-unique value domain degenerates to one task per key (the
    operators/quantiles caveat this closes): the offset table is
    n_tasks x n_groups rows and is broadcast. High-cardinality groups
    never have that pathology (their per-key partitions are small) and
    should keep the plain keyed window.

    ``pre_partitioned=True`` (round 12, guide §2.4): the caller promises
    ``df`` is ALREADY range-partitioned by ``sort_cols`` (a
    ``repartitionByRange(n, *sort_cols)`` upstream, optionally with a
    partitioning-preserving aggregation on the same keys above it —
    RangePartitioning satisfies the groupBy's ClusteredDistribution, so
    Catalyst inserts no second exchange). Then this operator adds NO
    exchange and NO checkpoint of its own: it only sorts within the
    existing partitions and runs the offset machinery. Correctness rests
    on RangePartitioner's contract — partitions are contiguous,
    non-overlapping key ranges (so ``_pid`` order IS global order) and
    equal keys land in one partition (so a fused distribution groupBy is
    complete per partition). The two consumers of the sorted slice
    (offset aggregate + final join) re-run the post-shuffle work twice,
    but AQE reuses the one shuffle's files (ReusedExchange), so no input
    re-scan and no second shuffle — measured cheaper than a checkpoint
    artifact at bench scale and strictly one less Exchange at any scale.
    """
    part_cols = list(part_cols or [])
    if num_partitions is None:
        num_partitions = _shuffle_partitions(df)
    sort_cols = [*part_cols, *order_cols]
    # lazy checkpoint: materializes at the plan's FIRST ACTION (so merely
    # constructing a plan launches no Spark jobs), after which the offset
    # branch and the window branch both read the one artifact. Caveat
    # (inherent to localCheckpoint): the artifact lives on executor local
    # storage, not a reliable store — an executor loss mid-job fails the
    # job rather than recomputing the lineage.
    # input checkpoint (round 11): a range exchange executes its child
    # TWICE — once for RangePartitioner's bound-sampling pass, once for
    # the real map stage. Every caller passes an aggregated distribution
    # here, so without this the groupBy (and its shuffle) ran twice per
    # call; the sampling pass now materializes the artifact and the map
    # stage reads it back. The artifact is distinct-value grain — the
    # same magnitude the range shuffle moves anyway.
    if pre_partitioned:
        local = df.sortWithinPartitions(
            *[F.asc(c) for c in sort_cols]
        ).withColumn("_pid", F.spark_partition_id())
    else:
        df = _maybe_checkpoint(df)
        local = (
            df.repartitionByRange(
                num_partitions, *[F.col(c) for c in sort_cols]
            )
            .sortWithinPartitions(*[F.asc(c) for c in sort_cols])
            .withColumn("_pid", F.spark_partition_id())
        )
        local = _maybe_checkpoint(local)
    as_col = lambda c: F.col(c) if isinstance(c, str) else c  # noqa: E731
    per_task = local.groupBy("_pid", *part_cols).agg(
        *[F.sum(as_col(ic)).alias(f"_t_{name}") for name, (ic, _k) in sums.items()],
        *[
            F.sum(as_col(ic)).alias(f"_tt_{name}")
            for name, ic in (totals or {}).items()
        ],
    )
    # windows over the n_tasks x n_groups offset table only
    w_before = (
        Window.partitionBy(*part_cols)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy(*part_cols)
    offsets = per_task.select(
        "_pid",
        *part_cols,
        *[
            F.coalesce(F.sum(f"_t_{name}").over(w_before), F.lit(0)).alias(
                f"_o_{name}"
            )
            for name in sums
        ],
        *[
            F.sum(f"_tt_{name}").over(w_all).alias(name)
            for name in (totals or {})
        ],
    )
    out = _null_safe_join_broadcast(local, offsets, part_cols)
    w_inc = (
        Window.partitionBy("_pid", *part_cols)
        .orderBy(*[F.asc(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_exc = (
        Window.partitionBy("_pid", *part_cols)
        .orderBy(*[F.asc(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    for name, (ic, kind) in sums.items():
        if kind == "inclusive":
            run = F.sum(as_col(ic)).over(w_inc)
        elif kind == "exclusive":
            run = F.coalesce(F.sum(as_col(ic)).over(w_exc), F.lit(0))
        else:  # pragma: no cover - spec error
            raise ValueError(f"unknown cumsum kind {kind!r} for {name}")
        out = out.withColumn(name, run + F.col(f"_o_{name}"))
    return out.drop("_pid", *[f"_o_{name}" for name in sums])


def percent_rank_col(rank: str, n: str):
    """SQL percent_rank from an exact rank: (rank-1)/(n-1), 0 for n=1."""
    return F.when(
        F.col(n) > 1, (F.col(rank) - 1) / (F.col(n) - 1)
    ).otherwise(F.lit(0.0))


def ntile_col(rank: str, n: str, k: int):
    """SQL ntile(k) from an exact rank: the first n%k buckets take
    ceil(n/k) rows, the rest floor(n/k) — bit-identical to the window
    function, no window required."""
    q = F.floor(F.col(n) / k)
    rem = F.col(n) % k
    threshold = rem * (q + 1)
    r = F.col(rank)
    return F.when(
        r <= threshold, F.floor((r - 1) / (q + 1)) + 1
    ).otherwise(
        # greatest(q,1): q=0 only when n<k, where the first branch always
        # wins — guard keeps the unevaluated branch from dividing by zero
        rem + F.floor((r - threshold - 1) / F.greatest(q, F.lit(1))) + 1
    )
