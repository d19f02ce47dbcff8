"""Time-range (temporal proximity) join as a bucketed equi-join.

The reference's only non-equi join is the 3-D spatial radius self-join
(``/root/reference/larennet/larennet.py:55``, SURVEY.md J3), implemented in
this repo as a grid-bucketed equi-join (``operators/spatial.py``). This
module is the 1-D temporal analog: pair rows whose timestamps fall within a
bounded gap of each other, without ever planning a nested-loop join.

Why not just ``a.join(b, (b.ts > a.ts) & (b.ts <= a.ts + gap))``? A pure
range predicate gives Catalyst no equi-key, so the physical plan is a
BroadcastNestedLoopJoin (O(n*m) comparisons, and only legal when one side
fits in memory). Bucketing time into gap-sized cells turns the range join
into a shuffle hash join on ``(keys..., cell)``:

- every right row lands in exactly one cell ``floor(t / gap)``;
- a left row at time t can only match right rows in cell(t) or cell(t)+1,
  so the left side is duplicated 2x (constant factor, independent of data
  size) and joined on the exact cell;
- the exact ``0 < t_r - t_l <= gap`` filter runs post-join on the tiny
  candidate set.

At 100 TB this is one shuffle on ``(keys, cell)``; per-key skew (one hot
user) is handled by AQE skew-join splitting since the join is a plain
equi-join. Memory is bounded per cell, not per key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CELL = "__trj_cell"
_LT = "__trj_lt"
_RT = "__trj_rt"


def _epoch_micros(df: DataFrame, col_name: str):
    """Exact integer microseconds since epoch, for TIMESTAMP or TIMESTAMP_NTZ.

    ``unix_micros`` rejects TIMESTAMP_NTZ; for NTZ we take a wall-clock
    ``timestampdiff`` against the NTZ epoch — pure integer arithmetic, no
    session-timezone dependence (a cast to LTZ would shift across DST)."""
    if dict(df.dtypes)[col_name] == "timestamp_ntz":
        return F.expr(
            "timestampdiff(MICROSECOND, "
            f"to_timestamp_ntz('1970-01-01 00:00:00'), `{col_name}`)"
        )
    return F.unix_micros(F.col(col_name))


def time_range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    max_gap_seconds: float,
) -> DataFrame:
    """Inner-join rows where ``right_ts`` is in ``(left_ts, left_ts + gap]``.

    ``on`` columns must exist on both sides; all other column names must be
    disjoint between ``left`` and ``right`` (rename before calling). The
    strict lower bound excludes self-pairs when both sides are the same
    table, matching ``b.ts > a.ts AND b.ts <= a.ts + INTERVAL gap`` SQL.
    """
    if not on:
        raise ValueError("time_range_join requires at least one equi-key")
    gap_us = int(round(max_gap_seconds * 1_000_000))
    if gap_us <= 0:
        raise ValueError("max_gap_seconds must be positive")

    l_us = _epoch_micros(left, left_ts)
    r_us = _epoch_micros(right, right_ts)
    l_cell = F.floor(l_us / F.lit(gap_us))
    # left row duplicated into its own cell and the next one — the only two
    # cells a match within (t, t+gap] can live in.
    lhs = left.withColumn(_LT, l_us).withColumn(
        _CELL, F.explode(F.array(l_cell, l_cell + F.lit(1)))
    )
    rhs = right.withColumn(_RT, r_us).withColumn(
        _CELL, F.floor(r_us / F.lit(gap_us))
    )
    keys = [*on, _CELL]
    return (
        lhs.join(rhs, on=keys, how="inner")
        .filter(
            (F.col(_RT) > F.col(_LT))
            & (F.col(_RT) <= F.col(_LT) + F.lit(gap_us))
        )
        .drop(_CELL, _LT, _RT)
    )


def event_pairs_within(
    df: DataFrame,
    ts_col: str,
    id_col: str,
    keys: Sequence[str],
    max_gap_seconds: float,
) -> DataFrame:
    """All ordered pairs of rows sharing ``keys`` with the second row's
    timestamp within ``(t, t + gap]`` of the first's.

    Output: ``keys..., <id>_a, <id>_b, gap_us`` (microsecond gap, exact
    integer — stable across engines, unlike truncating second diffs).
    """
    a = df.select(
        *keys, F.col(id_col).alias(f"{id_col}_a"), F.col(ts_col).alias("__ts_a")
    )
    b = df.select(
        *keys, F.col(id_col).alias(f"{id_col}_b"), F.col(ts_col).alias("__ts_b")
    )
    paired = time_range_join(
        a, b, on=list(keys), left_ts="__ts_a", right_ts="__ts_b",
        max_gap_seconds=max_gap_seconds,
    )
    gap = _epoch_micros(paired, "__ts_b") - _epoch_micros(paired, "__ts_a")
    return paired.select(
        *keys, f"{id_col}_a", f"{id_col}_b", gap.alias("gap_us")
    )


def interval_overlap_self_join(
    intervals: DataFrame,
    *,
    id_cols: Sequence[str],
    start_col: str = "s_us",
    end_col: str = "e_us",
    cell_us: int = 3600 * 1000000,
    partition_col: str | None = None,
) -> DataFrame:
    """Pairs of overlapping intervals with DISTINCT first-id values
    (exact integer-microsecond bounds), as a cell-bucketed equi-join —
    the interval×interval analog of :func:`time_range_join` (never a
    theta join over the full table). The once-per-pair dedup orders on
    ``id_cols[0]`` alone, so two intervals sharing the first id (e.g.
    two sessions of the same user) are NOT emitted — the contract the
    cross-entity use cases want; compare a composite key yourself if you
    need same-entity pairs.

    Each interval explodes into the ``cell_us``-wide cells it covers
    (bounded by interval length / cell width), candidates equi-join on
    the cell key, duplicates from multi-cell overlaps collapse via
    identical-value max, and the exact ``overlap > 0`` filter runs on the
    candidate set. ``partition_col`` optionally restricts pairs to equal
    values (e.g. a tenant key); pairs are emitted once with
    ``a.<id> < b.<id>`` on the first id column.

    Returns one row per overlapping pair: the a-side ids (``a_<id>``),
    b-side ids (``b_<id>``), and ``overlap_us``."""
    cells = intervals.select(
        *([partition_col] if partition_col else []),
        *id_cols,
        F.col(start_col).alias("_s"),
        F.col(end_col).alias("_e"),
        F.explode(
            F.expr(f"sequence({start_col} DIV {cell_us}, {end_col} DIV {cell_us})")
        ).alias("_cell"),
    )
    a, b = cells.alias("a"), cells.alias("b")
    cond = (F.col("a._cell") == F.col("b._cell")) & (
        F.col(f"a.{id_cols[0]}") < F.col(f"b.{id_cols[0]}")
    )
    if partition_col:
        cond = cond & (F.col(f"a.{partition_col}") == F.col(f"b.{partition_col}"))
    overlap = F.least(F.col("a._e"), F.col("b._e")) - F.greatest(
        F.col("a._s"), F.col("b._s")
    )
    out_ids = [F.col(f"a.{c}").alias(f"a_{c}") for c in id_cols] + [
        F.col(f"b.{c}").alias(f"b_{c}") for c in id_cols
    ]
    return (
        a.join(b, cond)
        .filter(overlap > 0)
        .select(
            *([F.col(f"a.{partition_col}").alias(partition_col)]
              if partition_col else []),
            *out_ids,
            overlap.alias("overlap_us"),
        )
        .groupBy(
            *([partition_col] if partition_col else []),
            *[f"a_{c}" for c in id_cols],
            *[f"b_{c}" for c in id_cols],
        )
        .agg(F.max("overlap_us").alias("overlap_us"))
    )
