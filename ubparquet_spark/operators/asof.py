"""As-of (point-in-time) join — an operator Spark lacks natively.

For every left row, find the single most recent right row with
``right_ts <= left_ts`` within the same key (inclusive, matching DuckDB /
kdb+ ASOF semantics). The classic implementation choices are a range join
(O(n·m) per key) or a sort-merge; Spark-first, we use the union+window
technique:

  1. tag and union both sides,
  2. one window per key ordered by (ts, side) — right rows sort before
     left rows at equal timestamps so ties are inclusive,
  3. ``last(right_payload, ignoreNulls=True)`` over the unbounded-preceding
     frame carries the latest right row forward,
  4. keep the left rows.

Cost: ONE shuffle on the key + a linear window pass — the same shape as a
sort-merge join, no per-key quadratic work, no skew beyond what the key
distribution already has. At 100 TB this is the right plan: both inputs
co-partition on the key and stream through the window in timestamp order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    *,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Left rows + the latest right payload at or before each left row's
    timestamp. Left rows with no prior right row carry nulls.

    NULL-key semantics match an equi join (DuckDB/kdb ASOF): a NULL in
    any ``on`` key never matches — right rows with a NULL key are
    dropped here (they could match nothing), and left rows with a NULL
    key are KEPT with a null payload. Without the explicit right-side
    filter the union+window technique would group NULL keys into one
    window partition and happily match NULL-key lefts to NULL-key
    rights (round-7 null-key sweep finding). A NULL ``right_ts`` also
    never matches (it cannot be "at or before" anything); NULL
    ``left_ts`` rows keep a null payload for the same reason."""
    lcols = left.columns
    no_match = F.col(right_ts).isNull()
    for k in on:
        no_match = no_match | F.col(k).isNull()
    right = right.filter(~no_match)
    # Carry ONE struct per right row (never-null on the right side) rather
    # than last(col, ignoreNulls) per payload column: per-column carry would
    # treat a NULL payload value in the latest right row as "no row" and
    # reach back to an older row's value — diverging from DuckDB/kdb ASOF
    # semantics (match the latest row regardless of payload nullness) and
    # potentially stitching columns from DIFFERENT right rows.
    right_struct_t = (
        "struct<"
        + ",".join(f"`{c}`:{dict(right.dtypes)[c]}" for c in right_payload)
        + ">"
    )
    tagged_left = left.select(
        *[F.col(c) for c in lcols],
        F.lit(1).alias("_side"),
        F.col(left_ts).alias("_ts"),
        F.lit(None).cast(right_struct_t).alias("_r"),
    )
    tagged_right = right.select(
        *[
            F.col(c) if c in on else F.lit(None).cast(dict(left.dtypes).get(c, "string")).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("_side"),
        F.col(right_ts).alias("_ts"),
        F.struct(*[F.col(c) for c in right_payload]).alias("_r"),
    )
    unioned = tagged_left.unionByName(tagged_right)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.asc("_ts"), F.asc("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *lcols,
        "_side",
        F.last("_r", ignorenulls=True).over(w).alias("_r_latest"),
    )
    return carried.filter(F.col("_side") == 1).select(
        *lcols,
        *[
            F.col(f"_r_latest.{c}").alias(f"{prefix}{c}")
            for c in right_payload
        ],
    )
