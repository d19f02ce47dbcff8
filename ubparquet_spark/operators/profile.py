"""Table profiling: per-column null/distinct/min/max statistics.

The data-engineering staple (Deequ/Great-Expectations shape): one row
per column with row count, null count, exact distinct count and typed
min/max — the first query anyone runs against an unfamiliar 100 TB
table, and the backbone of schema-drift monitors.

Plan shape (round 11, guide §2.3): ONE aggregation branch PER COLUMN,
unioned. Each branch scans only its own column (columnar source ⇒ the
union's total I/O equals one scan of all profiled columns), computes
count/nulls/min/max alongside a single ``countDistinct`` — ONE distinct
aggregate never triggers the distinct-rewrite Expand that stacking N
``countDistinct`` calls in one groupBy would (that rewrite multiplies
the scan N× through an Expand node, the measured ~25× regression
documented in ``plans/tpch.q_sketch_stats``) — and Spark plans it as
partial-aggregate-by-value → exchange(value) → merge: fully parallel,
map-side combined, memory O(distinct values per partition).

This replaced the round-9 two-pass form (typed aggregate + ONE
long-format ``(column, value-as-string)`` unpivot shuffle for all
distinct counts): the long format exploded N struct rows per input row
and cast every value to string before the exchange, so the shuffle
carried wide strings where the per-column branches shuffle NATIVE
values (a bigint column's distinct set moves as 8-byte longs, guide
§2.3 "narrower types") with no ``column`` tag and no explode.
Measured at sf0.1 on lineitem ×11 columns: 4.61 s → 2.14 s best-of-3
(plans/r11/q_profile_lineitem_{before,after}.txt); the union's
branches are independent stages that backfill each other's tails.

Exact distinct over a near-unique column still shuffles ~its full value
set; for monitoring at extreme scale swap ``countDistinct`` for
``approx_count_distinct`` (rsd-bounded, no value shuffle) — the exact
form is the oracle-checkable default here.

Min/max are computed on the NATIVE type (string min of a numeric column
would order lexically) and stringified only for the uniform output
schema.

Stringification contract: values are rendered with Spark's native
``CAST(... AS STRING)``. For floating-point columns Spark switches to
scientific notation at ``|x| >= 1e7`` (``'1.0E7'``) where DuckDB's
``CAST(... AS VARCHAR)`` prints plain decimal — so oracle-checked
callers must keep double columns under that magnitude (the registered
``q_profile_lineitem`` columns all do) or pre-quantize to integer cents
the way the money plans do. Integer/decimal/date/string columns render
identically in both engines at any magnitude.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """One row per column: n_rows, n_null, n_distinct, min/max (strings).

    ``n_distinct`` excludes NULL (SQL COUNT(DISTINCT) semantics).
    Min/max strings use Spark-native casts — double columns with
    ``|x| >= 1e7`` render in scientific notation (see module contract);
    keep oracle-compared double columns under that magnitude."""
    cols = list(cols) if cols is not None else list(df.columns)
    # one branch per column: its scan prunes to that column alone, and the
    # single countDistinct plans as partial-by-value → exchange → merge
    # (no Expand — pinned by test_profile_table_no_expand_in_plan)
    branches = [
        df.select(F.col(c).alias("_v")).agg(
            F.lit(c).alias("column"),
            F.count(F.lit(1)).alias("n_rows"),
            # sum over an empty table is NULL in both engines — no
            # coalesce, matching the oracle's SUM(CASE ...) exactly
            F.sum(F.col("_v").isNull().cast("long")).alias("n_null"),
            F.countDistinct("_v").alias("n_distinct"),
            F.min("_v").cast("string").alias("min_value"),
            F.max("_v").cast("string").alias("max_value"),
        )
        for c in cols
    ]
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out.select(
        "column", "n_rows", "n_null", "n_distinct", "min_value", "max_value"
    )
