"""Table profiling: per-column null/distinct/min/max statistics.

The data-engineering staple (Deequ/Great-Expectations shape): one row
per column with row count, null count, exact distinct count and typed
min/max — the first query anyone runs against an unfamiliar 100 TB
table, and the backbone of schema-drift monitors.

Plan shape (two scans, no Expand):

1. typed pass — ONE aggregation computes every column's null count and
   min/max (plain aggregates fuse into a single hash-aggregate; they
   never trigger the distinct-rewrite Expand that stacking N
   ``countDistinct`` calls in one groupBy would — that rewrite
   multiplies the scan N× through an Expand node, the measured ~25×
   regression documented in ``plans/tpch.q_sketch_stats``);
2. distinct pass — columns unpivot to (column, value-as-string) long
   format (a narrow map), then ``groupBy(column, value)`` with map-side
   combine collapses duplicates before ONE shuffle, and a second-level
   count per column yields every column's exact distinct count from a
   single exchange.

Exact distinct over a near-unique column shuffles ~its full value set;
for monitoring at extreme scale swap pass 2 for
``approx_count_distinct`` (rsd-bounded, one pass, no long format) — the
exact form is the oracle-checkable default here.

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
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"_null_{c}")
        )
        aggs.append(F.min(c).cast("string").alias(f"_min_{c}"))
        aggs.append(F.max(c).cast("string").alias(f"_max_{c}"))
    typed = df.agg(*aggs)
    long_rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("value"),
                    )
                    for c in cols
                ]
            )
        ).alias("e")
    ).select("e.column", "e.value")
    distincts = (
        long_rows.filter(F.col("value").isNotNull())
        .groupBy("column", "value")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy("column")
        .agg(F.count(F.lit(1)).alias("n_distinct"))
    )
    # ONE reference to the 1-row aggregate: explode it into per-column
    # rows (a union of 11 selects would re-run the aggregation subtree
    # once per branch — measured 26 Exchanges vs 3)
    wide = typed.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col("n_rows").alias("n_rows"),
                        F.col(f"_null_{c}").alias("n_null"),
                        F.col(f"_min_{c}").alias("min_value"),
                        F.col(f"_max_{c}").alias("max_value"),
                    )
                    for c in cols
                ]
            )
        ).alias("e")
    ).select("e.column", "e.n_rows", "e.n_null", "e.min_value", "e.max_value")
    return wide.join(distincts, "column", "left").select(
        "column",
        "n_rows",
        "n_null",
        F.coalesce("n_distinct", F.lit(0)).alias("n_distinct"),
        "min_value",
        "max_value",
    )
