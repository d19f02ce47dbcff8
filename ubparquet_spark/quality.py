"""Data-quality checks: the reference's inline invariants as queries.

The reference asserts correctness ad-hoc inside loading code — duplicate
voxel coords (``larvoxel_dataset.py:101-110``), plane-index bounds
(``make_larmatch_parquet_data.py:94-97``), round-trip prints
(``readparquet.py:37-42``). Here each invariant is a DataFrame query that
returns its VIOLATIONS (empty result = healthy), so the same checks run as
unit tests, as batch audits over a whole 100 TB lake, or as streaming
monitors — they're plans, not procedural asserts.

Corresponds to FIXTURES.md §C invariants C2-C6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ubparquet_spark.codec import shape_column, tensor_columns


def check_unique_key(df: DataFrame, keys: list[str]) -> DataFrame:
    """C6: the composite key is unique — returns duplicated key tuples."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


def check_shape_products(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """C2: ``product(X_shape) == size(X)`` for every tensor pair."""
    from ubparquet_spark.codec import validate_tensors

    return validate_tensors(df, cols)


def check_parallel_leading_dims(
    df: DataFrame, cols: list[str], keys: list[str]
) -> DataFrame:
    """C5: parallel tensors of one event share the leading dimension N —
    returns rows where any listed tensor disagrees with the first."""
    first = F.element_at(F.col(shape_column(cols[0])), 1)
    conds = [
        F.element_at(F.col(shape_column(c)), 1) != first for c in cols[1:]
    ]
    bad = conds[0]
    for c in conds[1:]:
        bad = bad | c
    return df.filter(bad).select(
        *keys,
        *[F.element_at(F.col(shape_column(c)), 1).alias(f"n_{c}") for c in cols],
    )


def check_value_bounds(
    df: DataFrame,
    col: str,
    *,
    lo: float | None = None,
    hi: float | None = None,
    keys: list[str] = (),
) -> DataFrame:
    """C4-style bounds over a flattened array column (e.g. plane indices
    below image width): returns per-row min/max where any element is out
    of [lo, hi]."""
    arr_min = F.array_min(F.col(col))
    arr_max = F.array_max(F.col(col))
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (arr_min < lo)
    if hi is not None:
        cond = cond | (arr_max > hi)
    return df.filter(cond).select(
        *keys, arr_min.alias(f"min_{col}"), arr_max.alias(f"max_{col}")
    )


def check_no_duplicate_points(
    df: DataFrame, coord_col: str, keys: list[str]
) -> DataFrame:
    """C3: no duplicate coordinate rows within an event (the voxel-coord
    invariant) — operates directly on flattened storage via the per-point
    view."""
    from ubparquet_spark.codec import explode_tensor

    pts = explode_tensor(df, coord_col, list(keys))
    return (
        pts.groupBy(*keys, f"{coord_col}_point")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


def audit(df: DataFrame, keys: list[str]) -> dict[str, int]:
    """Run the generic checks and return violation counts per check —
    the whole-lake health report."""
    out = {
        "unique_key": check_unique_key(df, keys).count(),
        "shape_products": check_shape_products(df).count(),
    }
    tcols = tensor_columns(df)
    if len(tcols) >= 2:
        out["parallel_leading_dims"] = check_parallel_leading_dims(
            df, tcols, keys
        ).count()
    return out


# ---------------------------------------------------------------------------
# Relational invariants for the analytics star schema — the checks a lake
# runs after every ingest. Same design as the tensor invariants above:
# each check is a PLAN returning its violations, so it runs as a unit
# test, a 100 TB batch audit, or a foreachBatch streaming monitor.
# ---------------------------------------------------------------------------


def check_referential_integrity(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str
) -> DataFrame:
    """Orphaned foreign keys: child rows whose key has no parent. One
    left-anti join; Spark broadcasts the parent when it is dim-sized.

    NULL child keys follow SQL FK semantics — not violations (pair with a
    separate not-null check when the column is mandatory)."""
    return (
        child.select(F.col(child_key).alias("orphan_key"))
        .filter(F.col("orphan_key").isNotNull())
        .distinct()
        .join(
            parent.select(F.col(parent_key).alias("orphan_key")).distinct(),
            "orphan_key",
            "left_anti",
        )
    )


def check_derived_column(
    df: DataFrame, derived: str, expr: F.Column, keys: list[str]
) -> DataFrame:
    """Stored-vs-recomputed consistency (e.g. documents.n_chars vs
    length(text)): returns rows where the stored value disagrees."""
    return df.filter(~F.col(derived).eqNullSafe(expr)).select(
        *keys, F.col(derived).alias("stored"), expr.alias("recomputed")
    )


def audit_star_schema(spark, sf_dir: str) -> dict[str, int]:
    """Violation counts for the driver schema's FK edges + derived
    columns. Empty values everywhere = healthy lake."""
    from ubparquet_spark.io import load_table

    t = {n: load_table(spark, sf_dir, n) for n in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "documents",
    )}
    checks = {
        "orders.custkey->customer": check_referential_integrity(
            t["orders"], t["customer"], "o_custkey", "c_custkey"),
        "lineitem.orderkey->orders": check_referential_integrity(
            t["lineitem"], t["orders"], "l_orderkey", "o_orderkey"),
        "lineitem.partkey->part": check_referential_integrity(
            t["lineitem"], t["part"], "l_partkey", "p_partkey"),
        "lineitem.suppkey->supplier": check_referential_integrity(
            t["lineitem"], t["supplier"], "l_suppkey", "s_suppkey"),
        "customer.nationkey->nation": check_referential_integrity(
            t["customer"], t["nation"], "c_nationkey", "n_nationkey"),
        "nation.regionkey->region": check_referential_integrity(
            t["nation"], t["region"], "n_regionkey", "r_regionkey"),
        "documents.n_chars==len(text)": check_derived_column(
            t["documents"], "n_chars",
            F.length("text").cast("long"), ["doc_id"]),
        "orders.orderkey unique": check_unique_key(t["orders"], ["o_orderkey"]),
        "documents.doc_id unique": check_unique_key(t["documents"], ["doc_id"]),
    }
    return {name: df.count() for name, df in checks.items()}
