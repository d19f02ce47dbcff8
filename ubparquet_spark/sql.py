"""Raw-SQL entry point: register the engine's tables as temp views.

The reference exposes its data through a Python reader class
(``/root/reference/readparquet.py:8`` — eager, whole-file); the Spark-first
equivalent is the SQL catalog: register every driver table once and any
ANSI SQL runs against them with full Catalyst optimization (pushdown,
pruning, AQE) — the same plans the DataFrame API builds.

Usage::

    from ubparquet_spark.sql import register_views
    register_views(spark, "/root/testdata/sf0.01")
    spark.sql("SELECT l_returnflag, count(*) FROM lineitem GROUP BY 1")

Views are lazy — registration costs one schema read per table, no scan.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ubparquet_spark.io import DRIVER_TABLES, load_table


def register_views(
    spark: SparkSession,
    sf_dir: str,
    *,
    tables: tuple[str, ...] | None = None,
    prefix: str = "",
) -> list[str]:
    """Register each table as a (session-scoped) temp view named
    ``<prefix><table>``; returns the view names. ``events.ts`` gets the
    same nanos→timestamp normalization as ``load_table``, so SQL over the
    views matches the DataFrame plans exactly."""
    names = []
    for t in tables or DRIVER_TABLES:
        name = f"{prefix}{t}"
        load_table(spark, sf_dir, t).createOrReplaceTempView(name)
        names.append(name)
    return names
