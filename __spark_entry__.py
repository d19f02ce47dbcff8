"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TPC-H Q1 pricing summary on sf0.001."""
    from ubparquet_spark.plans import tpch

    return tpch.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def _registry() -> dict[str, tuple]:
    """name -> (fn, oracle_sql | None), collected from plan modules.

    Imports are deliberately NOT wrapped in try/except: a broken plan module
    must fail loudly here rather than silently shrinking the registry."""
    from ubparquet_spark.plans import events, similarity, text, tpch

    reg: dict[str, tuple] = {}
    for mod in (tpch, events, text, similarity):
        overlap = reg.keys() & mod.QUERIES.keys()
        assert not overlap, f"duplicate query names: {overlap}"
        reg.update(mod.QUERIES)
    return reg


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_fn, sql) in _registry().items() if sql is not None
    }
