"""Relational query surface over the TPC-H-ish star schema.

These plans exercise the reference's relational operator inventory
(SURVEY.md §2.2-2.5) on the driver's synthetic tables: conjunctive
predicates and point lookups (P4/P6, reference
``larmatch2d/larmatch_dataset.py:138``), group-by aggregation (A1-A8),
broadcast lookup joins (J1, ``view_voxel_data.ipynb:cell-5``), dedup audits
(A1, ``larvoxel_dataset.py:101-110``), mode/majority vote (A3,
``voxel_to_instance_data.py:63``), window cumulative offsets (W4,
``larvoxel_dataset.py:263-278``) and top-k (W3).

Numeric policy: every monetary double is converted to exact integer cents
(or DECIMAL(18,2) where only per-row min/max is needed) before aggregation,
so sums are exact and independent of partial-aggregation order — the result
hash-matches the DuckDB oracle bit-for-bit regardless of shuffle layout. The
oracle SQL keeps DECIMAL arithmetic: both paths produce the same exact
rational, hence the same correctly-rounded double.

Scale notes (100 TB design):
- ``nation``/``region``/``supplier`` are broadcast; Catalyst picks broadcast
  hash join under the configured threshold, and dimension tables stay small
  by construction.
- Fact-fact joins (orders x lineitem) shuffle on the join key; AQE handles
  skew. At warehouse scale, bucketing both tables on the orderkey would
  remove the shuffle entirely — the write path in ``io.write_parquet``
  supports sorted partitioned layouts.
- Filters are expressed on base columns before joins so they push into the
  Parquet scan (verified via ``explain`` in tests/test_plans_physical.py).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ubparquet_spark.io import load_table


def money(c: str | Column) -> Column:
    """Exact-decimal view of a 2-decimal monetary double column."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("decimal(18,2)")


def cents(c: str) -> Column:
    """Exact integer-cents view of a 2-decimal monetary double.

    Long arithmetic sums ~2.6x faster than Spark's decimal(18,2) sums (which
    widen to a 128-bit accumulator) and yields the same exact rational, so
    ``sum(cents)/100.0`` is bit-identical to ``CAST(sum(decimal) AS DOUBLE)``
    (the oracle side keeps DECIMAL). Safe while totals stay below 2^53 of
    the scaled unit."""
    return F.expr(f"CAST(floor({c} * 100 + 0.5) AS BIGINT)")


def sum_money(c: str) -> Column:
    """Exact sum of a 2-decimal column, as double."""
    return F.sum(cents(c)) / F.lit(100.0)


def sum_revenue(price: str, disc: str) -> Column:
    """Exact ``sum(price * (1 - disc))`` for 2-decimal columns: integer
    product in 1e-4 units.  The PRODUCT stays in fast long arithmetic
    (~1e9 per term, far within BIGINT); the SUM accumulates in
    decimal(38,0) — at 100 TB (lineitem ~6e11 rows) a BIGINT revenue sum
    reaches ~1e20 and wraps silently in non-ANSI mode, while DuckDB's
    SUM(BIGINT) widens to HUGEINT.  Both engines then round the same
    exact rational to double."""
    return F.sum(
        (cents(price) * (F.lit(100) - cents(disc))).cast("decimal(38,0)")
    ) / F.lit(10000.0)


def dbl(c: Column) -> Column:
    return c.cast("double")


def roundn(c: Column, n: int = 4) -> Column:
    """Cross-engine-stable rounding: ``floor(x*10^n + 0.5) / 10^n``.

    Spark's ``round`` on doubles rounds the shortest decimal *string*
    (Java HALF_UP on ``Double.toString``), while DuckDB rounds the binary
    double numerically — near ``.xxx5`` boundaries they disagree. Floor on
    identical double arithmetic is bit-identical in both engines."""
    s = 10 ** n
    return (F.floor(c.cast("double") * s + F.lit(0.5)) / s).cast("double")


def hash_unit(col: Column, salt: str, mod: int) -> Column:
    """Deterministic uniform draw in [0, 1) from a salted md5 of ``col`` —
    the reproducible sampling gate shared by the mixture/weighted samplers
    (stable across engines, reruns, task retries, and cluster layouts,
    unlike ``rand()``). Cross-engine-sensitive expression: 15 hex digits
    (< 2^60, fits BIGINT) → base conversion → modulus — keep this and
    :func:`sql_hash_unit` in lockstep."""
    return (
        F.conv(F.substring(F.md5(F.concat(col.cast("string"), F.lit(salt))), 1, 15), 16, 10)
        .cast("long")
        % mod
    ) / float(mod)


def sql_hash_unit(expr: str, salt: str, mod: int) -> str:
    """DuckDB twin of :func:`hash_unit`."""
    return (
        f"(CAST('0x' || substr(md5(CAST({expr} AS VARCHAR) || '{salt}'), 1, 15)"
        f" AS BIGINT) % {mod}) / {float(mod)}"
    )


def sql_roundn(expr: str, n: int = 4) -> str:
    s = 10 ** n
    return f"FLOOR(({expr}) * {s} + 0.5) / {s}"


# ---------------------------------------------------------------------------
# Q1 — pricing summary (flagship: scan → filter → groupBy agg)
# ---------------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p, d, t, q = (
        cents("l_extendedprice"),
        cents("l_discount"),
        cents("l_tax"),
        cents("l_quantity"),
    )
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(q) / F.lit(100.0)).alias("sum_qty"),
            (F.sum(p) / F.lit(100.0)).alias("sum_base_price"),
            # decimal(38,0) accumulation for the 1e9/1e11-per-term products
            # (see sum_revenue): BIGINT wraps at ~1e10/1e8 rows per group
            (F.sum((p * (F.lit(100) - d)).cast("decimal(38,0)")) / F.lit(10000.0)).alias("sum_disc_price"),
            (F.sum((p * (F.lit(100) - d) * (F.lit(100) + t)).cast("decimal(38,0)")) / F.lit(1000000.0)).alias("sum_charge"),
            roundn(F.sum(q) / F.lit(100.0) / n).alias("avg_qty"),
            roundn(F.sum(p) / F.lit(100.0) / n).alias("avg_price"),
            roundn(F.sum(d) / F.lit(100.0) / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


Q1_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
  FLOOR((CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)) * 10000 + 0.5) / 10000 AS avg_qty,
  FLOOR((CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)) * 10000 + 0.5) / 10000 AS avg_price,
  FLOOR((CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)) * 10000 + 0.5) / 10000 AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# Q3 — shipping priority (fact-fact join + agg + deterministic top-k)
# ---------------------------------------------------------------------------

def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp")
    )
    # two-phase: per-order exact-cents revenue before the join (see q10)
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))).alias("_rc")
    )
    return (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum("_rc") / F.lit(10000.0)).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT
  o_orderkey, o_orderdate, o_orderpriority,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND l_shipdate > TIMESTAMP '1997-01-01'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# Q5 — local supplier volume (multi-way join incl. broadcast dims)
# ---------------------------------------------------------------------------

def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(cust.c_nationkey == supp.s_nationkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(sum_revenue("l_extendedprice", "l_discount").alias("revenue"))
    )


Q5_SQL = """
SELECT
  n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND r_name = 'ASIA'
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# Point lookup + range predicates (P4/P6) — the reference's
# run/subrun/event lookup pattern (larmatch_dataset.py:137-142)
# ---------------------------------------------------------------------------

def q_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # conjunctive equality/range predicate pushed to the Parquet scan
    target = orders.filter(
        (F.col("o_orderkey") >= 100) & (F.col("o_orderkey") < 105)
    )
    return (
        li.join(F.broadcast(target), li.l_orderkey == target.o_orderkey)
        .select(
            "o_orderkey",
            "o_orderdate",
            "l_linenumber",
            "l_partkey",
            money("l_extendedprice").cast("double").alias("price"),
        )
    )


Q_POINT_LOOKUP_SQL = """
SELECT o_orderkey, o_orderdate, l_linenumber, l_partkey,
       CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS price
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderkey >= 100 AND o_orderkey < 105
"""


# ---------------------------------------------------------------------------
# Dedup audit (A1) — groupBy key, flag count > 1
# (reference invariant: no duplicate voxel coords, larvoxel_dataset.py:101-110)
# ---------------------------------------------------------------------------

def q_dedup_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey", "l_partkey")
        .agg(F.count(F.lit(1)).alias("n_dup"))
        .filter(F.col("n_dup") > 1)
    )


Q_DEDUP_AUDIT_SQL = """
SELECT l_orderkey, l_partkey, COUNT(*) AS n_dup
FROM lineitem
GROUP BY l_orderkey, l_partkey
HAVING COUNT(*) > 1
"""


# ---------------------------------------------------------------------------
# Distinct (A2) + min/max sanity bounds (A7)
# ---------------------------------------------------------------------------

def q_distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.select("c_mktsegment").distinct()


Q_DISTINCT_SQL = "SELECT DISTINCT c_mktsegment FROM customer"


def q_sanity_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global min/max/count sanity aggregate — the reference's plane-index
    bound check (make_larmatch_parquet_data.py:94-97) as a query."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.min("l_shipdate").alias("min_shipdate"),
        F.max("l_shipdate").alias("max_shipdate"),
        (F.min(cents("l_quantity")) / F.lit(100.0)).alias("min_qty"),
        (F.max(cents("l_quantity")) / F.lit(100.0)).alias("max_qty"),
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


Q_SANITY_SQL = """
SELECT
  MIN(l_shipdate) AS min_shipdate,
  MAX(l_shipdate) AS max_shipdate,
  CAST(MIN(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS min_qty,
  CAST(MAX(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS max_qty,
  COUNT(*) AS n_rows,
  COUNT(DISTINCT l_orderkey) AS n_orders
FROM lineitem
"""


# ---------------------------------------------------------------------------
# Value-sanity audit (round 7): the "measure before you trust" gate for
# money/measure columns — the q_key_skew_profile sibling on the VALUE
# axis. The repo-wide exact-cents convention (cents()/sum_money())
# deliberately FAILS LOUDLY on NaN/Infinity in both engines (Spark ANSI
# long overflow, DuckDB NaN->INT64 conversion error) rather than
# silently nulling corrupt money data; this query is the tool you run
# FIRST on an untrusted corpus to find such rows. One
# partial-aggregatable pass per audited column, one bounded row each —
# no shuffle beyond the final 4-row union.
# ---------------------------------------------------------------------------

_SANITY_COLS = [
    ("events", "value"),
    ("orders", "o_totalprice"),
    ("lineitem", "l_extendedprice"),
    ("lineitem", "l_quantity"),
]


def q_value_sanity(spark: SparkSession, sf_dir: str) -> DataFrame:
    outs = []
    for t, c in _SANITY_COLS:
        v = F.col(c)
        finite = (
            v.isNotNull()
            & ~F.isnan(v)
            & (v != F.lit(float("inf")))
            & (v != F.lit(float("-inf")))
        )
        agg = load_table(spark, sf_dir, t).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(v.isNull(), 1).otherwise(0)).alias("n_null"),
            F.sum(F.when(v.isNotNull() & F.isnan(v), 1).otherwise(0)).alias(
                "n_nan"
            ),
            F.sum(
                F.when(v == F.lit(float("inf")), 1).otherwise(0)
            ).alias("n_posinf"),
            F.sum(
                F.when(v == F.lit(float("-inf")), 1).otherwise(0)
            ).alias("n_neginf"),
            F.sum(F.when(finite & (v < 0), 1).otherwise(0)).alias(
                "n_negative"
            ),
            # exact integer cents over the FINITE slice only — order-
            # independent, safe regardless of what the corrupt rows hold
            F.sum(
                F.when(finite, cents(c)).cast("decimal(38,0)")
            ).cast("double").alias("sum_finite_cents"),
        )
        outs.append(
            agg.select(
                F.lit(t).alias("table_name"),
                F.lit(c).alias("column_name"),
                "*",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


Q_VALUE_SANITY_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{t}' AS table_name, '{c}' AS column_name,
  COUNT(*) AS n_rows,
  CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
  CAST(SUM(CASE WHEN isnan({c}) THEN 1 ELSE 0 END) AS BIGINT) AS n_nan,
  CAST(SUM(CASE WHEN {c} = CAST('inf' AS DOUBLE) THEN 1 ELSE 0 END) AS BIGINT)
    AS n_posinf,
  CAST(SUM(CASE WHEN {c} = CAST('-inf' AS DOUBLE) THEN 1 ELSE 0 END) AS BIGINT)
    AS n_neginf,
  CAST(SUM(CASE WHEN {c} IS NOT NULL AND NOT isnan({c}) AND NOT isinf({c})
                 AND {c} < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_negative,
  CAST(SUM(CASE WHEN {c} IS NOT NULL AND NOT isnan({c}) AND NOT isinf({c})
            THEN CAST(FLOOR({c} * 100 + 0.5) AS HUGEINT) END) AS DOUBLE)
    AS sum_finite_cents
FROM {t}"""
    for t, c in _SANITY_COLS
)


# ---------------------------------------------------------------------------
# Key-integrity audit (round 7): the uniqueness-contract gate — the
# third "measure before you trust" diagnostic (value axis:
# q_value_sanity; key-skew axis: q_key_skew_profile). Primary-key
# uniqueness is a DATA CONTRACT here as in any warehouse: pair
# generators (spatial/minhash/setsim) and the ranked()/blocked_cumsum
# machinery assume it, and on re-delivered duplicate rows the
# join-then-group vs group-then-join shapes legitimately diverge (the
# round-7 duplicate-row probe measured 11 such multiplicity
# divergences — every one disappears on unique keys, which the sf0.01
# gate proves). This query finds contract violations first: per keyed
# table, row count, distinct keys, duplicated keys and the worst
# multiplicity. One two-level partial-aggregatable pass per table.
# ---------------------------------------------------------------------------

_KEY_SPECS = [
    ("events", ["event_id"]),
    ("orders", ["o_orderkey"]),
    ("lineitem", ["l_orderkey", "l_linenumber"]),
    ("customer", ["c_custkey"]),
    ("documents", ["doc_id"]),
    ("embeddings", ["vec_id"]),
]


def q_key_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    outs = []
    for t, keys in _KEY_SPECS:
        per_key = (
            load_table(spark, sf_dir, t)
            .groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("_m"))
        )
        agg = per_key.agg(
            F.sum("_m").alias("n_rows"),
            F.count(F.lit(1)).alias("n_keys"),
            F.sum(F.when(F.col("_m") > 1, 1).otherwise(0)).alias(
                "n_dup_keys"
            ),
            F.sum(
                F.when(F.col("_m") > 1, F.col("_m")).otherwise(0)
            ).alias("n_rows_in_dups"),
            F.max("_m").alias("max_multiplicity"),
        )
        outs.append(
            agg.select(
                F.lit(t).alias("table_name"),
                F.lit(",".join(keys)).alias("key_columns"),
                "*",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


# ---------------------------------------------------------------------------
# Referential-integrity audit (round 8): the fourth data-contract gate
# (value axis: q_value_sanity; key axis: q_key_integrity; skew axis:
# q_key_skew_profile). Joins assume their FK edges resolve; an orphan
# FK row silently VANISHES from every inner join downstream (q3/q5/q7
# would under-count revenue with no error anywhere). This gate counts,
# per declared FK edge: child rows, NULL FKs (join-dropped by
# definition), orphans (non-NULL FK with no parent), and distinct
# orphan keys. Scale shape: one left-anti-style aggregation per edge —
# the parent side ships only its DISTINCT key column (dimension-sized
# for cust/supp edges), and the child groups per FK key BEFORE the
# join, so the join carries distinct keys, not rows.
# ---------------------------------------------------------------------------

_FK_EDGES = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]


def q_ref_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    outs = []
    for child, fk, parent, pk in _FK_EDGES:
        c = (
            load_table(spark, sf_dir, child)
            .groupBy(F.col(fk).alias("_k"))
            .agg(F.count(F.lit(1)).alias("_m"))
        )
        p = load_table(spark, sf_dir, parent).select(
            F.col(pk).alias("_k")
        ).distinct()
        joined = c.join(p.withColumn("_hit", F.lit(1)), "_k", "left")
        agg = joined.agg(
            F.sum("_m").alias("n_rows"),
            F.sum(F.when(F.col("_k").isNull(), F.col("_m")).otherwise(0)).alias(
                "n_null_fk"
            ),
            F.sum(
                F.when(
                    F.col("_k").isNotNull() & F.col("_hit").isNull(), F.col("_m")
                ).otherwise(0)
            ).alias("n_orphan_rows"),
            F.sum(
                F.when(
                    F.col("_k").isNotNull() & F.col("_hit").isNull(), 1
                ).otherwise(0)
            ).alias("n_orphan_keys"),
        )
        outs.append(
            agg.select(
                F.lit(f"{child}.{fk}").alias("fk_column"),
                F.lit(f"{parent}.{pk}").alias("parent_key"),
                "*",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


Q_REF_INTEGRITY_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{child}.{fk}' AS fk_column, '{parent}.{pk}' AS parent_key,
  CAST(SUM(_m) AS BIGINT) AS n_rows,
  CAST(SUM(CASE WHEN _k IS NULL THEN _m ELSE 0 END) AS BIGINT) AS n_null_fk,
  CAST(SUM(CASE WHEN _k IS NOT NULL AND _hit IS NULL THEN _m ELSE 0 END)
       AS BIGINT) AS n_orphan_rows,
  CAST(SUM(CASE WHEN _k IS NOT NULL AND _hit IS NULL THEN 1 ELSE 0 END)
       AS BIGINT) AS n_orphan_keys
FROM (
  SELECT c._k, c._m, p._hit
  FROM (SELECT {fk} AS _k, COUNT(*) AS _m FROM {child} GROUP BY {fk}) c
  LEFT JOIN (SELECT DISTINCT {pk} AS _pk, 1 AS _hit FROM {parent}) p
  ON c._k = p._pk
)"""
    for child, fk, parent, pk in _FK_EDGES
)


# ---------------------------------------------------------------------------
# Key canonicalization (round 8): the remediation step AFTER
# q_key_integrity flags a table. The synthetic lake's lineitem composite
# key (l_orderkey, l_linenumber) is itself non-unique (11,785 duplicated
# keys at sf0.01, max multiplicity 6, payloads differing), so this plan
# remediates real violations, not a synthetic toy: one keyed shuffle +
# row_number over a TOTAL payload order picks a deterministic winner per
# key. Both engines order ascending with NULLS FIRST so the winner is
# value-identical. operators/canonical.py holds the reusable operator;
# this query pins its semantics against the DuckDB oracle.
# ---------------------------------------------------------------------------

_CANON_ORDER = [
    "l_partkey",
    "l_suppkey",
    "l_quantity",
    "l_extendedprice",
    "l_discount",
    "l_tax",
    "l_returnflag",
    "l_linestatus",
    "l_shipdate",
]


def q_canonicalize_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ubparquet_spark.operators.canonical import canonicalize_keys

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    canon = canonicalize_keys(
        li,
        ["l_orderkey", "l_linenumber"],
        [F.col(c).asc() for c in _CANON_ORDER],
    )
    return canon.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_quantity",
        dbl(money("l_extendedprice")).alias("extendedprice"),
        "l_returnflag",
    )


Q_CANONICALIZE_SQL = f"""
SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
       CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE)
         AS extendedprice,
       l_returnflag
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY l_orderkey, l_linenumber
    ORDER BY {", ".join(c + " ASC NULLS FIRST" for c in _CANON_ORDER)}
  ) AS rn
  FROM lineitem
  WHERE l_orderkey < 500
)
WHERE rn = 1
"""


Q_KEY_INTEGRITY_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{t}' AS table_name, '{",".join(keys)}' AS key_columns,
  CAST(SUM(_m) AS BIGINT) AS n_rows,
  COUNT(*) AS n_keys,
  CAST(SUM(CASE WHEN _m > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_keys,
  CAST(SUM(CASE WHEN _m > 1 THEN _m ELSE 0 END) AS BIGINT) AS n_rows_in_dups,
  CAST(MAX(_m) AS BIGINT) AS max_multiplicity
FROM (SELECT COUNT(*) AS _m FROM {t} GROUP BY {", ".join(keys)})"""
    for t, keys in _KEY_SPECS
)


# ---------------------------------------------------------------------------
# Top-k per group (W3) — deterministic row_number window
# ---------------------------------------------------------------------------

def q_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc(money("o_totalprice")), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rank_in_cust", F.row_number().over(w))
        .filter(F.col("rank_in_cust") <= 3)
        .filter(F.col("o_custkey") < 50)
        .select(
            "o_custkey",
            "o_orderkey",
            dbl(money("o_totalprice")).alias("totalprice"),
            "rank_in_cust",
        )
    )


Q_TOPK_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice,
       rank_in_cust
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (
           PARTITION BY o_custkey
           ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC, o_orderkey ASC
         ) AS rank_in_cust
  FROM orders
)
WHERE rank_in_cust <= 3 AND o_custkey < 50
"""


# ---------------------------------------------------------------------------
# Cumulative window offsets (W4) — the reference's batch-offset assignment
# (larvoxel_dataset.py:263-278) as a running-total window
# ---------------------------------------------------------------------------

def q_cumulative_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 20)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        (F.sum(cents("o_totalprice")).over(w) / F.lit(100.0)).alias("cum_total"),
    )


Q_CUMSUM_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
         PARTITION BY o_custkey
         ORDER BY o_orderdate ASC, o_orderkey ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS cum_total
FROM orders
WHERE o_custkey < 20
"""


# ---------------------------------------------------------------------------
# Semi join (EXISTS): orders having a late-shipped lineitem, per priority
# ---------------------------------------------------------------------------

def q_late_orders_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = li.filter(F.col("l_shipdate") > F.lit("1999-01-01").cast("timestamp"))
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


Q_SEMI_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_shipdate > TIMESTAMP '1999-01-01'
)
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Anti join (NOT EXISTS): customers with no orders, per market segment
# ---------------------------------------------------------------------------

def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            sum_money("c_acctbal").alias("sum_acctbal"),
        )
    )


Q_ANTI_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# ROLLUP hierarchy totals (multi-level aggregation in one pass)
# ---------------------------------------------------------------------------

def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # empty-input parity: Spark's ROLLUP/CUBE emit 0 rows on empty input
    # (no grand-total row); the oracle carries HAVING COUNT(*) > 0 —
    # a no-op on non-empty input where every grouping-set row covers
    # >= 1 source row. Same convention in q_cube_orders /
    # q_events_time_rollup (round-7 empty-parity sweep finding).
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            sum_money("l_extendedprice").alias("sum_price"),
        )
    )


Q_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
HAVING COUNT(*) > 0
"""


# ---------------------------------------------------------------------------
# Scalar-subquery filter: customers above global mean balance, per nation
# ---------------------------------------------------------------------------

def q_above_avg_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    mean_bal = cust.agg(
        (sum_money("c_acctbal") / F.count(F.lit(1))).alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(mean_bal))
        .filter(money("c_acctbal").cast("double") > F.col("avg_bal"))
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_rich"))
    )


Q_ABOVE_AVG_SQL = """
SELECT c_nationkey, COUNT(*) AS n_rich
FROM customer
WHERE CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) >
      (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) FROM customer)
GROUP BY c_nationkey
"""


# ---------------------------------------------------------------------------
# Value remap (F9: dict/array lookup remap, notebooks cell-1/2) as CASE
# ---------------------------------------------------------------------------

def q_priority_remap(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cls = (
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), F.lit(0))
        .when(F.col("o_orderpriority") == "3-MEDIUM", F.lit(1))
        .otherwise(F.lit(2))
    )
    return (
        orders.select(cls.alias("priority_class"), "o_totalprice")
        .groupBy("priority_class")
        .agg(F.count(F.lit(1)).alias("n_orders"), sum_money("o_totalprice").alias("sum_price"))
    )


Q_REMAP_SQL = """
SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0
            WHEN o_orderpriority = '3-MEDIUM' THEN 1
            ELSE 2 END AS priority_class,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Deterministic systematic sample (testable stand-in for seeded Bernoulli,
# SURVEY.md §2.6 R1) — key-mod selection is reproducible in ANSI SQL
# ---------------------------------------------------------------------------

def q_mod_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.pmod(F.col("l_orderkey"), F.lit(97)) == 3)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            sum_money("l_quantity").alias("sum_qty"),
        )
    )


Q_MOD_SAMPLE_SQL = """
SELECT l_returnflag, COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
WHERE l_orderkey % 97 = 3
GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Ragged-array profile per order: build an order-preserving array per group
# (the relational analog of the codec's collect-reassemble, A4/F1) and fold
# it back to scalars with higher-order functions.
# ---------------------------------------------------------------------------

def q_order_qty_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    qty = cents("l_quantity")
    arr = F.sort_array(
        F.collect_list(F.struct(F.col("l_linenumber").alias("i"), qty.alias("q")))
    )
    return (
        li.groupBy("l_orderkey")
        .agg(arr.alias("_a"))
        .select(
            "l_orderkey",
            F.size("_a").alias("n_items"),
            (F.element_at("_a", 1)["q"] / F.lit(100.0)).alias("first_qty"),
            (F.element_at("_a", -1)["q"] / F.lit(100.0)).alias("last_qty"),
            (
                F.aggregate(
                    "_a", F.lit(0).cast("long"), lambda acc, s: acc + s["q"]
                )
                / F.lit(100.0)
            ).alias("total_qty"),
        )
    )


Q_ORDER_QTY_PROFILE_SQL = """
WITH arrs AS (
  SELECT l_orderkey,
         list(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)
              ORDER BY l_linenumber, CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS a
  FROM lineitem
  WHERE l_orderkey < 200
  GROUP BY l_orderkey
)
SELECT l_orderkey,
       len(a) AS n_items,
       a[1] / 100.0 AS first_qty,
       a[-1] / 100.0 AS last_qty,
       list_sum(a) / 100.0 AS total_qty
FROM arrs
"""


# ---------------------------------------------------------------------------
# CUBE: all grouping combinations in one pass
# ---------------------------------------------------------------------------

def q_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            sum_money("o_totalprice").alias("sum_price"),
        )
    )


Q_CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
HAVING COUNT(*) > 0
"""


# ---------------------------------------------------------------------------
# Correlated-aggregate filter (TPC-H Q17 shape): lineitems below 50% of
# their part's average quantity
# ---------------------------------------------------------------------------

def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part_avg = li.groupBy("l_partkey").agg(
        (sum_money("l_quantity") / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        li.join(part_avg, "l_partkey")
        .filter(F.col("l_quantity") < F.lit(0.5) * F.col("avg_qty"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            roundn(sum_money("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"),
        )
    )


Q_SMALL_QTY_SQL = """
WITH part_avg AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT COUNT(*) AS n_rows,
       FLOOR((CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0) * 10000 + 0.5) / 10000 AS avg_yearly
FROM lineitem JOIN part_avg USING (l_partkey)
WHERE l_quantity < 0.5 * avg_qty
"""


# ---------------------------------------------------------------------------
# Q6 — forecasting revenue (pure filter+agg: the pushdown showcase)
# ---------------------------------------------------------------------------

def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (F.sum((cents("l_extendedprice") * cents("l_discount")).cast("decimal(38,0)")) / F.lit(10000.0)).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


Q6_SQL = """
SELECT
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# Q10 shape — returned-items revenue per customer (join + filter + top-k)
# ---------------------------------------------------------------------------

def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    # two-phase aggregation: collapse lineitem to one exact-cents revenue row
    # per order BEFORE the join — the shuffled join input shrinks ~4x and the
    # integer arithmetic keeps the regrouped sum exactly equal (2x measured)
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))).alias("_rc")
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg((F.sum("_rc") / F.lit(10000.0)).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q14 shape — promo revenue share (LIKE predicate + conditional aggregation)
# ---------------------------------------------------------------------------

def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))
    promo_rev = F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0)))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (promo_rev / F.lit(10000.0)).alias("promo_revenue"),
            (F.sum(rev) / F.lit(10000.0)).alias("total_revenue"),
            roundn(
                F.lit(100.0) * promo_rev.cast("double") / F.sum(rev).cast("double")
            ).alias("promo_pct"),
        )
    )


Q14_SQL = """
WITH c AS (
  SELECT CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
         * (100 - CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT)) AS rev,
         p_type
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-07-01'
)
SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) AS DOUBLE) / 10000.0 AS promo_revenue,
       CAST(SUM(rev) AS DOUBLE) / 10000.0 AS total_revenue,
       FLOOR((100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) AS DOUBLE)
              / CAST(SUM(rev) AS DOUBLE)) * 10000 + 0.5) / 10000 AS promo_pct
FROM c
"""


# ---------------------------------------------------------------------------
# Q19 shape — disjunctive multi-clause predicate (OR of conjunction groups)
# ---------------------------------------------------------------------------

def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    clause1 = (
        (F.col("p_brand") == "Brand#11")
        & (F.col("l_quantity") >= 1)
        & (F.col("l_quantity") <= 20)
        & (F.col("p_size") <= 10)
    )
    clause2 = (
        (F.col("p_brand") == "Brand#22")
        & (F.col("l_quantity") >= 10)
        & (F.col("l_quantity") <= 30)
        & (F.col("p_size") <= 20)
    )
    clause3 = (F.col("p_type") == "LARGE") & (F.col("l_quantity") >= 25)
    return joined.filter(clause1 | clause2 | clause3).agg(
        sum_revenue("l_extendedprice", "l_discount").alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


Q19_SQL = """
SELECT
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#11' AND l_quantity BETWEEN 1 AND 20 AND p_size <= 10)
   OR (p_brand = 'Brand#22' AND l_quantity BETWEEN 10 AND 30 AND p_size <= 20)
   OR (p_type = 'LARGE' AND l_quantity >= 25)
"""


# ---------------------------------------------------------------------------
# Regex extraction (F-table "regex" row): parse the numeric id out of the
# document source tag and aggregate per bucket
# ---------------------------------------------------------------------------

def q_regex_source_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # try_cast: a source tag with no digits extracts '' — a null bucket,
    # not an ANSI cast error (both engines; degenerate-corpus sweep)
    src_num = F.regexp_extract("source", "([0-9]+)", 1).try_cast("long")
    return (
        docs.select((src_num % 10).alias("source_bucket"), "n_chars")
        .groupBy("source_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


Q_REGEX_SQL = """
SELECT TRY_CAST(regexp_extract(source, '([0-9]+)', 1) AS BIGINT) % 10 AS source_bucket,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# RANGE window frame: rolling 7-day order revenue per customer. Range frames
# aggregate over a VALUE interval, so equal-timestamp ties need no
# tie-break — deterministic by construction.
# ---------------------------------------------------------------------------

def q_rolling_7day_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 10)
    # day counts, not epochs: datediff is timezone-free (unix_timestamp would
    # shift with the caller's session tz, incl. DST-dependent offsets)
    days = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date")).alias("day_n")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day_n")
        .rangeBetween(-7, 0)
    )
    return (
        orders.select("o_custkey", "o_orderkey", days, cents("o_totalprice").alias("_c"))
        .select(
            "o_custkey",
            "o_orderkey",
            (F.sum("_c").over(w) / F.lit(100.0)).alias("rolling_7d_total"),
            F.count(F.lit(1)).over(w).alias("rolling_7d_orders"),
        )
    )


Q_ROLLING_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) OVER w AS DOUBLE) / 100.0 AS rolling_7d_total,
       COUNT(*) OVER w AS rolling_7d_orders
FROM orders
WHERE o_custkey < 10
WINDOW w AS (
  PARTITION BY o_custkey
  ORDER BY date_diff('day', DATE '1970-01-01', o_orderdate)
  RANGE BETWEEN 7 PRECEDING AND CURRENT ROW
)
"""


# ---------------------------------------------------------------------------
# LAG: days between consecutive orders per customer -> mean gap per segment
# ---------------------------------------------------------------------------

def q_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        orders.withColumn(
            "gap_days",
            F.datediff(
                F.col("o_orderdate"), F.lag("o_orderdate").over(w)
            ).cast("double"),
        )
        .filter(F.col("gap_days").isNotNull())
    )
    return (
        gaps.join(F.broadcast(cust), gaps.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            roundn(F.sum("gap_days") / F.count(F.lit(1))).alias("avg_gap_days"),
        )
    )


Q_ORDER_GAPS_SQL = """
WITH g AS (
  SELECT o_custkey,
         CAST(date_diff('day', LAG(o_orderdate) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), o_orderdate) AS DOUBLE) AS gap_days
  FROM orders
)
SELECT c_mktsegment, COUNT(*) AS n_gaps,
       FLOOR((SUM(gap_days) / COUNT(*)) * 10000 + 0.5) / 10000 AS avg_gap_days
FROM g JOIN customer ON o_custkey = c_custkey
WHERE gap_days IS NOT NULL
GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# Exact cross-engine stddev: from integer sums (sum, sum of squares) so the
# intermediate is an exact rational; only the final sqrt runs in double
# (IEEE sqrt is correctly rounded — identical in both engines).
# ---------------------------------------------------------------------------

def q_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # whole-dollar ints keep the per-term square small (~1e10), and the
    # SUM accumulates in decimal(38,0): a BIGINT sum of 1e10-per-term
    # squares wraps at ~1e9 rows per group — well inside the 100 TB
    # target — while DuckDB widens to HUGEINT (round-5 overflow sweep)
    v = F.expr("CAST(floor(l_extendedprice + 0.5) AS BIGINT)")
    n = F.count(F.lit(1)).cast("double")
    s = F.sum(v).cast("double")
    sq = F.sum((v * v).cast("decimal(38,0)")).cast("double")
    var = (n * sq - s * s) / (n * (n - F.lit(1.0)))
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        roundn(F.sum(cents("l_extendedprice")).cast("double") / n / F.lit(100.0)).alias("mean_price"),
        roundn(F.sqrt(var), 2).alias("stddev_price"),
    )


Q_PRICE_STATS_SQL = """
WITH c AS (
  SELECT l_returnflag,
         CAST(FLOOR(l_extendedprice + 0.5) AS BIGINT) AS v,
         CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS vc
  FROM lineitem
)
SELECT l_returnflag,
       COUNT(*) AS n_rows,
       FLOOR((CAST(SUM(vc) AS DOUBLE) / COUNT(*) / 100.0) * 10000 + 0.5) / 10000 AS mean_price,
       FLOOR(SQRT((COUNT(*) * CAST(SUM(v*v) AS DOUBLE) - CAST(SUM(v) AS DOUBLE) * CAST(SUM(v) AS DOUBLE))
                  / (COUNT(*) * (COUNT(*) - 1.0))) * 100 + 0.5) / 100 AS stddev_price
FROM c
GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Exact cross-engine Pearson correlation + OLS slope from integer-domain
# partial sums (n, Σx, Σy, Σxy, Σx², Σy²): one partial-aggregatable shuffle,
# no second pass, no per-row doubles until the final ratio. Built-in
# corr()/covar aggregate in double accumulators whose summation order
# differs across engines; integer sums are order-independent, and the
# closing double expression is evaluated identically on both sides (the
# q_price_stats technique, extended to two variables). Whole-dollar ints
# keep each y² term small; the squared-term SUMS accumulate in
# decimal(38,0) (BIGINT wraps at ~1e9 rows per group; DuckDB widens to
# HUGEINT).
# ---------------------------------------------------------------------------

def q_price_qty_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # floor(x+0.5) on BOTH engines: a bare double->BIGINT cast truncates
    # toward zero in Spark but rounds to nearest in DuckDB — harmless on
    # whole-number quantities, divergent the moment one is fractional
    x = F.expr("CAST(floor(l_quantity + 0.5) AS BIGINT)")
    y = F.expr("CAST(floor(l_extendedprice + 0.5) AS BIGINT)")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        # decimal(38,0): y² ~1e10 per term wraps a BIGINT sum at ~1e9
        # rows per group (round-5 overflow sweep); the linear sums fit
        F.sum((x * y).cast("decimal(38,0)")).alias("sxy"),
        F.sum((x * x).cast("decimal(38,0)")).alias("sxx"),
        F.sum((y * y).cast("decimal(38,0)")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    cov_n = n * sxy - sx * sy
    var_x, var_y = n * sxx - sx * sx, n * syy - sy * sy
    return agg.select(
        "l_returnflag",
        F.col("n").alias("n_rows"),
        # try_divide: a zero-variance group (all-equal x or y within a
        # returnflag) must yield NULL, not raise DIVIDE_BY_ZERO under ANSI
        # mode — DuckDB's `/` already returns NULL for 0.0 denominators, so
        # this keeps cross-engine parity (same convention as
        # q_events_outliers).
        roundn(F.try_divide(cov_n, F.sqrt(var_x * var_y)), 6).alias(
            "corr_qty_price"
        ),
        roundn(F.try_divide(cov_n, var_x), 4).alias("slope_price_per_qty"),
    )


Q_PRICE_QTY_CORR_SQL = """
WITH c AS (
  SELECT l_returnflag,
         CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS x,
         CAST(FLOOR(l_extendedprice + 0.5) AS BIGINT) AS y
  FROM lineitem
), s AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x*y) AS BIGINT) AS sxy,
         CAST(SUM(x*x) AS BIGINT) AS sxx, CAST(SUM(y*y) AS BIGINT) AS syy
  FROM c GROUP BY l_returnflag
)
SELECT l_returnflag,
       n AS n_rows,
       FLOOR(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              / SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))
             * 1000000 + 0.5) / 1000000 AS corr_qty_price,
       FLOOR(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
             * 10000 + 0.5) / 10000 AS slope_price_per_qty
FROM s
"""


# ---------------------------------------------------------------------------
# Set operations: customers active in both years (INTERSECT) and early-only
# customers (EXCEPT)
# ---------------------------------------------------------------------------

def q_set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")

    def active_in(year: int):
        return (
            orders.filter(F.year("o_orderdate") == year)
            .select("o_custkey")
            .distinct()
        )

    both = active_in(1996).intersect(active_in(1999)).withColumn(
        "cohort", F.lit("both_96_99")
    )
    only96 = active_in(1996).exceptAll(active_in(1999)).withColumn(
        "cohort", F.lit("only_96")
    )
    return (
        both.unionByName(only96)
        .groupBy("cohort")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


Q_SET_OPS_SQL = """
WITH y96 AS (
  SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996
), y99 AS (
  SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1999
), cohorts AS (
  SELECT o_custkey, 'both_96_99' AS cohort FROM (SELECT * FROM y96 INTERSECT SELECT * FROM y99)
  UNION ALL
  SELECT o_custkey, 'only_96' AS cohort FROM (SELECT * FROM y96 EXCEPT SELECT * FROM y99)
)
SELECT cohort, COUNT(*) AS n_customers FROM cohorts GROUP BY cohort
"""


# ---------------------------------------------------------------------------
# String functions (F10 + general string surface): substring / upper /
# trim / format_string with printf semantics shared by both engines
# ---------------------------------------------------------------------------

def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    first_word = F.upper(F.trim(F.substring_index("p_name", " ", 1)))
    tag = F.format_string("%s#%d", F.lower("p_brand"), (F.col("p_size") % 5))
    return (
        part.select(first_word.alias("first_word"), tag.alias("brand_tag"))
        .groupBy("first_word")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.countDistinct("brand_tag").alias("n_tags"),
            F.min("brand_tag").alias("min_tag"),
        )
    )


Q_STRING_FUNCS_SQL = """
WITH s AS (
  SELECT UPPER(TRIM(string_split(p_name, ' ')[1])) AS first_word,
         printf('%s#%d', LOWER(p_brand), p_size % 5) AS brand_tag
  FROM part
)
SELECT first_word, COUNT(*) AS n_parts,
       COUNT(DISTINCT brand_tag) AS n_tags,
       MIN(brand_tag) AS min_tag
FROM s
GROUP BY first_word
"""


# ---------------------------------------------------------------------------
# Sketch aggregates (HLL distinct + quantile sketch) as a BOUNDED-ERROR
# harness: the sketch estimates are approximate by design, so raw estimates
# cannot hash-match a cross-engine oracle.  Instead the query emits the
# exact aggregates (deterministic in both engines) plus `*_ok` booleans
# asserting each sketch landed within its DOCUMENTED error bound — the
# DuckDB oracle emits the same exact columns with literal TRUE, so the
# value hash matches if and only if every sketch honours its contract:
#   - approx_count_distinct(rsd=0.01): HLL++ relative standard deviation
#     0.01; we allow 5σ = 5% (the estimate is unbiased, 5σ misses are
#     astronomically unlikely).
#   - percentile_approx(accuracy=10000): KLL/GK rank error <= n/accuracy
#     = 1e-4·n; we allow 10× slack (rank window q ± 1e-3) because the
#     returned element is bracketed by interpolated exact percentiles,
#     not by rank directly.
# The exact countDistinct/percentile columns exist to VERIFY the sketch —
# this is the accuracy-harness form.  At 100 TB you run only the sketch
# half (one partial-aggregatable pass, no shuffle of distinct values);
# the harness form is what you run on a sampled slice to certify bounds.
# ---------------------------------------------------------------------------

SKETCH_HLL_RSD = 0.01
SKETCH_HLL_TOL = 5 * SKETCH_HLL_RSD       # 5σ
SKETCH_PCTL_ACCURACY = 10000
SKETCH_RANK_TOL = 10.0 / SKETCH_PCTL_ACCURACY  # 10× the guaranteed 1e-4


def q_sketch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    lo_m, hi_m = 0.5 - SKETCH_RANK_TOL, 0.5 + SKETCH_RANK_TOL
    lo_p, hi_p = 0.99 - SKETCH_RANK_TOL, 0.99 + SKETCH_RANK_TOL
    # The sketch pass and the exact passes are DELIBERATELY separate
    # aggregations joined on the (tiny) group key: fusing countDistinct
    # with the imperative sketch aggregates (HLL / percentile_approx)
    # triggers Spark's distinct-aggregate Expand rewrite, which knocks the
    # whole aggregate off hash-aggregation — measured 0.6-2 s apart but
    # ~50 s fused at sf0.1.  Scans of a columnar source are far cheaper
    # than one Expand-degraded pass, at any scale.
    sketch = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=SKETCH_HLL_RSD).alias("hll"),
        F.percentile_approx(
            "l_extendedprice", 0.5, SKETCH_PCTL_ACCURACY
        ).alias("med_a"),
        F.percentile_approx(
            "l_extendedprice", 0.99, SKETCH_PCTL_ACCURACY
        ).alias("p99_a"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    exact_cd = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )
    # round 11 (guide §5 / §1.2): the exact bracket percentiles now come
    # from the VALUE DISTRIBUTION (operators/quantiles, blocked running
    # total) instead of Spark's `percentile` aggregate, which buffered
    # every group value in ONE task's memory — ~20% of the table per
    # returnflag, the suite's last fact-grain single-task buffer. Same
    # lo + (hi - lo)*frac interpolation over the same doubles → identical
    # brackets, so the *_ok booleans are unchanged (verified full-frame at
    # sf0.1 + oracle parity at sf0.001/0.01); wall is a wash locally
    # (3.23 s vs 3.33 s best-of-3 post-warmup) and the plan now survives a
    # group holding billions of rows.
    from ubparquet_spark.operators.quantiles import exact_quantiles

    exact_q = exact_quantiles(
        li,
        ["l_returnflag"],
        "l_extendedprice",
        {"_b0": lo_m, "_b1": hi_m, "_b2": lo_p, "_b3": hi_p},
        high_cardinality_keys=False,
        # price cents are near-unique: the distribution groupBy rides the
        # blocked range exchange (round 12, guide §2.4 — one exchange)
        fuse_distribution=True,
    ).select("l_returnflag", "_b0", "_b1", "_b2", "_b3")
    agg = sketch.join(F.broadcast(exact_cd), "l_returnflag").join(
        F.broadcast(exact_q), "l_returnflag"
    )
    return agg.select(
        "l_returnflag",
        "n_rows",
        "exact_orders",
        (
            F.abs(F.col("hll") - F.col("exact_orders"))
            <= F.lit(SKETCH_HLL_TOL) * F.col("exact_orders")
        ).alias("distinct_ok"),
        (
            (F.col("med_a") >= F.col("_b0"))
            & (F.col("med_a") <= F.col("_b1"))
        ).alias("median_ok"),
        (
            (F.col("p99_a") >= F.col("_b2"))
            & (F.col("p99_a") <= F.col("_b3"))
        ).alias("p99_ok"),
    )


Q_SKETCH_STATS_SQL = """
SELECT l_returnflag,
       COUNT(*) AS n_rows,
       COUNT(DISTINCT l_orderkey) AS exact_orders,
       TRUE AS distinct_ok,
       TRUE AS median_ok,
       TRUE AS p99_ok
FROM lineitem
GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Q13 shape — customer order-count distribution: LEFT OUTER join preserving
# zero-order customers, then a histogram over the per-customer counts. Two
# chained aggregations with different grains; the second one is tiny (one
# row per distinct count), so at 100 TB all the work is the first shuffle.
# ---------------------------------------------------------------------------

def q13_order_count_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
"""


# ---------------------------------------------------------------------------
# Q18 shape — large-volume orders: HAVING-filtered aggregate used as an IN
# subquery. The aggregate is computed ONCE and reused both as the filter and
# as the output column (vs. the naive plan that aggregates lineitem twice).
# l_quantity is integer-valued, so a double sum is exact.
# ---------------------------------------------------------------------------

def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 200)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("sum_qty").cast("double").alias("sum_qty"),
        )
    )


Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
HAVING SUM(l_quantity) > 200
"""


# ---------------------------------------------------------------------------
# Q16 shape — part/supplier variety: COUNT(DISTINCT) per attribute group with
# a NOT IN exclusion (broadcast anti join). The schema has no partsupp table;
# lineitem's (l_partkey, l_suppkey) pairs are the association. The exclusion
# set (negative-balance suppliers) is tiny -> broadcast left_anti, no shuffle
# of the fact side for the exclusion.
# ---------------------------------------------------------------------------

def q16_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#1")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    # no pre-distinct: countDistinct's partial aggregation already dedups
    # (group attrs, suppkey) map-side, so an explicit distinct() would only
    # add an extra exchange (measured: no gain at sf0.1)
    rel = li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
    return (
        rel.join(part, rel.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


# ---------------------------------------------------------------------------
# Q15 shape — top supplier: aggregate revenue view + scalar-max subquery.
# The max is computed as a 1-row aggregate and broadcast back onto the view
# (equality on exact integer 1e-4 units, never on a divided double), instead
# of a global window that would collapse the view to one partition.
# ---------------------------------------------------------------------------

def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))).alias("_rc")
    )
    mx = rev.agg(F.max("_rc").alias("_max"))
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), rev._rc == mx._max)
        .join(F.broadcast(supplier), rev.l_suppkey == supplier.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.col("_rc") / F.lit(10000.0)).alias("total_revenue"),
        )
    )


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(rev AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = l_suppkey
WHERE rev = (SELECT MAX(rev) FROM revenue)
"""


# ---------------------------------------------------------------------------
# Q7 shape — bilateral nation volume: the fact table joined through BOTH
# dimension paths (supplier-side nation and customer-side nation) with a
# symmetric pair predicate, grouped by shipping year. Both nation filters
# push below the joins, so only rows from the two nations ever shuffle; the
# disjunctive pair condition reduces to supp_nation != cust_nation once each
# side is pre-filtered to the pair.
# ---------------------------------------------------------------------------

def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    pair = ("NATION_1", "NATION_2")
    nation = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*pair))
        .select("n_nationkey", "n_name")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(sum_revenue("l_extendedprice", "l_discount").alias("volume"))
    )


Q7_SQL = """
SELECT supp_nation, cust_nation, l_year, CAST(SUM(vol) AS DOUBLE) AS volume
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
         CAST(l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l_discount AS DECIMAL(18,2))) AS vol
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
) GROUP BY supp_nation, cust_nation, l_year
"""


# ---------------------------------------------------------------------------
# Exact percentiles (vs the sketch approximations in q_sketch_stats), via
# operators.quantiles: distribution groupBy + running-total window instead
# of Spark's `percentile` aggregate, which buffers every group value in one
# task's memory. Same quantile_cont interpolation; measured 1.58s vs 1.84s
# at sf0.1, identical results, and the sort is spillable. Interpolation
# rounding can differ from DuckDB in the last double bit -> floor-round to 4.
# ---------------------------------------------------------------------------

def q_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE fused explode pass (`exact_quantiles_multi`) — the round-3 A/B
    # that picked two per-column passes (1.9 s vs 2.4 s) flipped when the
    # round-6 blocked_cumsum rewire made each pass pay a checkpoint
    # build: re-measured with fresh plan objects at sf0.1, fused 2.19 s
    # vs two-pass 2.85 s best-of-3 — one checkpoint + one blocked pass
    # now beats two of each, where the old window plans had nothing to
    # amortize. (Both histories in BENCHNOTES; the explode row-doubling
    # cost is unchanged, the fixed per-pass cost is what moved.)
    from ubparquet_spark.operators.quantiles import exact_quantiles_multi

    li = load_table(spark, sf_dir, "lineitem")
    # fuse_distribution (round 12, guide §2.4): the exploded pass is
    # dominated by near-unique price cents, so the distribution groupBy
    # rides the blocked cumsum's range exchange — one fact-grain exchange
    # instead of hash(distribution) + range(distribution).
    both = exact_quantiles_multi(
        li,
        ["l_returnflag"],
        {
            "l_extendedprice": {"median_price": 0.5, "p90_price": 0.9},
            "l_discount": {"q1_discount": 0.25},
        },
        fuse_distribution=True,
    )
    return both.select(
        "l_returnflag",
        roundn(F.col("median_price")).alias("median_price"),
        roundn(F.col("p90_price")).alias("p90_price"),
        roundn(F.col("q1_discount")).alias("q1_discount"),
        "n_rows",
    )


Q_EXACT_QUANTILES_SQL = """
SELECT l_returnflag,
       FLOOR(quantile_cont(l_extendedprice, 0.5) * 10000 + 0.5) / 10000 AS median_price,
       FLOOR(quantile_cont(l_extendedprice, 0.9) * 10000 + 0.5) / 10000 AS p90_price,
       FLOOR(quantile_cont(l_discount, 0.25) * 10000 + 0.5) / 10000 AS q1_discount,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Explicit GROUPING SETS (disjoint dimension summaries in one pass — neither
# rollup nor cube): Spark expands sets over the same shuffled child, one scan.
# ---------------------------------------------------------------------------

def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_orders_gs")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
                 AS sum_total
        FROM _orders_gs
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
        """
    )


Q_GROUPING_SETS_SQL = """
SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
"""


# ---------------------------------------------------------------------------
# Ranking window functions: percent_rank + ntile quartiles per priority.
# The window orders by (o_totalprice, o_orderkey) — a TOTAL order, because
# ntile assigns by row position and any tie in o_totalprice alone would make
# the quartile engine-dependent.
# ---------------------------------------------------------------------------

def q_order_price_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT percent_rank()/ntile() over Window.partitionBy(o_orderpriority):
    # ~5 priorities would push 20 % of the table through one task's sort.
    # Two-pass distributed ranking (operators/ranks.py) bounds every window
    # partition by one range-partition slice; percent_rank and ntile are
    # then pure arithmetic on (rank, group size) — bit-identical output.
    from ubparquet_spark.operators.ranks import ntile_col, percent_rank_col, ranked

    # select exactly the sort keys (round 12): every column being a sort
    # key means ranked() skips its slice checkpoint — the two consumer
    # subtrees stay identical and AQE reuses the one range shuffle.
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice", "o_orderkey"
    )
    r = ranked(
        orders,
        ["o_orderpriority"],
        ["o_totalprice", "o_orderkey"],
        rank_col="_r",
        n_col="_n",
    )
    return r.select(
        "o_orderkey",
        "o_orderpriority",
        roundn(percent_rank_col("_r", "_n"), 6).alias("price_pct_rank"),
        ntile_col("_r", "_n", 4).cast("long").alias("price_quartile"),
    )


Q_ORDER_PRICE_RANKS_SQL = """
SELECT o_orderkey, o_orderpriority,
       FLOOR(percent_rank() OVER w * 1000000 + 0.5) / 1000000 AS price_pct_rank,
       CAST(ntile(4) OVER w AS BIGINT) AS price_quartile
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
"""


# ---------------------------------------------------------------------------
# Q2 shape — correlated per-group minimum: parts priced at the minimum of
# their type. The per-group min is a partial-aggregatable groupBy whose
# ~150-row artifact broadcasts back onto the fact scan — NOT
# `min().over(Window.partitionBy("p_type"))`: p_type is low-cardinality,
# so the window form funnels each type's entire slice of the table
# through ONE task (the same pathology operators/segmented.py exists to
# avoid for ordered windows; for an unordered ALL-rows aggregate the
# groupBy+broadcast-join rewrite removes the per-group task entirely).
# The decimal comparison is exact so no epsilon is needed.
# ---------------------------------------------------------------------------

def q2_min_cost_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    mins = part.groupBy("p_type").agg(
        F.min(money("p_retailprice")).alias("_min_price")
    )
    return (
        part.join(F.broadcast(mins), "p_type")
        .filter(money("p_retailprice") == F.col("_min_price"))
        .select("p_partkey", "p_name", "p_type", "p_retailprice")
    )


Q2_SQL = """
SELECT p_partkey, p_name, p_type, p_retailprice
FROM part p
WHERE CAST(p_retailprice AS DECIMAL(18,2)) = (
  SELECT MIN(CAST(p2.p_retailprice AS DECIMAL(18,2)))
  FROM part p2 WHERE p2.p_type = p.p_type
)
"""


# ---------------------------------------------------------------------------
# Q11 shape — groups exceeding a fraction of the GLOBAL total: per-part
# revenue kept only when above 0.05% of all revenue. The global total is a
# 1-row aggregate broadcast onto the per-group frame (never a re-scan per
# group); comparison is on exact integer 1e-4 units.
# ---------------------------------------------------------------------------

def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rc = cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))
    per_part = li.groupBy("l_partkey").agg(F.sum(rc).alias("_rc"))
    total = per_part.agg(F.sum("_rc").alias("_total"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("_rc") * 2000 > F.col("_total"))
        .select("l_partkey", (F.col("_rc") / F.lit(10000.0)).alias("part_revenue"))
    )


Q11_SQL = """
WITH per_part AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, CAST(rev AS DOUBLE) AS part_revenue
FROM per_part
WHERE rev * 2000 > (SELECT SUM(rev) FROM per_part)
"""


# ---------------------------------------------------------------------------
# Equi-width histogram (width_bucket semantics, 20 buckets over [0, 600000),
# 0/21 overflow buckets): single partial-aggregated scan — the bucket id is
# computed map-side, so the shuffle carries at most 22 keys. The bucket
# arithmetic is spelled identically in both engines (DuckDB 1.x has no
# width_bucket, and engine-private bucket formulas can disagree at
# boundaries anyway).
# ---------------------------------------------------------------------------

_HIST_BUCKET = "GREATEST(0, LEAST(21, CAST(floor(o_totalprice / 30000) AS BIGINT) + 1))"


def q_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.expr(_HIST_BUCKET).cast("long").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            sum_money("o_totalprice").alias("sum_price"),
        )
    )


Q_PRICE_HISTOGRAM_SQL = f"""
SELECT CAST({_HIST_BUCKET} AS BIGINT) AS bucket,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders
GROUP BY 1
"""


#: name -> (query fn, oracle sql) for the driver contract
# ---------------------------------------------------------------------------
# Q8 shape — national market share: an 8-table star join (two roles for
# nation) feeding a conditional-share aggregate per year. Every dimension
# side broadcasts; lineitem–orders is the only fact-fact shuffle. The
# share is a ratio of two exact integer sums (1e-4 units), so the double
# division is bit-identical cross-engine with no rounding step.
# ---------------------------------------------------------------------------

Q8_REGION = "ASIA"
Q8_NATION = "NATION_7"
Q8_TYPE = "PROMO"


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == Q8_REGION
    )
    # customer's nation must lie in the target region
    cust_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey")
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(cust_nations), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey")
    )
    # supplier's nation names the market-share contender
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == Q8_TYPE)
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    vol = cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))
    nation_vol = F.sum(
        F.when(F.col("supp_nation") == Q8_NATION, vol).otherwise(F.lit(0))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (nation_vol.cast("double") / F.sum(vol).cast("double")).alias(
                "mkt_share"
            ),
            (F.sum(vol) / F.lit(10000.0)).alias("total_volume"),
        )
    )


Q8_SQL = f"""
WITH v AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
         CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
           * (100 - CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT)) AS vol,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON n1.n_nationkey = c_nationkey
  JOIN region ON r_regionkey = n1.n_regionkey
  JOIN nation n2 ON n2.n_nationkey = s_nationkey
  WHERE r_name = '{Q8_REGION}' AND p_type = '{Q8_TYPE}'
    AND o_orderdate >= TIMESTAMP '1995-01-01'
    AND o_orderdate < TIMESTAMP '1997-01-01'
)
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = '{Q8_NATION}' THEN vol ELSE 0 END) AS DOUBLE)
         / CAST(SUM(vol) AS DOUBLE) AS mkt_share,
       CAST(SUM(vol) AS DOUBLE) / 10000.0 AS total_volume
FROM v
GROUP BY o_year
"""


# ---------------------------------------------------------------------------
# Q9 shape — product-type profit by nation and year. The reference TPC-H Q9
# subtracts ps_supplycost; this dataset has no partsupp table, so profit
# degrades to revenue — the SHAPE is what's kept: a substring-filtered part
# dimension pruning a 5-table join, grouped by (supplier nation, year).
# ---------------------------------------------------------------------------

Q9_NAME_FRAGMENT = "red"


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains(Q9_NAME_FRAGMENT)
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(sum_revenue("l_extendedprice", "l_discount").alias("profit"))
    )


Q9_SQL = f"""
SELECT nation, o_year, CAST(SUM(vol) AS DOUBLE) AS profit
FROM (
  SELECT n_name AS nation,
         CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
         CAST(l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l_discount AS DECIMAL(18,2))) AS vol
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  JOIN orders ON o_orderkey = l_orderkey
  WHERE p_name LIKE '%{Q9_NAME_FRAGMENT}%'
)
GROUP BY nation, o_year
"""


# ---------------------------------------------------------------------------
# Q12 shape — service-level conditional counts. TPC-H Q12 groups by
# l_shipmode (absent here); the adaptation classes each line by shipping
# DELAY (days from order date to ship date) and counts urgent/non-urgent
# orders per class — the same join + CASE-count aggregate. datediff is on
# midnight-aligned timestamps, so whole-day arithmetic is engine-exact.
# ---------------------------------------------------------------------------

Q12_LATE_DAYS = 60


def q12_service_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .withColumn(
            "ship_class",
            F.when(delay >= Q12_LATE_DAYS, F.lit("LATE")).otherwise(F.lit("ONTIME")),
        )
        .groupBy("ship_class")
        .agg(
            F.sum(F.when(urgent, F.lit(1)).otherwise(F.lit(0))).alias(
                "high_line_count"
            ),
            F.sum(F.when(~urgent, F.lit(1)).otherwise(F.lit(0))).alias(
                "low_line_count"
            ),
        )
    )


Q12_SQL = f"""
SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) >= {Q12_LATE_DAYS}
            THEN 'LATE' ELSE 'ONTIME' END AS ship_class,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)
            AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Q22 shape — dormant high-value customers: scalar-subquery threshold
# (average positive balance) + anti join (no RECENT orders — every
# customer in this synthetic data has SOME order, so "never ordered"
# would be vacuously empty) + per-group rollup. TPC-H groups by phone
# country code (no c_phone here) — nation key plays that role. The
# threshold compare is exact integer cross-multiplication
# (cents * n > sum_cents), so no division touches the filter.
# ---------------------------------------------------------------------------

Q22_DORMANT_SINCE = "2000-01-01"


def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    thresh = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(
            F.sum(cents("c_acctbal")).alias("_bal_sum"),
            F.count(F.lit(1)).alias("_bal_n"),
        )
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(Q22_DORMANT_SINCE).cast("timestamp"))
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(thresh))
        .filter(cents("c_acctbal") * F.col("_bal_n") > F.col("_bal_sum"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            sum_money("c_acctbal").alias("totacctbal"),
        )
    )


Q22_SQL = """
WITH t AS (
  SELECT CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS bal_sum,
         COUNT(*) AS bal_n
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c_nationkey, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer, t
WHERE CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) * bal_n > bal_sum
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_nationkey
"""


# ---------------------------------------------------------------------------
# Q4 shape — order priority checking: orders in one quarter with at least one
# "late" lineitem, counted by priority. The reduced schema has no
# l_commitdate/l_receiptdate, so "late" is adapted to a CROSS-TABLE correlated
# inequality (l_shipdate > o_orderdate + 60 days), which preserves the
# operator under test: a correlated-EXISTS semi join whose predicate
# references both sides. Spark expresses it as a left_semi join with a
# compound condition — the quarter filter pushes into the orders scan, the
# semi join shuffles on orderkey only, and no lineitem columns survive the
# join (semi joins emit the left side only), so at 100 TB the shuffle
# carries (orderkey, orderdate, priority) and nothing else.
# ---------------------------------------------------------------------------

Q4_QUARTER_START = "1997-07-01"
Q4_QUARTER_END = "1997-10-01"
LATE_DAYS = 60


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q4_QUARTER_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q4_QUARTER_END).cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate + F.expr(f"INTERVAL {LATE_DAYS} DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


Q4_SQL = f"""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '{Q4_QUARTER_START}'
  AND o_orderdate < TIMESTAMP '{Q4_QUARTER_END}'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL {LATE_DAYS} DAY
  )
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Q21 shape — suppliers who kept orders waiting: for finished orders with
# more than one distinct supplier, exactly ONE of which shipped late, charge
# the wait to that supplier. The classic form is a self-EXISTS plus a
# self-NOT-EXISTS on lineitem; re-expressed Spark-first as a SINGLE per-order
# aggregate over one orderkey shuffle:
#   n_supp   = countDistinct(suppkey)            (EXISTS other-supplier)
#   n_late   = countDistinct(suppkey | late)     (NOT EXISTS other late supp
#   late_supp= max(suppkey | late)                == exactly-one-late)
# then filter n_supp > 1 AND n_late = 1 and count per supplier. This replaces
# two correlated subqueries (two extra joins against the fact table) with one
# partial-aggregatable shuffle — at 100 TB, 3 scans of lineitem become 1.
# "Late" is the same adapted cross-table predicate as Q4 (no commitdate /
# receiptdate in the reduced schema). Supplier + nation are broadcast dims.
# ---------------------------------------------------------------------------

Q21_NATION = "NATION_3"


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {LATE_DAYS} DAYS"
    )
    per_order = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("n_late"),
            F.max(F.when(late, F.col("l_suppkey"))).alias("late_supp"),
        )
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == Q21_NATION
    )
    return (
        per_order.join(
            F.broadcast(
                supp.join(
                    F.broadcast(nation),
                    supp.s_nationkey == nation.n_nationkey,
                ).select("s_suppkey", "s_name")
            ),
            per_order.late_supp == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


Q21_SQL = f"""
WITH per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN l_shipdate > o_orderdate + INTERVAL {LATE_DAYS} DAY
                             THEN l_suppkey END) AS n_late,
         MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL {LATE_DAYS} DAY
                  THEN l_suppkey END) AS late_supp
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY l_orderkey
)
SELECT s_name, COUNT(*) AS numwait
FROM per_order
JOIN supplier ON late_supp = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE n_supp > 1 AND n_late = 1 AND n_name = '{Q21_NATION}'
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 100
"""


# ---------------------------------------------------------------------------
# Q20 shape — excess-quantity suppliers: the classic form is a chain of
# nested IN-subqueries (supplier IN (... partsupp WHERE availqty > 0.5 *
# correlated SUM over lineitem)). The reduced schema has no partsupp, so the
# adapted semantics: for parts of one name family shipped in one year, find
# suppliers whose shipped quantity of some part exceeds half that part's
# total shipped quantity — a dominant-supplier test that preserves every
# operator in the shape: filtered dim join, per-(part,supplier) aggregate, a
# correlated per-part total, and a final semi join into supplier.
#
# Spark-first rewrite: the classic plan scans lineitem TWICE (once for the
# per-ps sum, once inside the correlated scalar subquery). Here the per-part
# total is a REAGGREGATION of the per-(part,supplier) partial sums — one
# lineitem scan, one shuffle on (partkey, suppkey), then a tiny shuffle on
# partkey over already-reduced rows. At 100 TB that halves the fact-table
# I/O. Quantities are compared in exact integer centi-units
# (2*sup_qty > part_qty), so the filter is immune to double summation order.
# ---------------------------------------------------------------------------

Q20_NAME_PREFIX = "small"
Q20_YEAR_START = "1996-01-01"
Q20_YEAR_END = "1997-01-01"


def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith(Q20_NAME_PREFIX))
        .select("p_partkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit(Q20_YEAR_START).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(Q20_YEAR_END).cast("timestamp"))
        )
        .select("l_partkey", "l_suppkey", "l_quantity")
    )
    per_ps = (
        li.join(F.broadcast(parts), li.l_partkey == parts.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(cents("l_quantity")).alias("sup_qty"))
    )
    per_part = per_ps.groupBy("l_partkey").agg(
        F.sum("sup_qty").alias("part_qty")
    )
    dominant = (
        per_ps.join(per_part, "l_partkey")
        .filter(F.lit(2) * F.col("sup_qty") > F.col("part_qty"))
        .select("l_suppkey")
    )
    supp = load_table(spark, sf_dir, "supplier")
    return (
        supp.join(dominant, supp.s_suppkey == dominant.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", money("s_acctbal").cast("double").alias("s_acctbal"))
        .orderBy("s_suppkey")
    )


Q20_SQL = f"""
WITH per_ps AS (
  SELECT l_partkey, l_suppkey,
         SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS sup_qty
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE '{Q20_NAME_PREFIX}%'
    AND l_shipdate >= TIMESTAMP '{Q20_YEAR_START}'
    AND l_shipdate < TIMESTAMP '{Q20_YEAR_END}'
  GROUP BY 1, 2
), per_part AS (
  SELECT l_partkey, SUM(sup_qty) AS part_qty FROM per_ps GROUP BY 1
)
SELECT s_suppkey, s_name, CAST(CAST(s_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS s_acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM per_ps JOIN per_part USING (l_partkey)
  WHERE 2 * sup_qty > part_qty
)
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# Q17: small-quantity-order revenue — the correlated-aggregate shape
# (brand filter adapted to the synthetic part schema, which has no
# p_container; p_size <= 10 stands in for the container predicate).
#
# Spark-first decorrelation: the classic `l_quantity < (SELECT 0.2*avg(..)
# WHERE l2.l_partkey = p_partkey)` subquery becomes ONE groupBy over the
# already-part-filtered lineitems (semantically identical — the subquery is
# per partkey, and only filtered parts reach the comparison) joined back by
# partkey. Both joins broadcast: the filtered part list and the per-part
# threshold table are each a few hundred rows at any scale factor where the
# brand predicate is selective — the lineitem table is scanned ONCE and
# never shuffled on a corpus-sized key.
#
# Numerics: l_quantity is integral (asserted in the synthetic data), so
# avg = exact_integer_sum / count is one correctly-rounded double in both
# engines; revenue uses the exact cents() trick.
# ---------------------------------------------------------------------------

def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    parts = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#23") & (F.col("p_size") <= 10))
        .select("p_partkey")
    )
    branded = li.join(
        F.broadcast(parts), li.l_partkey == parts.p_partkey
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    thresholds = branded.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (
            F.lit(0.2)
            * (
                F.sum(F.col("l_quantity").cast("long")).cast("double")
                / F.count(F.lit(1))
            )
        ).alias("qty_limit")
    )
    small = branded.join(
        F.broadcast(thresholds),
        (F.col("l_partkey") == F.col("t_partkey"))
        & (F.col("l_quantity") < F.col("qty_limit")),
    )
    return small.agg(
        F.count(F.lit(1)).alias("n_small"),
        roundn(sum_money("l_extendedprice") / F.lit(7.0), 2).alias("avg_yearly"),
    )


Q17_SQL = """
WITH branded AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_brand = 'Brand#23' AND p_size <= 10
), t AS (
  SELECT l_partkey AS t_partkey,
         0.2 * (CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*)) AS qty_limit
  FROM branded GROUP BY 1
)
SELECT COUNT(*) AS n_small,
       FLOOR((CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0) * 100 + 0.5) / 100 AS avg_yearly
FROM branded JOIN t ON l_partkey = t_partkey AND l_quantity < qty_limit
"""


# ---------------------------------------------------------------------------
# Pareto / ABC analysis: cumulative revenue share of the top customers —
# "what fraction of revenue do the top K customers carry". Revenue ranks
# in exact integer cents; the top-K selection is orderBy+limit
# (TakeOrdered — per-partition partial top-k, no global sort shuffle), and
# the cumulative window then runs over the K winner rows only (the
# q_bpe_vocab pattern). The grand total is a broadcast 1-row aggregate;
# shares are single divisions of exact integers, rounded once.
# ---------------------------------------------------------------------------

PARETO_TOP = 100


def q_customer_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(cents("o_totalprice")).alias("rev_cents")
    )
    total = per_cust.agg(F.sum("rev_cents").alias("total_cents"))
    top = per_cust.orderBy(
        F.col("rev_cents").desc(), F.col("o_custkey").asc()
    ).limit(PARETO_TOP)
    w = (
        Window.orderBy(F.col("rev_cents").desc(), F.col("o_custkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(
            Window.orderBy(F.col("rev_cents").desc(), F.col("o_custkey").asc())
        ))
        .withColumn("cum_cents", F.sum("rev_cents").over(w))
        .select(
            "rank",
            "o_custkey",
            (F.col("rev_cents") / 100.0).alias("revenue"),
            roundn(
                F.col("cum_cents").cast("double") / F.col("total_cents"), 8
            ).alias("cum_share"),
        )
    )


Q_CUSTOMER_PARETO_SQL = f"""
WITH per_cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM orders GROUP BY o_custkey
), total AS (
  SELECT CAST(SUM(rev_cents) AS BIGINT) AS total_cents FROM per_cust
), top AS (
  SELECT o_custkey, rev_cents FROM per_cust
  ORDER BY rev_cents DESC, o_custkey LIMIT {PARETO_TOP}
)
SELECT ROW_NUMBER() OVER (ORDER BY rev_cents DESC, o_custkey) AS rank,
       o_custkey,
       rev_cents / 100.0 AS revenue,
       {sql_roundn(
           "CAST(SUM(rev_cents) OVER (ORDER BY rev_cents DESC, o_custkey "
           "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)"
           " / (SELECT total_cents FROM total)", 8)} AS cum_share
FROM top
"""




# ---------------------------------------------------------------------------
# Year-over-year revenue growth: yearly rollup + lag on the YEAR-grain
# aggregate. The window runs over ~7 rows (one per year), never the fact
# table — the 100 TB cost is the one partial-aggregatable year shuffle.
# Growth is computed on exact integer cents and only the ratio is rounded,
# so both engines round the same rational.
# ---------------------------------------------------------------------------

def q_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    yearly = (
        orders.groupBy(F.year("o_orderdate").alias("year"))
        .agg(F.sum(cents("o_totalprice")).alias("_rc"),
             F.count(F.lit(1)).alias("n_orders"))
    )
    w = Window.orderBy("year")
    prev = F.lag("_rc").over(w)
    return yearly.select(
        "year",
        (F.col("_rc") / 100.0).alias("revenue"),
        "n_orders",
        (prev / 100.0).alias("prev_revenue"),
        roundn((F.col("_rc") - prev) / prev * 100.0, 4).alias("yoy_pct"),
    )


Q_YOY_GROWTH_SQL = f"""
WITH yearly AS (
  SELECT EXTRACT(year FROM o_orderdate) AS year,
         SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS rc,
         COUNT(*) AS n_orders
  FROM orders GROUP BY 1
)
SELECT CAST(year AS INT) AS year,
       rc / 100.0 AS revenue,
       n_orders,
       LAG(rc) OVER (ORDER BY year) / 100.0 AS prev_revenue,
       {sql_roundn("CAST(rc - LAG(rc) OVER (ORDER BY year) AS DOUBLE)"
                   " / LAG(rc) OVER (ORDER BY year) * 100.0", 4)} AS yoy_pct
FROM yearly
"""


# ---------------------------------------------------------------------------
# Market-basket co-purchase pairs: brands co-occurring within an order.
# Shape at 100 TB: lineitem joins the broadcast part dim for the brand,
# the distinct (order, brand) set shuffles ONCE on orderkey, and the
# within-order pair fan-out is bounded by the brand cardinality (25), so
# the self-join is collect_set + explode of pairs per order — never a
# fact×fact shuffle join. Top pairs via TakeOrdered, not a global sort.
# ---------------------------------------------------------------------------


def _order_brand_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (order, brand) incidence — the shared corpus aggregation
    under both the co-purchase pair counts and the PageRank edge build."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )


COPURCHASE_TOP = 20


def q_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ob = _order_brand_pairs(spark, sf_dir)
    # per-order sorted brand set -> all a<b pairs, exploded JVM-side
    pairs = (
        ob.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("p_brand")).alias("bs"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(bs, (a, i) ->"
                    " transform(slice(bs, i + 2, size(bs)), b -> struct(a, b))))"
                )
            ).alias("pr")
        )
        .select(F.col("pr.a").alias("brand_a"), F.col("pr.b").alias("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return pairs.orderBy(
        F.col("n_orders").desc(), "brand_a", "brand_b"
    ).limit(COPURCHASE_TOP)


Q_COPURCHASE_SQL = f"""
WITH ob AS (
  SELECT DISTINCT l_orderkey, p_brand
  FROM lineitem JOIN part ON p_partkey = l_partkey
)
SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, COUNT(*) AS n_orders
FROM ob a JOIN ob b ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
GROUP BY 1, 2
ORDER BY n_orders DESC, brand_a, brand_b
LIMIT {COPURCHASE_TOP}
"""


# ---------------------------------------------------------------------------
# Winsorized price statistics: robust mean/stddev of o_totalprice after
# clipping to exact [p05, p95]. Percentiles come from the VALUE
# DISTRIBUTION (groupBy value -> counts -> running total over the distinct
# cents domain — the operators/quantiles technique), so the expensive pass
# shuffles only distinct values, and the clip+agg second pass is one
# partial-aggregatable scan with the two cut points as a broadcast row.
# Price cents are near-unique, so the running total uses
# operators/ranks.blocked_cumsum (range-partitioned two-pass prefix sum)
# — never a single-task SUM() OVER (ORDER BY v) global window.
# Lower-nearest-rank percentile definition mirrors exactly in SQL.
# ---------------------------------------------------------------------------

WINSOR_LO, WINSOR_HI = 0.05, 0.95


def q_winsorized_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ubparquet_spark.operators.ranks import blocked_cumsum

    orders = load_table(spark, sf_dir, "orders")
    pc = orders.select(cents("o_totalprice").alias("v"))
    dist = pc.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    cum = blocked_cumsum(
        dist, ["v"], {"cum": ("c", "inclusive")}, totals={"n": "c"}
    )
    # nearest-rank (ceil) percentile: smallest v with cum >= ceil(q * n)
    cuts = cum.select(
        F.min(F.when(F.col("cum") >= F.ceil(WINSOR_LO * F.col("n")), F.col("v"))).alias("lo"),
        F.min(F.when(F.col("cum") >= F.ceil(WINSOR_HI * F.col("n")), F.col("v"))).alias("hi"),
    )
    clipped = pc.crossJoin(F.broadcast(cuts)).select(
        F.greatest(F.col("lo"), F.least(F.col("hi"), F.col("v"))).alias("cv"),
        "lo", "hi",
    )
    # exact integer partials (Σcv as BIGINT cents, Σcv² as DECIMAL(38,0)) —
    # a double sum here would be partial-aggregation-order-dependent and
    # hash-diverge from the oracle on multi-partition scans
    n = F.count(F.lit(1))
    sc_ = F.sum("cv")
    scc = F.sum(F.col("cv").cast("decimal(38,0)") * F.col("cv"))
    mean_c = sc_.cast("double") / n
    var_c = F.greatest(
        scc.cast("double") / n - mean_c * mean_c, F.lit(0.0)
    )
    return clipped.groupBy("lo", "hi").agg(
        n.alias("n_orders"),
        roundn(mean_c / 100.0, 4).alias("winsor_mean"),
        roundn(F.sqrt(var_c) / 100.0, 4).alias("winsor_std"),
    ).select(
        (F.col("lo") / 100.0).alias("p05"),
        (F.col("hi") / 100.0).alias("p95"),
        "n_orders", "winsor_mean", "winsor_std",
    )


Q_WINSORIZED_SQL = f"""
WITH pc AS (
  SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS v FROM orders
), dist AS (
  SELECT v, COUNT(*) AS c FROM pc GROUP BY v
), cum AS (
  SELECT v, SUM(c) OVER (ORDER BY v) AS cum, SUM(c) OVER () AS n FROM dist
), cuts AS (
  SELECT MIN(CASE WHEN cum >= CEIL({WINSOR_LO} * n) THEN v END) AS lo,
         MIN(CASE WHEN cum >= CEIL({WINSOR_HI} * n) THEN v END) AS hi
  FROM cum
), clipped AS (
  SELECT GREATEST(lo, LEAST(hi, v)) AS cv, lo, hi FROM pc CROSS JOIN cuts
)
SELECT lo / 100.0 AS p05, hi / 100.0 AS p95,
       COUNT(*) AS n_orders,
       {sql_roundn("(CAST(SUM(cv) AS DOUBLE) / COUNT(*)) / 100.0", 4)} AS winsor_mean,
       {sql_roundn(
           "SQRT(GREATEST(CAST(SUM(CAST(cv AS HUGEINT) * cv) AS DOUBLE) / COUNT(*)"
           " - (CAST(SUM(cv) AS DOUBLE) / COUNT(*))"
           " * (CAST(SUM(cv) AS DOUBLE) / COUNT(*)), 0)) / 100.0", 4)}
         AS winsor_std
FROM clipped GROUP BY lo, hi
"""




# ---------------------------------------------------------------------------
# PageRank over the brand co-purchase graph — the iterative-algorithm
# showcase. The CORPUS work is one distinct (order, brand) aggregation;
# the graph itself (≤ C(brands, 2) edges) is a bounded artifact, so each
# power iteration is a broadcast join over the edge table, unrolled a
# fixed PAGERANK_ROUNDS times in-plan (no collect of ranks).
#
# Cross-engine determinism: ALL-INTEGER arithmetic. Edge weights
# normalize to ppm of the source's out-weight (floor), ranks live in
# 1e-12 units, the damping step is (S * 85) // 100 and the teleport term
# 150e9 // N — every operation is exact BIGINT in both engines, so three
# chained iterations stay bit-identical with no rounding policy at all.
# ---------------------------------------------------------------------------

PAGERANK_ROUNDS = 3
_PR_ONE = 10**12        # rank unit
_PR_PPM = 10**6         # edge-weight normalization grain

# Below this many edge rows the brand-graph queries (PageRank power
# iterations, triangle count) finish on the driver over the collected edge
# list instead of the in-plan join chains (round 11, guide §1.2/§5, same
# size dispatch as functions/dedup_clusters): the in-plan forms cost 2+
# sequential broadcast-build jobs per iteration/aggregate branch on a
# ≤C(brands,2)-row artifact — pure driver-synchronization overhead. The
# edge table is brand-pair grain (a bounded model artifact, like
# centroids/codebooks), the collect is additionally limit-bounded by
# construction, and the arithmetic is ALL-INTEGER (floor divisions of
# non-negative ints), so the driver result is bit-identical to the in-plan
# chain. Above the cap the lazy plans run unchanged — the
# arbitrarily-large-graph path is untouched.
_GRAPH_LOCAL_EDGE_CAP = int(
    os.environ.get("UBSPARK_GRAPH_LOCAL_EDGE_CAP", 500_000)
)


def _local_pagerank(spark: SparkSession, edge_rows: list) -> DataFrame:
    """Driver power iterations over a bounded, already-collected weighted
    edge list — value-identical to the unrolled in-plan rounds (same
    integer floor-division arithmetic on non-negative operands)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("brand", T.StringType()),
            T.StructField("n_neighbors", T.LongType(), False),
            T.StructField("pagerank", T.DoubleType()),
        ]
    )
    if not edge_rows:
        return spark.createDataFrame([], schema)
    ow: dict = {}
    deg: dict = {}
    for src, dst, w in edge_rows:
        ow[src] = ow.get(src, 0) + w
        deg[src] = deg.get(src, 0) + 1
    wn = [(src, dst, (w * _PR_PPM) // ow[src]) for src, dst, w in edge_rows]
    nodes = list(ow)
    n = len(nodes)
    r = {b: _PR_ONE // n for b in nodes}
    for _ in range(PAGERANK_ROUNDS):
        s: dict = {}
        for src, dst, wnv in wn:
            s[dst] = s.get(dst, 0) + (r[src] * wnv) // _PR_PPM
        r = {b: 150000000000 // n + (s.get(b, 0) * 85) // 100 for b in nodes}
    rows = [(b, deg[b], r[b] / float(_PR_ONE)) for b in nodes]
    return spark.createDataFrame(rows, schema)


def q_brand_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    ob = _order_brand_pairs(spark, sf_dir)
    a, b = ob.alias("a"), ob.alias("b")
    # symmetric weighted edges; bounded artifact (brand-pair grain), so the
    # checkpoint caps the corpus aggregation to ONE execution for all rounds
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_brand") != F.col("b.p_brand")),
        )
        .groupBy(
            F.col("a.p_brand").alias("src"), F.col("b.p_brand").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .localCheckpoint(eager=False)
    )
    # size dispatch in ONE bounded job (limit(cap+1) can never pull more
    # than cap+1 rows; <= cap returned rows IS the full edge list)
    if _GRAPH_LOCAL_EDGE_CAP >= 0:
        head = edges.limit(_GRAPH_LOCAL_EDGE_CAP + 1).collect()
        if len(head) <= _GRAPH_LOCAL_EDGE_CAP:
            return _local_pagerank(spark, [(e["src"], e["dst"], e["w"]) for e in head])
    outw = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    wn = edges.join(F.broadcast(outw), "src").select(
        "src", "dst",
        F.expr(f"CAST((w * {_PR_PPM}) DIV ow AS BIGINT)").alias("wn"),
    )
    nodes = edges.select(F.col("src").alias("brand")).distinct()
    n_tab = nodes.agg(F.count(F.lit(1)).alias("n"))
    ranks = nodes.crossJoin(F.broadcast(n_tab)).select(
        "brand", "n", F.expr(f"CAST({_PR_ONE} DIV n AS BIGINT)").alias("r")
    )
    for _ in range(PAGERANK_ROUNDS):
        contrib = (
            wn.join(
                F.broadcast(ranks.select(F.col("brand").alias("src"), "r")),
                "src",
            )
            .groupBy("dst")
            .agg(F.sum(F.expr(f"CAST((r * wn) DIV {_PR_PPM} AS BIGINT)")).alias("s"))
        )
        ranks = (
            ranks.join(
                F.broadcast(contrib.select(F.col("dst").alias("brand"), "s")),
                "brand",
                "left",
            )
            .select(
                "brand", "n",
                F.expr(
                    f"CAST(150000000000 DIV n + (coalesce(s, 0) * 85) DIV 100"
                    " AS BIGINT)"
                ).alias("r"),
            )
        )
    deg = edges.groupBy(F.col("src").alias("brand")).agg(
        F.count(F.lit(1)).alias("n_neighbors")
    )
    return ranks.join(deg, "brand").select(
        "brand",
        "n_neighbors",
        (F.col("r") / float(_PR_ONE)).alias("pagerank"),
    )


def _pagerank_sql() -> str:
    parts = [f"""ob AS (
  SELECT DISTINCT l_orderkey, p_brand
  FROM lineitem JOIN part ON p_partkey = l_partkey
), edges AS (
  SELECT a.p_brand AS src, b.p_brand AS dst, COUNT(*) AS w
  FROM ob a JOIN ob b
    ON a.l_orderkey = b.l_orderkey AND a.p_brand != b.p_brand
  GROUP BY 1, 2
), outw AS (
  SELECT src, SUM(w) AS ow FROM edges GROUP BY src
), wn AS (
  SELECT src, dst, (w * {_PR_PPM}) // ow AS wn
  FROM edges JOIN outw USING (src)
), nodes AS (
  SELECT DISTINCT src AS brand FROM edges
), n_tab AS (
  SELECT COUNT(*) AS n FROM nodes
), r0 AS (
  SELECT brand, n, {_PR_ONE} // n AS r FROM nodes CROSS JOIN n_tab
)"""]
    for k in range(1, PAGERANK_ROUNDS + 1):
        prev = f"r{k - 1}"
        parts.append(f"""s{k} AS (
  SELECT wn.dst, SUM((p.r * wn.wn) // {_PR_PPM}) AS s
  FROM wn JOIN {prev} p ON p.brand = wn.src
  GROUP BY wn.dst
), r{k} AS (
  SELECT p.brand, p.n,
         150000000000 // p.n + (COALESCE(s{k}.s, 0) * 85) // 100 AS r
  FROM {prev} p LEFT JOIN s{k} ON s{k}.dst = p.brand
)""")
    return (
        "WITH " + ",\n".join(parts) + f"""
SELECT r.brand,
       (SELECT COUNT(*) FROM edges e WHERE e.src = r.brand) AS n_neighbors,
       CAST(r AS DOUBLE) / {float(_PR_ONE)} AS pagerank
FROM r{PAGERANK_ROUNDS} r
"""
    )


Q_BRAND_PAGERANK_SQL = _pagerank_sql()


# ---------------------------------------------------------------------------
# Robust outlier detection via median/MAD (the modified z-score of Iglewicz &
# Hoaglin 1993): a value is an outlier when |x - median| > 3 * 1.4826 * MAD.
# Mean/stddev outlier gates (q_events_outliers) are themselves dragged by the
# outliers they hunt; the median/MAD gate is what a data-quality pipeline
# actually ships. Both medians run through operators.quantiles
# (distribution groupBy + running-total window — memory O(distinct values),
# never Spark's all-values-in-one-task `percentile` aggregate), so the plan
# survives a group holding billions of rows. Three linear scans of events
# (raw median, |dev| median, outlier count) — each prunes to 2 columns; the
# per-group quantile artifacts are broadcast back (one row per event type).
# ---------------------------------------------------------------------------

#: 3 sigma-equivalents: 3 * 1.4826 (MAD-to-sigma consistency constant)
ROBUST_K = 4.4478


def q_robust_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ubparquet_spark.operators.quantiles import exact_quantiles

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "value")
    )
    # event_type is a known handful of values << n_tasks: pin the blocked
    # strategy (what round-8 auto-dispatch would pick) instead of paying
    # its approx_count_distinct probe job twice per run.
    # round 11 #23 (guide §2.4 / §5): med and mad are K-row (one per
    # event_type) artifacts each consumed by TWO broadcast builds — med by
    # the MAD machinery's distribution pass and by the final aggregation's
    # dev rebuild, mad by the final pass. Without the lazy checkpoints each
    # consumer re-executed the artifact's whole quantile chain (the #22
    # A/B rejected checkpointing the FACT-grain dev frame; the K-row
    # artifacts are the right grain — negligible storage, measured action
    # 1.35–2.57 s → 0.38–0.58 s ABAB at sf0.1). At 100 TB each removed
    # re-execution is a full value-distribution pass over events.
    # fuse_distribution on both quantile passes (round 12, guide §2.4):
    # event values / absolute deviations are near-unique doubles, so each
    # distribution groupBy rides its blocked range exchange — one exchange
    # per pass instead of two.
    med = (
        exact_quantiles(
            ev, ["event_type"], "value", {"med": 0.5},
            high_cardinality_keys=False, fuse_distribution=True,
        )
        .select("event_type", "med")
        .localCheckpoint(eager=False)
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = (
        exact_quantiles(
            dev, ["event_type"], "adev", {"mad": 0.5},
            high_cardinality_keys=False, fuse_distribution=True,
        )
        .select("event_type", "mad")
        .localCheckpoint(eager=False)
    )
    is_out = (F.col("adev") > F.lit(ROBUST_K) * F.col("mad")).cast("int")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            roundn(F.max("med"), 6).alias("median_value"),
            roundn(F.max("mad"), 6).alias("mad"),
            F.sum(is_out).alias("n_outliers"),
            roundn(
                F.sum(is_out).cast("double") / F.count(F.lit(1)) * 100, 6
            ).alias("pct_outliers"),
        )
    )


Q_ROBUST_OUTLIERS_SQL = f"""
WITH ev AS (
  SELECT event_type, value FROM events WHERE value IS NOT NULL
), med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM ev GROUP BY event_type
), dev AS (
  SELECT e.event_type, m.med,
         ABS(e.value - m.med) AS adev
  FROM ev e JOIN med m USING (event_type)
), mad AS (
  SELECT event_type, quantile_cont(adev, 0.5) AS mad
  FROM dev GROUP BY event_type
)
SELECT d.event_type,
       COUNT(*) AS n_events,
       {sql_roundn("MAX(d.med)", 6)} AS median_value,
       {sql_roundn("MAX(a.mad)", 6)} AS mad,
       CAST(SUM(CASE WHEN d.adev > CAST('{ROBUST_K}' AS DOUBLE) * a.mad
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       {sql_roundn(
           "CAST(SUM(CASE WHEN d.adev > CAST('" + str(ROBUST_K) + "' AS DOUBLE)"
           " * a.mad THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) * 100", 6)}
         AS pct_outliers
FROM dev d JOIN mad a USING (event_type)
GROUP BY d.event_type
"""


# ---------------------------------------------------------------------------
# CDC snapshot diff via operators.diff: row-fingerprint both snapshots
# scan-side, one full-outer key join, emit only added/removed/changed keys.
# The "new" snapshot is derived deterministically in-plan (keys % 97 purged,
# keys % 13 status-flipped, keys % 101 re-inserted negated) so the diff
# exercises every change class with no side files. Doubles are quantized to
# cents BIGINT before fingerprinting — raw doubles stringify differently
# across engines (operator contract).
# ---------------------------------------------------------------------------

_DIFF_COMPARE = ["o_custkey", "o_orderstatus", "o_orderpriority", "cents"]


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ubparquet_spark.operators.diff import snapshot_diff

    key = F.col("o_orderkey")
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    survivors = base.filter(key % 97 != 0).withColumn(
        "o_orderstatus",
        F.when(key % 13 == 0, F.lit("X")).otherwise(F.col("o_orderstatus")),
    )
    added = base.filter(key % 101 == 0).withColumn("o_orderkey", -key)
    new = survivors.unionByName(added)
    return snapshot_diff(base, new, ["o_orderkey"], _DIFF_COMPARE)


def _diff_fp_sql(cols: list[str]) -> str:
    parts = ", ".join(
        f"COALESCE(CAST({c} AS VARCHAR), chr(0))" for c in cols
    )
    return f"md5(concat_ws(chr(31), {parts}))"


Q_SNAPSHOT_DIFF_SQL = f"""
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
), newsnap AS (
  SELECT o_orderkey, o_custkey,
         CASE WHEN o_orderkey % 13 = 0 THEN 'X' ELSE o_orderstatus END
           AS o_orderstatus,
         o_orderpriority, cents
  FROM base WHERE o_orderkey % 97 <> 0
  UNION ALL
  SELECT -o_orderkey, o_custkey, o_orderstatus, o_orderpriority, cents
  FROM base WHERE o_orderkey % 101 = 0
), o AS (
  SELECT o_orderkey, {_diff_fp_sql(_DIFF_COMPARE)} AS old_fp FROM base
), n AS (
  SELECT o_orderkey, {_diff_fp_sql(_DIFF_COMPARE)} AS new_fp FROM newsnap
)
SELECT o_orderkey,
       CASE WHEN old_fp IS NULL THEN 'added'
            WHEN new_fp IS NULL THEN 'removed'
            ELSE 'changed' END AS change,
       old_fp, new_fp
FROM o FULL OUTER JOIN n USING (o_orderkey)
WHERE old_fp IS NULL OR new_fp IS NULL OR old_fp <> new_fp
"""


# ---------------------------------------------------------------------------
# Global price deciles: NTILE(10) over the WHOLE table — the shape that
# tempts a no-partition window (single task sorts every row). Instead the
# exact global rank comes from operators/ranks.ranked with an EMPTY group:
# range-partition + in-partition sort + broadcast task offsets, so no task
# ever holds more than one range slice; ntile_col is then pure arithmetic,
# bit-identical to the window function (mirrored by DuckDB's NTILE).
# Order is total — (cents, o_orderkey) — so bucket assignment is
# deterministic across engines. Cents sums accumulate in decimal(38,0)
# per the repo-wide BIGINT-vs-HUGEINT rule.
# ---------------------------------------------------------------------------

def q_price_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ubparquet_spark.operators.ranks import ntile_col, ranked

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", cents("o_totalprice").alias("pc")
    )
    r = ranked(orders, [], ["pc", "o_orderkey"], rank_col="_r", n_col="_n")
    return (
        r.withColumn("decile", ntile_col("_r", "_n", 10).cast("long"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (
                F.sum(F.col("pc").cast("decimal(38,0)")).cast("double")
                / 100.0
            ).alias("sum_price"),
            (F.min("pc") / 100.0).alias("min_price"),
            (F.max("pc") / 100.0).alias("max_price"),
        )
    )


Q_PRICE_DECILES_SQL = """
WITH r AS (
  SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS pc,
         NTILE(10) OVER (ORDER BY CAST(FLOOR(o_totalprice * 100 + 0.5)
                                       AS BIGINT), o_orderkey) AS decile
  FROM orders
)
SELECT decile, COUNT(*) AS n_orders,
       CAST(SUM(pc) AS DOUBLE) / 100.0 AS sum_price,
       MIN(pc) / 100.0 AS min_price,
       MAX(pc) / 100.0 AS max_price
FROM r GROUP BY decile
"""


# ---------------------------------------------------------------------------
# Blocked edit-distance similarity join (entity resolution): distinct part
# names, blocked on the head noun (last token), candidate pairs within a
# block pruned by the |len(a)-len(b)| <= K length band (a NECESSARY
# condition for levenshtein <= K, checked before the distance), verified
# pairs counted per block. Standard ER shape: work is Σ block², bounded by
# the block-key fan-out, never corpus² — for heavy blocks the next lever is
# q-gram prefix blocking (the lossless prefix-filter machinery demonstrated
# in q_setsim_prefix_join). shuffle_hash keeps both sides exchanging on the
# block key: the distinct-name side is NOT broadcast-safe at corpus scale.
# Blocks with zero qualifying pairs still appear (left join + coalesce 0,
# the q_neighbor_degree convention).
#
# Distance grain is BYTES, pinned round 10 (twelfth sweep): DuckDB's
# levenshtein counts UTF-8 bytes while Spark's counts code points, so the
# two silently diverge on ANY multibyte input. The engine contract is
# byte-grain edit distance — Spark runs levenshtein over a byte-isomorphic
# ISO-8859-1 reinterpretation of the UTF-8 bytes (decode(encode(s,
# 'UTF-8'), 'ISO-8859-1'): one code point per original byte), and both
# length bands use byte length (octet_length / strlen), which keeps the
# band a necessary condition in the SAME units as the distance.  Identical
# to the old behaviour on ASCII corpora.
# ---------------------------------------------------------------------------

_EDITDIST_K = 2


def q_editdist_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    names = part.select("p_name").distinct().select(
        "p_name",
        F.element_at(F.split("p_name", " "), -1).alias("noun"),
        F.octet_length("p_name").alias("len"),
        # byte-isomorphic view: one ISO-8859-1 code point per UTF-8 byte,
        # so Spark's code-point levenshtein computes the BYTE distance
        # DuckDB's levenshtein natively returns
        F.expr("decode(encode(p_name, 'UTF-8'), 'ISO-8859-1')").alias(
            "bname"
        ),
    )
    a, b = names.alias("a"), names.alias("b")
    pairs = (
        a.join(
            b.hint("shuffle_hash"),
            (F.col("a.noun") == F.col("b.noun"))
            & (F.col("a.p_name") < F.col("b.p_name"))
            & (F.abs(F.col("a.len") - F.col("b.len")) <= _EDITDIST_K)
            & (
                F.levenshtein(F.col("a.bname"), F.col("b.bname"))
                <= _EDITDIST_K
            ),
        )
        .groupBy(F.col("a.noun").alias("noun"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.min(
                F.concat_ws(" | ", F.col("a.p_name"), F.col("b.p_name"))
            ).alias("example_pair"),
        )
    )
    blocks = names.groupBy("noun").agg(F.count(F.lit(1)).alias("n_names"))
    return blocks.join(pairs, "noun", "left").select(
        "noun",
        "n_names",
        F.coalesce("n_pairs", F.lit(0).cast("long")).alias("n_pairs"),
        "example_pair",
    )


Q_EDITDIST_PAIRS_SQL = f"""
WITH parsed AS (
  SELECT p_name, string_split(p_name, ' ')[-1] AS noun,
         strlen(p_name) AS len
  FROM (SELECT DISTINCT p_name FROM part)
), blocks AS (
  SELECT noun, COUNT(*) AS n_names FROM parsed GROUP BY noun
), pairs AS (
  SELECT a.noun, COUNT(*) AS n_pairs,
         MIN(concat_ws(' | ', a.p_name, b.p_name)) AS example_pair
  FROM parsed a JOIN parsed b
    ON a.noun = b.noun AND a.p_name < b.p_name
   AND ABS(a.len - b.len) <= {_EDITDIST_K}
   AND levenshtein(a.p_name, b.p_name) <= {_EDITDIST_K}
  GROUP BY a.noun
)
SELECT c.noun, c.n_names, COALESCE(p.n_pairs, 0) AS n_pairs, p.example_pair
FROM blocks c LEFT JOIN pairs p USING (noun)
"""


# ---------------------------------------------------------------------------
# Association rules over the co-purchase incidence: support / confidence /
# lift for the top co-purchased brand pairs. One (order → sorted brand set)
# aggregation feeds BOTH the pair counts and the per-brand counts (the set
# explodes back to singles — no second corpus pass); the basket total is a
# 1-row aggregate. The pair table collapses to TakeOrdered top-N before any
# join, so the metric joins touch ≤N rows + the bounded brand-count table
# (broadcast: bounded by the brand DOMAIN, not the corpus). Ratios are
# computed in double from exact integer counts — numerators/denominators
# cast to double BEFORE multiplying so no BIGINT product can wrap.
# ---------------------------------------------------------------------------


def q_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    ob = _order_brand_pairs(spark, sf_dir)
    # order-grain brand sets, materialized once for the three derived
    # aggregates (pairs / singles / total) — without this each branch
    # re-runs the lineitem⋈part join + distinct (column pruning
    # specializes the subtrees, defeating exchange reuse)
    sets = (
        ob.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("p_brand")).alias("bs"))
        .localCheckpoint(eager=False)
    )
    n_orders = sets.agg(F.count(F.lit(1)).alias("n_orders"))
    singles = sets.select(F.explode("bs").alias("brand")).groupBy("brand").agg(
        F.count(F.lit(1)).alias("n_single")
    )
    pairs = (
        sets.select(
            F.explode(
                F.expr(
                    "flatten(transform(bs, (a, i) ->"
                    " transform(slice(bs, i + 2, size(bs)), b -> struct(a, b))))"
                )
            ).alias("pr")
        )
        .select(F.col("pr.a").alias("brand_a"), F.col("pr.b").alias("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .orderBy(F.col("n_ab").desc(), "brand_a", "brand_b")
        .limit(COPURCHASE_TOP)
    )
    sa = singles.select(
        F.col("brand").alias("brand_a"), F.col("n_single").alias("n_a")
    )
    sb = singles.select(
        F.col("brand").alias("brand_b"), F.col("n_single").alias("n_b")
    )
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    return (
        pairs.join(F.broadcast(sa), "brand_a")
        .join(F.broadcast(sb), "brand_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "brand_a",
            "brand_b",
            "n_ab",
            roundn(dbl("n_ab") / dbl("n_orders"), 6).alias("support"),
            roundn(dbl("n_ab") / dbl("n_a"), 6).alias("conf_a_to_b"),
            roundn(dbl("n_ab") / dbl("n_b"), 6).alias("conf_b_to_a"),
            roundn(
                dbl("n_ab") * dbl("n_orders") / (dbl("n_a") * dbl("n_b")), 6
            ).alias("lift"),
        )
    )


Q_ASSOC_RULES_SQL = f"""
WITH ob AS (
  SELECT DISTINCT l_orderkey, p_brand
  FROM lineitem JOIN part ON p_partkey = l_partkey
), n AS (
  SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM ob
), singles AS (
  SELECT p_brand AS brand, COUNT(*) AS n_single FROM ob GROUP BY 1
), pairs AS (
  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, COUNT(*) AS n_ab
  FROM ob a JOIN ob b ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
  GROUP BY 1, 2
  ORDER BY n_ab DESC, brand_a, brand_b
  LIMIT {COPURCHASE_TOP}
)
SELECT brand_a, brand_b, n_ab,
       {sql_roundn("CAST(n_ab AS DOUBLE) / CAST(n_orders AS DOUBLE)", 6)}
         AS support,
       {sql_roundn("CAST(n_ab AS DOUBLE) / CAST(sa.n_single AS DOUBLE)", 6)}
         AS conf_a_to_b,
       {sql_roundn("CAST(n_ab AS DOUBLE) / CAST(sb.n_single AS DOUBLE)", 6)}
         AS conf_b_to_a,
       {sql_roundn(
           "CAST(n_ab AS DOUBLE) * CAST(n_orders AS DOUBLE)"
           " / (CAST(sa.n_single AS DOUBLE) * CAST(sb.n_single AS DOUBLE))", 6)}
         AS lift
FROM pairs
JOIN singles sa ON sa.brand = brand_a
JOIN singles sb ON sb.brand = brand_b
CROSS JOIN n
"""


# ---------------------------------------------------------------------------
# Join-consistent sampling: both fact tables gate on the SAME md5 hash of
# the JOIN KEY, so the sampled join ≡ the join of the samples ≡ an exact
# key-cluster sample of the joined result — the only way a debugging
# sample preserves join structure (independent Bernoulli samples of two
# tables keep ~f² of joined rows and break FK completeness). The gate is
# a scan-side map (rows drop BEFORE the join shuffle: only ~f of each
# table is exchanged); md5, not key%m, so selection is uncorrelated with
# any key-assignment pattern (mod sampling is biased when keys encode
# time/tenant). Reference R1/R4 sampling contract: deterministic, seeded
# by the literal below.
# ---------------------------------------------------------------------------

CONSISTENT_SAMPLE_PCT = 5  # keep keys with md5(key) % 100 < 5


def _key_gate(col: str) -> Column:
    return (
        F.expr(
            f"CAST(conv(substring(md5(CAST({col} AS STRING)), 1, 15),"
            " 16, 10) AS BIGINT)"
        )
        % 100
        < CONSISTENT_SAMPLE_PCT
    )


def q_consistent_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        _key_gate("o_orderkey")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(_key_gate("l_orderkey"))
    j = orders.join(li, orders.o_orderkey == li.l_orderkey)
    return j.groupBy("o_orderpriority").agg(
        F.countDistinct("o_orderkey").alias("n_orders"),
        F.count(F.lit(1)).alias("n_lines"),
        sum_money("l_extendedprice").alias("revenue"),
    )


_KEY_GATE_DUCK = (
    "CAST('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 15) AS BIGINT)"
    f" % 100 < {CONSISTENT_SAMPLE_PCT}"
)

Q_CONSISTENT_SAMPLE_SQL = f"""
SELECT o_orderpriority,
       COUNT(DISTINCT o_orderkey) AS n_orders,
       COUNT(*) AS n_lines,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE {_KEY_GATE_DUCK.format(col="o_orderkey")}
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Table profile (Deequ shape): one row per lineitem column with null /
# exact-distinct / typed min-max — operators/profile.profile_table. Two
# scans: a single fused aggregation for nulls+min+max (NO stacked
# countDistinct — that triggers the distinct-rewrite Expand), and one
# long-format (column, value) shuffle with map-side combine for ALL
# columns' exact distinct counts at once.
# ---------------------------------------------------------------------------

_PROFILE_COLS = [
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
    "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
    "l_linestatus", "l_shipdate",
]


def q_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ubparquet_spark.operators.profile import profile_table

    return profile_table(
        load_table(spark, sf_dir, "lineitem"), _PROFILE_COLS
    )


Q_PROFILE_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS "column", COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null,
       COUNT(DISTINCT {c}) AS n_distinct,
       CAST(MIN({c}) AS VARCHAR) AS min_value,
       CAST(MAX({c}) AS VARCHAR) AS max_value
FROM lineitem"""
    for c in _PROFILE_COLS
)


# ---------------------------------------------------------------------------
# Benford first-digit audit: observed first-digit distribution of
# o_totalprice vs Benford's log10(1 + 1/d) expectation — the classic
# fabricated-numbers screen. First digit extracted lexically from the
# integer cents (no float log bucketing); expectation evaluated with the
# same ln expression in both engines; one 9-bucket groupBy.
# ---------------------------------------------------------------------------

def q_benford_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    # |cents|: Benford's law reads the leading significant digit, and a
    # negative amount (refund/chargeback) would otherwise put '-' into
    # the ANSI string->long cast (extremes-corpus sweep finding)
    digit = F.substring(F.abs(cents("o_totalprice")).cast("string"), 1, 1).cast(
        "long"
    )
    total = orders.agg(F.count(F.lit(1)).alias("n_total"))
    # digit 0 = a zero-cent amount (sub-cent price): no leading
    # significant digit exists, and 1/digit would divide by zero —
    # excluded identically in both engines (extremes-corpus sweep)
    per = orders.select(digit.alias("digit")).filter(
        F.col("digit") >= 1
    ).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    expected = F.log(1.0 + 1.0 / F.col("digit").cast("double")) / F.log(
        F.lit(10.0)
    )
    return per.crossJoin(F.broadcast(total)).select(
        "digit",
        "n",
        roundn(F.col("n").cast("double") / F.col("n_total"), 6).alias(
            "obs_frac"
        ),
        roundn(expected, 6).alias("benford_frac"),
        roundn(
            F.abs(F.col("n").cast("double") / F.col("n_total") - expected), 6
        ).alias("abs_dev"),
    )


Q_BENFORD_SQL = f"""
WITH total AS (
  SELECT COUNT(*) AS n_total FROM orders
), per AS (
  SELECT CAST(substr(CAST(ABS(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                          AS VARCHAR), 1, 1) AS BIGINT) AS digit,
         COUNT(*) AS n
  FROM orders
  WHERE CAST(substr(CAST(ABS(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                         AS VARCHAR), 1, 1) AS BIGINT) >= 1
  GROUP BY 1
)
SELECT digit, n,
       {sql_roundn("CAST(n AS DOUBLE) / n_total", 6)} AS obs_frac,
       {sql_roundn(
           "ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0)", 6)}
         AS benford_frac,
       {sql_roundn(
           "ABS(CAST(n AS DOUBLE) / n_total"
           " - ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0))", 6)}
         AS abs_dev
FROM per CROSS JOIN total
"""


# ---------------------------------------------------------------------------
# Gini coefficient of customer revenue concentration — the inequality
# companion to q_customer_pareto. Needs every customer's exact GLOBAL rank
# by revenue: operators/ranks two-pass distributed ranking (range
# partition + broadcast offsets), never a no-partition window. With exact
# integer cents and exact ranks, G = (2·Σ i·x_i − (n+1)·Σx) / (n·Σx) is a
# ratio of exact integers (decimal(38,0) / HUGEINT — Σ i·x can reach
# ~1e23 at warehouse scale) with ONE double division at the end.
# ---------------------------------------------------------------------------

def q_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ubparquet_spark.operators.ranks import ranked

    rev = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", cents("o_totalprice").alias("pc"))
        .groupBy("o_custkey")
        .agg(F.sum("pc").alias("rev"))
    )
    r = ranked(rev, [], ["rev", "o_custkey"], rank_col="_i", n_col="_n")
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    sums = r.agg(
        F.max("_n").alias("n"),
        F.sum(dec("rev")).alias("sx"),
        F.sum(dec("_i") * dec("rev")).alias("six"),
    )
    n = F.col("n").cast("double")
    return sums.select(
        F.col("n").cast("long").alias("n_customers"),
        (F.col("sx").cast("double") / 100.0).alias("total_revenue"),
        roundn(
            (
                2.0 * F.col("six").cast("double")
                - (n + 1.0) * F.col("sx").cast("double")
            )
            / (n * F.col("sx").cast("double")),
            6,
        ).alias("gini"),
    )


Q_GINI_SQL = f"""
WITH rev AS (
  SELECT o_custkey,
         SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev
  FROM orders GROUP BY 1
), r AS (
  SELECT rev, ROW_NUMBER() OVER (ORDER BY rev, o_custkey) AS i,
         COUNT(*) OVER () AS n
  FROM rev
), sums AS (
  SELECT MAX(n) AS n, SUM(CAST(rev AS HUGEINT)) AS sx,
         SUM(CAST(i AS HUGEINT) * rev) AS six
  FROM r
)
SELECT CAST(n AS BIGINT) AS n_customers,
       CAST(sx AS DOUBLE) / 100.0 AS total_revenue,
       {sql_roundn(
           "(2.0 * CAST(six AS DOUBLE)"
           " - (CAST(n AS DOUBLE) + 1.0) * CAST(sx AS DOUBLE))"
           " / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))", 6)} AS gini
FROM sums
"""


# ---------------------------------------------------------------------------
# Spearman rank correlation between quantity and extended price at line
# grain — the monotonic-association counterpart of q_price_qty_corr's
# Pearson. Midranks come from each variable's VALUE DISTRIBUTION
# (before + (c+1)/2 per distinct value — one groupBy + a blocked prefix
# sum per variable, operators/ranks.blocked_cumsum; never a per-row
# global rank window OR a single-task distinct-value window — price
# cents are near-unique, so that table is row-scale), carried ×2 as
# exact integers and joined
# back to rows by value. All Pearson sums over (2r_x, 2r_y) are exact
# decimal(38,0)/HUGEINT (Σxy ≤ ~8n³); one double expression at the end.
# ---------------------------------------------------------------------------

def _midrank2(df: DataFrame, col: str, *, fuse: bool = False) -> DataFrame:
    """(value, 2·midrank) for ``col``'s distribution — exact integers.

    The "before" counts come from operators/ranks.blocked_cumsum: price
    cents are near-unique, so the rank table is row-scale and a plain
    ``SUM() OVER (ORDER BY _v)`` would funnel it through one task's sort.

    ``fuse`` (round 12, guide §2.4) — for a NEAR-UNIQUE value domain the
    distribution groupBy rides the blocked range exchange (range
    partitioning satisfies the groupBy's clustering): one exchange
    instead of two, at the cost of map-side partial aggregation, which a
    near-unique domain never benefited from. Keep the default for
    bounded domains (quantity cents: the distribution shuffle is ~50
    rows at any scale — fusing would push every fact row through it).
    """
    from ubparquet_spark.operators.ranks import (
        _shuffle_partitions,
        blocked_cumsum,
    )

    base = df.select(F.col(col).alias("_v"))
    if fuse:
        base = base.repartitionByRange(_shuffle_partitions(base), "_v")
    dist = base.groupBy("_v").agg(F.count(F.lit(1)).alias("_c"))
    cum = blocked_cumsum(
        dist, ["_v"], {"_b": ("_c", "exclusive")}, pre_partitioned=fuse
    )
    return cum.select(
        "_v", (2 * F.col("_b") + F.col("_c") + 1).cast("long").alias("_r2")
    )


def q_spearman_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        cents("l_quantity").alias("qc"), cents("l_extendedprice").alias("pc")
    )
    rx = _midrank2(li, "qc").withColumnsRenamed({"_v": "qc", "_r2": "x"})
    ry = _midrank2(li, "pc", fuse=True).withColumnsRenamed(
        {"_v": "pc", "_r2": "y"}
    )
    # quantity has a bounded distinct domain — broadcast; price is
    # near-unique so its rank table is row-scale — shuffle_hash
    joined = li.join(F.broadcast(rx), "qc").join(ry.hint("shuffle_hash"), "pc")
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    sums = joined.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("x")).alias("sx"),
        F.sum(dec("y")).alias("sy"),
        F.sum(dec("x") * dec("y")).alias("sxy"),
        F.sum(dec("x") * dec("x")).alias("sxx"),
        F.sum(dec("y") * dec("y")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    # zero variance on either variable (a constant column) leaves rho
    # undefined: NULL, matching DuckDB's NULL-on-zero-divisor — never an
    # ANSI DIVIDE_BY_ZERO (degenerate-corpus sweep)
    var2 = (n * sxx - sx * sx) * (n * syy - sy * sy)
    return sums.select(
        F.col("n").alias("n_rows"),
        F.when(
            var2 > 0,
            roundn((n * sxy - sx * sy) / F.sqrt(var2), 6),
        ).alias("spearman_rho"),
    )


def _midrank2_sql(src: str, col: str) -> str:
    return f"""(
  SELECT {col} AS _v,
         CAST(2 * COALESCE(SUM(_c) OVER (ORDER BY {col}
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              + _c + 1 AS BIGINT) AS _r2
  FROM (SELECT {col}, COUNT(*) AS _c FROM {src} GROUP BY 1)
)"""


Q_SPEARMAN_SQL = f"""
WITH li AS (
  SELECT CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT) AS qc,
         CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS pc
  FROM lineitem
), rx AS {_midrank2_sql("li", "qc")}, ry AS {_midrank2_sql("li", "pc")},
joined AS (
  SELECT rx._r2 AS x, ry._r2 AS y
  FROM li JOIN rx ON li.qc = rx._v JOIN ry ON li.pc = ry._v
), sums AS (
  SELECT COUNT(*) AS n,
         SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
         SUM(CAST(x AS HUGEINT) * y) AS sxy,
         SUM(CAST(x AS HUGEINT) * x) AS sxx,
         SUM(CAST(y AS HUGEINT) * y) AS syy
  FROM joined
)
SELECT n AS n_rows,
       CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
            THEN {sql_roundn(
           "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
           " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
           " / SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
           "         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
           "        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
           "           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))", 6)}
       END AS spearman_rho
FROM sums
"""


# ---------------------------------------------------------------------------
# Poisson-bootstrap confidence interval for the mean order value — the
# distributed bootstrap (Chamandy et al.'s Poisson trick, standard at
# planet scale): instead of resampling n rows B times (B full shuffles),
# every row carries B independent Poisson(1) replica weights derived
# DETERMINISTICALLY from md5(orderkey, replica), and each replica's
# weighted mean comes out of ONE partial-aggregatable pass with 2B sum
# expressions — no row blowup, no shuffle beyond the single global
# aggregate, bit-identical across engines because the weighted sums are
# exact integer cents. The inverse-CDF thresholds are shared literals
# (Poisson(1) CDF, capped at 7 — P(>7) ~ 1e-5, identical truncation both
# sides); u is 52 exact bits of the md5. The replica means then yield the
# percentile CI over a B-row bounded artifact. At 100 TB: B more hash+sum
# expressions per row, still one scan, one exchange.
# ---------------------------------------------------------------------------

BOOT_B = 32
#: Poisson(1) CDF thresholds for k = 0..6 (k=7 catches the tail)
_POIS_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507119,
)


def _boot_w(u_expr: str) -> str:
    cases = " ".join(
        f"WHEN {u_expr} < {p} THEN {k}" for k, p in enumerate(_POIS_CDF)
    )
    return f"CASE {cases} ELSE 7 END"


def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Shape notes (measured at sf0.1, BENCHNOTES round 8): the hash
    # fan-out is n x B md5 evaluations — the one genuinely
    # CPU-proportional stage. Three measured traps shaped this plan:
    # (1) a 2B-wide single-pass aggregate re-inlines the hash tree into
    # every aggregate expression (CollapseProject) — 6-9 s of driver
    # planning per fresh plan; (2) u must be its OWN projected column,
    # or the CASE re-evaluates the md5 once per threshold branch;
    # (3) the narrow projection is repartitioned BEFORE the explode:
    # a small-sf orders table is one parquet split, and without the
    # exchange the whole n x B hash fan-out runs in a single task
    # (measured 5.5 s -> 1.3 s at sf0.1). At lake scale the source has
    # natural splits and the 16-byte-row exchange is noise; partial
    # aggregation reduces each partition to B rows before the final
    # B-group shuffle either way.
    from ubparquet_spark.operators.ranks import _shuffle_partitions

    u = (
        "CAST(conv(substring(md5(concat(CAST(o_orderkey AS STRING), ':',"
        " CAST(b AS STRING))), 1, 13), 16, 10) AS BIGINT)"
        " / 4503599627370496.0D"
    )
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", cents("o_totalprice").alias("vc")
    )
    pre = (
        base.repartition(_shuffle_partitions(base))
        .select(
            "o_orderkey",
            "vc",
            F.explode(F.expr(f"sequence(0, {BOOT_B - 1})")).alias("b"),
        )
        .select("vc", "b", F.expr(u).alias("u"))
        .select("vc", "b", F.expr(_boot_w("u")).alias("w"))
    )
    # decimal(38,0) sums: the oracle's SUM(BIGINT) promotes to HUGEINT;
    # with ANSI off a BIGINT sum would wrap silently once 7*max_cents*n
    # passes 2^63 (well below lake scale). Same convention as q_twap.
    rep = pre.groupBy("b").agg(
        F.sum((F.col("w") * F.col("vc")).cast("decimal(38,0)")).alias("sv"),
        F.sum("w").alias("sn"),
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("vc").cast("decimal(38,0)")).alias("s0"),
    )
    # a replica whose every weight drew 0 (probability e^-n) has an
    # undefined mean: NULL in both engines, skipped by percentile() and
    # quantile_cont() alike
    m = F.try_divide(
        F.col("sv").cast("double"), F.col("sn").cast("double") * 100.0
    )
    # percentile() interpolates exactly like DuckDB quantile_cont; its
    # input is the B-row replica artifact. Empty input: rep is empty and
    # the keyed groupBy emits nothing, matching the oracle.
    return (
        rep.select(
            "n", "s0", m.alias("m")
        )
        .groupBy("n")
        .agg(
            roundn(
                F.max("s0").cast("double") / (F.col("n") * 100.0), 6
            ).alias("point_mean"),
            F.lit(BOOT_B).cast("long").alias("n_replicas"),
            roundn(F.expr("percentile(m, 0.025D)"), 6).alias("ci_lo"),
            roundn(F.expr("percentile(m, 0.5D)"), 6).alias("ci_median"),
            roundn(F.expr("percentile(m, 0.975D)"), 6).alias("ci_hi"),
        )
        .withColumnRenamed("n", "n_rows")
    )


_BOOT_U_DUCK_COL = (
    "CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':' ||"
    " CAST(b AS VARCHAR)), 1, 13) AS BIGINT) / 4503599627370496.0"
)

Q_BOOTSTRAP_CI_SQL = f"""
WITH base AS (
  SELECT o_orderkey, CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS vc
  FROM orders
), weighted AS (
  SELECT vc, b, {_boot_w("u")} AS w
  FROM (
    SELECT vc, b, {_BOOT_U_DUCK_COL} AS u
    FROM base, range(0, {BOOT_B}) r(b)
  )
), rep AS (
  SELECT b,
         CAST(SUM(w * vc) AS DOUBLE)
           / (CAST(NULLIF(SUM(w), 0) AS DOUBLE) * 100.0) AS m
  FROM weighted
  GROUP BY b
), pt AS (
  SELECT COUNT(*) AS n_rows,
         {sql_roundn(
             "CAST(SUM(vc) AS DOUBLE) / (COUNT(*) * 100.0)", 6)} AS point_mean
  FROM base
)
SELECT pt.n_rows, pt.point_mean,
       CAST({BOOT_B} AS BIGINT) AS n_replicas,
       {sql_roundn("quantile_cont(rep.m, 0.025)", 6)} AS ci_lo,
       {sql_roundn("quantile_cont(rep.m, 0.5)", 6)} AS ci_median,
       {sql_roundn("quantile_cont(rep.m, 0.975)", 6)} AS ci_hi
FROM rep, pt
GROUP BY pt.n_rows, pt.point_mean
"""


# ---------------------------------------------------------------------------
# Triangle counting (round 9): the classic distributed graph primitive on
# the brand co-purchase graph. Edges are brand pairs co-occurring in
# ≥ TRIANGLE_MIN_CO distinct orders; triangles are counted by the ordered
# two-path join (a<b<c — each triangle exactly once, the standard
# shuffle-join formulation of Suri & Vassilvitskii's MR-triangles). Scale
# shape: the fact table is touched ONCE (the shared distinct (order,
# brand) aggregation); the pair-count shuffle carries per-order brand
# pairs; everything after the edge list is bounded by the brand
# vocabulary (≤ C(|brands|, 2) rows), so the two triangle joins are
# broadcast-sized artifacts, not corpus joins.
# ---------------------------------------------------------------------------

TRIANGLE_MIN_CO = 2


def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    ob = _order_brand_pairs(spark, sf_dir)
    a, b = ob.alias("a"), ob.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_brand") < F.col("b.p_brand")),
        )
        .groupBy(
            F.col("a.p_brand").alias("u"), F.col("b.p_brand").alias("v")
        )
        .agg(F.count(F.lit(1)).alias("n_co"))
        .filter(F.col("n_co") >= TRIANGLE_MIN_CO)
        .select("u", "v")
        .localCheckpoint(eager=False)  # ≤ C(|brands|,2) rows; truncates the corpus plan
    )
    # size dispatch (see _GRAPH_LOCAL_EDGE_CAP): the corpus aggregation runs
    # distributed inside this ONE bounded job; the three count branches and
    # the triple self-join — pure set arithmetic on the bounded artifact —
    # finish on the driver instead of 3 more broadcast-build jobs
    if _GRAPH_LOCAL_EDGE_CAP >= 0:
        head = edges.limit(_GRAPH_LOCAL_EDGE_CAP + 1).collect()
        if len(head) <= _GRAPH_LOCAL_EDGE_CAP:
            from pyspark.sql import types as T

            es = [(e["u"], e["v"]) for e in head]
            eset = set(es)
            succ: dict = {}
            nodes = set()
            for u, v in es:
                succ.setdefault(u, []).append(v)
                nodes.add(u)
                nodes.add(v)
            n_tri = sum(
                1 for u, v in es for w in succ.get(v, ()) if (u, w) in eset
            )
            schema = T.StructType(
                [
                    T.StructField("n_nodes", T.LongType(), False),
                    T.StructField("n_edges", T.LongType(), False),
                    T.StructField("n_triangles", T.LongType(), False),
                ]
            )
            return spark.createDataFrame(
                [(len(nodes), len(es), n_tri)], schema
            )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = e1.join(e2, F.col("e1.v") == F.col("e2.u")).join(
        e3,
        (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")),
    )
    nodes = edges.select(F.col("u").alias("n")).unionAll(
        edges.select(F.col("v").alias("n"))
    ).distinct()
    return (
        edges.agg(F.count(F.lit(1)).alias("n_edges"))
        .crossJoin(F.broadcast(nodes.agg(F.count(F.lit(1)).alias("n_nodes"))))
        .crossJoin(
            F.broadcast(tri.agg(F.count(F.lit(1)).alias("n_triangles")))
        )
        .select("n_nodes", "n_edges", "n_triangles")
    )


Q_TRIANGLE_SQL = f"""
WITH ob AS (
  SELECT DISTINCT l_orderkey, p_brand
  FROM lineitem JOIN part ON p_partkey = l_partkey
), edges AS (
  SELECT a.p_brand AS u, b.p_brand AS v
  FROM ob a JOIN ob b
    ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
  GROUP BY 1, 2
  HAVING COUNT(*) >= {TRIANGLE_MIN_CO}
), nodes AS (
  SELECT DISTINCT n FROM (
    SELECT u AS n FROM edges UNION ALL SELECT v AS n FROM edges
  )
), tri AS (
  SELECT COUNT(*) AS n_triangles
  FROM edges e1
  JOIN edges e2 ON e1.v = e2.u
  JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
)
SELECT (SELECT COUNT(*) FROM nodes) AS n_nodes,
       (SELECT COUNT(*) FROM edges) AS n_edges,
       n_triangles
FROM tri
"""


# ---------------------------------------------------------------------------
# Price elasticity per brand (round 9): OLS of ln(quantity) on
# ln(unit price) over lineitem — the grouped-regression shape every
# pricing/econometrics pipeline runs. Per-row ln values are quantized to
# exact 1e-12 integers (the q_zipf_fit technique), all five sums
# accumulate in decimal(38,0), and the closed-form slope/intercept/R² is
# ONE double computation per brand — a single partial-aggregatable
# shuffle keyed by brand, bit-identical across engines.
# ---------------------------------------------------------------------------

_ELAST_SCALE = 10**12


def q_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") >= 1) & (F.col("l_extendedprice") > 0)
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    pts = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "p_brand",
        F.expr(
            "CAST(floor(ln(l_extendedprice / l_quantity)"
            f" * {_ELAST_SCALE} + 0.5) AS BIGINT)"
        ).alias("x"),
        F.expr(
            f"CAST(floor(ln(l_quantity) * {_ELAST_SCALE} + 0.5) AS BIGINT)"
        ).alias("y"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    sums = pts.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("x")).alias("sx"),
        F.sum(dec("y")).alias("sy"),
        F.sum(dec("x") * dec("y")).alias("sxy"),
        F.sum(dec("x") * dec("x")).alias("sxx"),
        F.sum(dec("y") * dec("y")).alias("syy"),
    )
    s = float(_ELAST_SCALE)
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double") / s
    sy = F.col("sy").cast("double") / s
    sxy = F.col("sxy").cast("double") / (s * s)
    sxx = F.col("sxx").cast("double") / (s * s)
    syy = F.col("syy").cast("double") / (s * s)
    cov, varx, vary = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
    return sums.select(
        F.col("p_brand").alias("brand"),
        F.col("n").alias("n_rows"),
        # try_divide: a single-price brand has zero x-variance -> NULL
        roundn(F.try_divide(cov, varx), 6).alias("elasticity"),
        roundn(F.try_divide(sy - F.try_divide(cov, varx) * sx, n), 6).alias(
            "intercept"
        ),
        roundn(F.try_divide(cov * cov, varx * vary), 6).alias("r2"),
    )


def _elasticity_sql() -> str:
    s = float(_ELAST_SCALE)
    return f"""
WITH pts AS (
  SELECT p_brand,
         CAST(FLOOR(ln(l_extendedprice / l_quantity)
              * {_ELAST_SCALE} + 0.5) AS BIGINT) AS x,
         CAST(FLOOR(ln(l_quantity) * {_ELAST_SCALE} + 0.5) AS BIGINT) AS y
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE l_quantity >= 1 AND l_extendedprice > 0
), sums AS (
  SELECT p_brand, COUNT(*) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         -- HUGEINT before the product: ln·1e12 terms are ~1e13 each, so
         -- x*y ~1e26 overflows INT64 at the ROW level, before SUM widens
         SUM(CAST(x AS HUGEINT) * y) AS sxy,
         SUM(CAST(x AS HUGEINT) * x) AS sxx,
         SUM(CAST(y AS HUGEINT) * y) AS syy
  FROM pts GROUP BY p_brand
), d AS (
  SELECT p_brand, n,
         CAST(n AS DOUBLE) AS nd,
         CAST(sx AS DOUBLE) / {s} AS sxd,
         CAST(sy AS DOUBLE) / {s} AS syd,
         CAST(sxy AS DOUBLE) / {s * s} AS sxyd,
         CAST(sxx AS DOUBLE) / {s * s} AS sxxd,
         CAST(syy AS DOUBLE) / {s * s} AS syyd
  FROM sums
)
SELECT p_brand AS brand, n AS n_rows,
       {sql_roundn(
           "(nd * sxyd - sxd * syd) / NULLIF(nd * sxxd - sxd * sxd, 0)",
           6)} AS elasticity,
       {sql_roundn(
           "(syd - ((nd * sxyd - sxd * syd)"
           " / NULLIF(nd * sxxd - sxd * sxd, 0)) * sxd) / nd", 6)}
         AS intercept,
       {sql_roundn(
           "((nd * sxyd - sxd * syd) * (nd * sxyd - sxd * syd))"
           " / NULLIF((nd * sxxd - sxd * sxd)"
           " * (nd * syyd - syd * syd), 0)", 6)} AS r2
FROM d
"""


Q_ELASTICITY_SQL = _elasticity_sql()


# ---------------------------------------------------------------------------
# Kendall's tau-b (staged in round 10, REGISTERED in round 11 within
# the 6/round cap).
#
# The tie-corrected rank-concordance coefficient between l_quantity and
# l_discount — the companion to q_spearman_qty_price when the analyst
# wants pair-concordance semantics. A naive Kendall is O(n²) over ROWS;
# here it is exact from the JOINT FREQUENCY GRID: quantity × discount
# has a bounded value domain (50 × 11 cells on TPC-H), so
#   P (concordant) = Σ_{a.x<b.x, a.y<b.y} f_a·f_b,
#   Q (discordant) = Σ_{a.x<b.x, a.y>b.y} f_a·f_b,
# computed by ONE self-join over the ≤|X|·|Y|-row cell artifact — never
# over raw rows.  Tie terms n1/n2 come from the marginals.  All mass
# arithmetic is exact decimal(38,0)/HUGEINT (counts are ~n², far past
# bigint at 100 TB — CAST BEFORE the multiply, the established rule);
# the final tau divides doubles once, bit-stable.  Scale: one (x, y)
# shuffle + a bounded-artifact join, identical to the Spearman plan's
# budget class.
# ---------------------------------------------------------------------------


def q_kendall_qty_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity").isNotNull() & F.col("l_discount").isNotNull()
    )
    cells = (
        li.select(
            cents("l_quantity").alias("x"), cents("l_discount").alias("y")
        )
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("f"))
        .localCheckpoint(eager=False)
    )
    a, b = cells.alias("a"), cells.alias("b")
    pq = a.join(b, F.col("a.x") < F.col("b.x")).agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.col("a.y") < F.col("b.y"), F.col("a.f") * F.col("b.f")
                )
            ),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("p"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("a.y") > F.col("b.y"), F.col("a.f") * F.col("b.f")
                )
            ),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("q"),
    )
    n_row = cells.agg(F.sum("f").alias("n"))
    t1 = (
        cells.groupBy("x")
        .agg(F.sum("f").alias("t"))
        .agg(F.sum(F.col("t") * (F.col("t") - 1)).alias("t1x2"))
    )
    t2 = (
        cells.groupBy("y")
        .agg(F.sum("f").alias("u"))
        .agg(F.sum(F.col("u") * (F.col("u") - 1)).alias("t2x2"))
    )
    out = n_row.crossJoin(pq).crossJoin(t1).crossJoin(t2)
    nd = F.col("n").cast("double")
    n0x2 = nd * (nd - 1.0)  # 2·n0
    denom = F.sqrt(n0x2 - F.col("t1x2").cast("double")) * F.sqrt(
        n0x2 - F.col("t2x2").cast("double")
    )
    return out.select(
        F.col("n").cast("long").alias("n_rows"),
        F.col("p").cast("double").alias("concordant"),
        F.col("q").cast("double").alias("discordant"),
        roundn(
            F.try_divide(
                2.0 * (F.col("p") - F.col("q")).cast("double"), denom
            ),
            6,
        ).alias("tau_b"),
    )


Q_KENDALL_SQL = """
WITH cells AS (
  SELECT CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT) AS x,
         CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) AS y,
         CAST(COUNT(*) AS HUGEINT) AS f
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
  GROUP BY 1, 2
), pq AS (
  SELECT COALESCE(SUM(CASE WHEN a.y < b.y THEN a.f * b.f END), 0) AS p,
         COALESCE(SUM(CASE WHEN a.y > b.y THEN a.f * b.f END), 0) AS q
  FROM cells a JOIN cells b ON a.x < b.x
), nn AS (
  SELECT SUM(f) AS n FROM cells
), t1 AS (
  SELECT SUM(t * (t - 1)) AS t1x2
  FROM (SELECT SUM(f) AS t FROM cells GROUP BY x)
), t2 AS (
  SELECT SUM(u * (u - 1)) AS t2x2
  FROM (SELECT SUM(f) AS u FROM cells GROUP BY y)
)
SELECT CAST(n AS BIGINT) AS n_rows,
       CAST(p AS DOUBLE) AS concordant,
       CAST(q AS DOUBLE) AS discordant,
       FLOOR((2.0 * CAST(p - q AS DOUBLE)
              / (SQRT(CAST(n AS DOUBLE) * (n - 1) - CAST(t1x2 AS DOUBLE))
                 * SQRT(CAST(n AS DOUBLE) * (n - 1) - CAST(t2x2 AS DOUBLE))))
             * 1000000 + 0.5) / 1000000 AS tau_b
FROM nn CROSS JOIN pq CROSS JOIN t1 CROSS JOIN t2
"""


# ---------------------------------------------------------------------------
# Theil T inequality index (staged in round 10, REGISTERED in round 11
# within the 6/round cap; see q_kendall_qty_disc).
#
# The information-theoretic companion to q_gini_revenue:
#   T = (1/n) Σ (x_i/μ)·ln(x_i/μ),  0 = perfect equality, ln(n) = one
# customer owns everything.  Unlike Gini it decomposes additively across
# subgroups, which is why monitoring pipelines report both.
#
# Exactness: expand T = (Σ x_i·ln x_i)/S + ln n − ln S (scale-invariant,
# so x in exact cents).  The ONLY per-row transcendental, ln(x_i), is
# quantized to an integer at 1e-12 grain (the q_price_elasticity rule)
# and Σ x_i·L_i accumulates in decimal(38,0)/HUGEINT — order-independent
# under any partial-agg layout; ln(n) and ln(S) are single-row calls.
# Zero-revenue customers contribute 0·ln 0 = 0 (excluded identically in
# both engines).  Scale: ONE customer-grain shuffle + a 1-row reduce.
# ---------------------------------------------------------------------------


def q_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    rev = (
        orders.groupBy("o_custkey")
        .agg(F.sum(cents("o_totalprice")).alias("xc"))
        .filter(F.col("xc") > 0)
    )
    terms = rev.select(
        "xc",
        # integer-quantized ln(x): floor(ln(xc)·1e12 + 0.5) as bigint
        F.expr("CAST(floor(ln(CAST(xc AS DOUBLE)) * 1e12 + 0.5) AS BIGINT)")
        .alias("lq"),
    )
    agg = terms.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("xc").cast("decimal(38,0)")).alias("s"),
        F.sum(
            F.col("xc").cast("decimal(38,0)") * F.col("lq").cast("decimal(38,0)")
        ).alias("sxl"),
    )
    t = (
        F.col("sxl").cast("double") / 1e12 / F.col("s").cast("double")
        + F.log(F.col("n").cast("double"))
        - F.log(F.col("s").cast("double"))
    )
    return agg.select(
        F.col("n").cast("long").alias("n_customers"),
        (F.col("s").cast("double") / 100.0).alias("total_rev"),
        roundn(t, 6).alias("theil_t"),
    )


Q_THEIL_INDEX_SQL = """
WITH rev AS (
  SELECT o_custkey,
         SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS xc
  FROM orders GROUP BY 1
), terms AS (
  SELECT xc,
         CAST(FLOOR(ln(CAST(xc AS DOUBLE)) * 1e12 + 0.5) AS BIGINT) AS lq
  FROM rev WHERE xc > 0
), agg AS (
  SELECT COUNT(*) AS n,
         SUM(CAST(xc AS HUGEINT)) AS s,
         SUM(CAST(xc AS HUGEINT) * lq) AS sxl
  FROM terms
)
SELECT CAST(n AS BIGINT) AS n_customers,
       CAST(s AS DOUBLE) / 100.0 AS total_rev,
       FLOOR((CAST(sxl AS DOUBLE) / 1e12 / CAST(s AS DOUBLE)
              + ln(NULLIF(CAST(n AS DOUBLE), 0))
              - ln(CAST(s AS DOUBLE)))
             * 1000000 + 0.5) / 1000000 AS theil_t
FROM agg
"""


QUERIES: dict[str, tuple] = {
    "q_kendall_qty_disc": (q_kendall_qty_disc, Q_KENDALL_SQL),
    "q_theil_index": (q_theil_index, Q_THEIL_INDEX_SQL),
    "q_triangle_count": (q_triangle_count, Q_TRIANGLE_SQL),
    "q_price_elasticity": (q_price_elasticity, Q_ELASTICITY_SQL),
    "q_bootstrap_ci": (q_bootstrap_ci, Q_BOOTSTRAP_CI_SQL),
    "q_spearman_qty_price": (q_spearman_qty_price, Q_SPEARMAN_SQL),
    "q_benford_prices": (q_benford_prices, Q_BENFORD_SQL),
    "q_gini_revenue": (q_gini_revenue, Q_GINI_SQL),
    "q_profile_lineitem": (q_profile_lineitem, Q_PROFILE_SQL),
    "q_consistent_sample": (q_consistent_sample, Q_CONSISTENT_SAMPLE_SQL),
    "q_assoc_rules": (q_assoc_rules, Q_ASSOC_RULES_SQL),
    "q_price_deciles": (q_price_deciles, Q_PRICE_DECILES_SQL),
    "q_editdist_pairs": (q_editdist_pairs, Q_EDITDIST_PAIRS_SQL),
    "q_robust_outliers_mad": (q_robust_outliers_mad, Q_ROBUST_OUTLIERS_SQL),
    "q_snapshot_diff": (q_snapshot_diff, Q_SNAPSHOT_DIFF_SQL),
    "q_brand_pagerank": (q_brand_pagerank, Q_BRAND_PAGERANK_SQL),
    "q_yoy_growth": (q_yoy_growth, Q_YOY_GROWTH_SQL),
    "q_copurchase_pairs": (q_copurchase_pairs, Q_COPURCHASE_SQL),
    "q_winsorized_prices": (q_winsorized_prices, Q_WINSORIZED_SQL),
    "q_customer_pareto": (q_customer_pareto, Q_CUSTOMER_PARETO_SQL),
    "q17_small_qty_revenue": (q17_small_qty_revenue, Q17_SQL),
    "q20_excess_suppliers": (q20_excess_suppliers, Q20_SQL),
    "q4_order_priority": (q4_order_priority, Q4_SQL),
    "q21_waiting_suppliers": (q21_waiting_suppliers, Q21_SQL),
    "q8_market_share": (q8_market_share, Q8_SQL),
    "q9_product_profit": (q9_product_profit, Q9_SQL),
    "q12_service_levels": (q12_service_levels, Q12_SQL),
    "q22_dormant_customers": (q22_dormant_customers, Q22_SQL),
    "q_price_histogram": (q_price_histogram, Q_PRICE_HISTOGRAM_SQL),
    "q11_important_parts": (q11_important_parts, Q11_SQL),
    "q2_min_cost_parts": (q2_min_cost_parts, Q2_SQL),
    "q_grouping_sets": (q_grouping_sets, Q_GROUPING_SETS_SQL),
    "q_order_price_ranks": (q_order_price_ranks, Q_ORDER_PRICE_RANKS_SQL),
    "q_exact_quantiles": (q_exact_quantiles, Q_EXACT_QUANTILES_SQL),
    "q13_order_count_histogram": (q13_order_count_histogram, Q13_SQL),
    "q18_large_volume_orders": (q18_large_volume_orders, Q18_SQL),
    "q16_part_supplier_variety": (q16_part_supplier_variety, Q16_SQL),
    "q15_top_supplier": (q15_top_supplier, Q15_SQL),
    "q7_nation_volume": (q7_nation_volume, Q7_SQL),
    "q_sketch_stats": (q_sketch_stats, Q_SKETCH_STATS_SQL),
    "q_set_ops_customers": (q_set_ops_customers, Q_SET_OPS_SQL),
    "q_string_funcs": (q_string_funcs, Q_STRING_FUNCS_SQL),
    "q_rolling_7day_revenue": (q_rolling_7day_revenue, Q_ROLLING_SQL),
    "q_order_gaps": (q_order_gaps, Q_ORDER_GAPS_SQL),
    "q_price_stats": (q_price_stats, Q_PRICE_STATS_SQL),
    "q_price_qty_corr": (q_price_qty_corr, Q_PRICE_QTY_CORR_SQL),
    "q6_forecast_revenue": (q6_forecast_revenue, Q6_SQL),
    "q10_returned_items": (q10_returned_items, Q10_SQL),
    "q14_promo_revenue": (q14_promo_revenue, Q14_SQL),
    "q19_disjunctive": (q19_disjunctive, Q19_SQL),
    "q_regex_source_buckets": (q_regex_source_buckets, Q_REGEX_SQL),
    "q_order_qty_profile": (q_order_qty_profile, Q_ORDER_QTY_PROFILE_SQL),
    "q_cube_orders": (q_cube_orders, Q_CUBE_SQL),
    "q_small_quantity_revenue": (q_small_quantity_revenue, Q_SMALL_QTY_SQL),
    "q_late_orders_semi": (q_late_orders_semi, Q_SEMI_SQL),
    "q_customers_without_orders": (q_customers_without_orders, Q_ANTI_SQL),
    "q_rollup_revenue": (q_rollup_revenue, Q_ROLLUP_SQL),
    "q_above_avg_balance": (q_above_avg_balance, Q_ABOVE_AVG_SQL),
    "q_priority_remap": (q_priority_remap, Q_REMAP_SQL),
    "q_mod_sample": (q_mod_sample, Q_MOD_SAMPLE_SQL),
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "q3_shipping_priority": (q3_shipping_priority, Q3_SQL),
    "q5_local_supplier": (q5_local_supplier, Q5_SQL),
    "q_point_lookup": (q_point_lookup, Q_POINT_LOOKUP_SQL),
    "q_dedup_audit": (q_dedup_audit, Q_DEDUP_AUDIT_SQL),
    "q_distinct_segments": (q_distinct_segments, Q_DISTINCT_SQL),
    "q_sanity_bounds": (q_sanity_bounds, Q_SANITY_SQL),
    "q_value_sanity": (q_value_sanity, Q_VALUE_SANITY_SQL),
    "q_key_integrity": (q_key_integrity, Q_KEY_INTEGRITY_SQL),
    "q_canonicalize_keys": (q_canonicalize_keys, Q_CANONICALIZE_SQL),
    "q_ref_integrity": (q_ref_integrity, Q_REF_INTEGRITY_SQL),
    "q_top_orders_per_customer": (q_top_orders_per_customer, Q_TOPK_SQL),
    "q_cumulative_revenue": (q_cumulative_revenue, Q_CUMSUM_SQL),
}
