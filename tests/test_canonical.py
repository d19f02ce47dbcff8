"""canonicalize_keys: the remediation operator behind the q_key_integrity
gate (VERDICT r07 "Next round" #4). Unit semantics plus the full
gate → remediate → verify flow on a duplicate-row poisoned corpus."""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.oracle import assert_matches_oracle
from ubparquet_spark.operators.canonical import canonicalize_keys


def _df(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def test_first_and_last_winners(spark):
    rows = [
        (1, 10, "a"),
        (1, 30, "c"),
        (1, 20, "b"),
        (2, 5, "x"),
    ]
    df = _df(spark, rows, ["k", "v", "tag"])
    first = canonicalize_keys(df, ["k"], [F.col("v").asc()]).collect()
    got = {r.k: (r.v, r.tag) for r in first}
    assert got == {1: (10, "a"), 2: (5, "x")}
    last = canonicalize_keys(df, ["k"], [F.col("v").asc()], keep="last").collect()
    got = {r.k: (r.v, r.tag) for r in last}
    assert got == {1: (30, "c"), 2: (5, "x")}


def test_string_order_by_and_column_preservation(spark):
    df = _df(spark, [(1, 2, 3), (1, 1, 4)], ["k", "o", "payload"])
    out = canonicalize_keys(df, ["k"], ["o"])
    assert out.columns == ["k", "o", "payload"]
    assert out.collect() == [(1, 1, 4)]


def test_null_keys_form_a_group_not_dropped(spark):
    """NULL keys group together (Spark groupBy null-equality): the gate
    counts them as keys, so remediation must keep exactly one row for
    the NULL group rather than dropping or exploding it."""
    rows = [(None, 1), (None, 2), (7, 3)]
    df = _df(spark, rows, ["k", "v"]).withColumn(
        "k", F.col("k").cast("int")
    )
    out = canonicalize_keys(df, ["k"], [F.col("v").asc()]).collect()
    got = {r.k: r.v for r in out}
    assert got == {None: 1, 7: 3}


def test_exact_duplicate_rows_compact_to_one(spark):
    df = _df(spark, [(1, 9), (1, 9), (1, 9)], ["k", "v"])
    out = canonicalize_keys(df, ["k"], [F.col("v").asc()]).collect()
    assert out == [(1, 9)]


def test_rejects_empty_keys_and_empty_order(spark):
    df = _df(spark, [(1, 2)], ["k", "v"])
    with pytest.raises(ValueError, match="at least one key"):
        canonicalize_keys(df, [], ["v"])
    with pytest.raises(ValueError, match="order_by"):
        canonicalize_keys(df, ["k"], [])
    with pytest.raises(ValueError, match="keep"):
        canonicalize_keys(df, ["k"], ["v"], keep="middle")


def test_single_shuffle_plan(spark):
    """One keyed exchange feeds the window — remediation must not add a
    second shuffle on top of the CDC-compaction shape."""
    df = spark.range(100).select(
        (F.col("id") % 10).alias("k"), F.col("id").alias("v")
    )
    out = canonicalize_keys(df, ["k"], [F.col("v").desc()])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def _vhash(p):
    p = p[sorted(p.columns)].sort_values(by=sorted(p.columns), ignore_index=True)
    return hashlib.sha256(p.to_csv(index=False).encode()).hexdigest()[:12]


def test_gate_remediate_verify_on_duplicate_corpus(spark, tmp_path_factory):
    """The documented flow after q_key_integrity flags re-delivery:
    gate (detect) → canonicalize_keys (remediate) → gate green →
    contract-bound plans hash-match DuckDB on the remediated lake."""
    import __spark_entry__ as entry

    src = "/root/testdata/sf0.001"
    poisoned = str(tmp_path_factory.mktemp("sf_redelivered"))
    clean = str(tmp_path_factory.mktemp("sf_remediated"))

    build = duckdb.connect()
    specs = {
        "events": "SELECT * FROM src UNION ALL"
                  " SELECT * FROM src WHERE event_id % 7 = 0",
        "orders": "SELECT * FROM src UNION ALL"
                  " SELECT * FROM src WHERE o_orderkey % 11 = 0",
        "documents": "SELECT * FROM src UNION ALL"
                     " SELECT * FROM src WHERE doc_id % 9 = 0",
    }
    passthrough = [
        "region", "nation", "customer", "supplier", "part",
        "lineitem", "embeddings",
    ]
    for t, sql in specs.items():
        build.sql(
            f"CREATE OR REPLACE VIEW src AS SELECT * FROM '{src}/{t}.parquet'"
        )
        build.sql(f"COPY ({sql}) TO '{poisoned}/{t}.parquet' (FORMAT PARQUET)")
    for t in passthrough:
        for d in (poisoned, clean):
            build.sql(
                f"COPY (SELECT * FROM '{src}/{t}.parquet')"
                f" TO '{d}/{t}.parquet' (FORMAT PARQUET)"
            )

    # 1. GATE: the integrity audit flags the three re-delivered tables.
    gate = entry.queries()["q_key_integrity"](spark, poisoned).toPandas()
    flagged = {
        r.table_name for _, r in gate.iterrows() if r.n_dup_keys > 0
    }
    assert {"events", "orders", "documents"} <= flagged

    # 2. REMEDIATE: deterministic compaction on each flagged table's PK,
    # total-ordered by the full payload (re-delivered rows are exact
    # copies, so any winner is value-identical — the order makes the
    # choice deterministic even under payload-divergent duplicates).
    pks = {"events": "event_id", "orders": "o_orderkey", "documents": "doc_id"}
    for t, pk in pks.items():
        df = spark.read.parquet(f"{poisoned}/{t}.parquet")
        order = [F.col(c).asc() for c in df.columns if c != pk]
        canonicalize_keys(df, [pk], order).write.mode("overwrite").parquet(
            f"{clean}/_stage_{t}"
        )
        # Spark writes a part-file directory; the oracle harness (like the
        # driver) reads one file per table — compact via DuckDB, same rows.
        build.sql(
            f"COPY (SELECT * FROM '{clean}/_stage_{t}/*.parquet')"
            f" TO '{clean}/{t}.parquet' (FORMAT PARQUET)"
        )

    # 3. GATE GREEN: the audit on the remediated lake shows unique PKs.
    regate = entry.queries()["q_key_integrity"](spark, clean).toPandas()
    by_t = {r.table_name: r for _, r in regate.iterrows()}
    for t in pks:
        assert by_t[t].n_dup_keys == 0, t
        assert by_t[t].max_multiplicity == 1, t

    # 4. VERIFY: contract-bound plans (duplicate-PK-divergent in the
    # round-7 probe) hash-match the DuckDB oracle on the remediated lake.
    contract_bound = [
        "q_latest_event_per_user",
        "q_top_orders_per_customer",
        "q_dedup_audit",
        "q_pivot_user_events",
        "q_events_funnel",
        "q_key_integrity",
    ]
    queries, oracles = entry.queries(), entry.oracle_sql()
    for name in contract_bound:
        assert_matches_oracle(queries[name](spark, clean), oracles[name], clean)
