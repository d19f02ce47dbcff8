"""segmented_lead == plain whole-partition lead, without its single-task sort."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from ubparquet_spark.operators.segmented import segmented_lead

from .test_plans_physical import plan_text


def _mk(spark, rows):
    return spark.createDataFrame(rows, "part string, us long, id long, v double")


def _plain(df, target="us"):
    w = Window.partitionBy("part").orderBy("us", "id")
    return df.withColumn("nxt", F.lead(target).over(w))


def _collect(df):
    return sorted(
        (r["part"], r["us"], r["id"], r["nxt"]) for r in df.collect()
    )


def test_matches_plain_lead_on_random_data(spark):
    rng = random.Random(7)
    rows = [
        (p, rng.randrange(0, 5000), i, float(i))
        for i, p in enumerate(
            p for p in ("a", "b", "c") for _ in range(400)
        )
    ]
    df = _mk(spark, rows)
    got = segmented_lead(
        df, ["part"], ["us", "id"], "us", F.expr("us DIV 100"), "nxt"
    )
    assert _collect(got) == _collect(_plain(df))


def test_empty_buckets_and_sparse_tails(spark):
    # bucket gaps: values cluster at 0-10 and 100000-100010 with nothing
    # between — the handoff must jump across many empty buckets
    rows = [("a", u, i, 0.0) for i, u in enumerate([0, 3, 9, 100000, 100004])]
    rows += [("b", 50, 0, 0.0)]  # single-row partition: lead stays NULL
    df = _mk(spark, rows)
    got = segmented_lead(
        df, ["part"], ["us", "id"], "us", F.expr("us DIV 7"), "nxt"
    )
    assert _collect(got) == _collect(_plain(df))


def test_null_target_next_row_is_preserved(spark):
    # the NEXT row's target being NULL must yield NULL (plain-lead
    # semantics), not the next bucket's first value
    rows = [("a", 1, 0, 1.0), ("a", 2, 1, None), ("a", 300, 2, 3.0)]
    df = _mk(spark, rows)
    w = Window.partitionBy("part").orderBy("us", "id")
    plain = df.withColumn("nxt", F.lead("v").over(w))
    got = segmented_lead(
        df, ["part"], ["us", "id"], "v", F.expr("us DIV 100"), "nxt"
    )
    exp = sorted((r["us"], r["nxt"]) for r in plain.collect())
    act = sorted((r["us"], r["nxt"]) for r in got.collect())
    assert act == exp == [(1, None), (2, 3.0), (300, None)]


def test_ties_in_first_order_col_stay_in_one_bucket(spark):
    # equal us, distinct id: the bucket function depends on us only, so
    # the tie is ordered INSIDE one bucket exactly like the plain window
    rows = [("a", 100, i, float(i)) for i in range(5)] + [
        ("a", 205, 9, 9.0)
    ]
    df = _mk(spark, rows)
    got = segmented_lead(
        df, ["part"], ["us", "id"], "us", F.expr("us DIV 100"), "nxt"
    )
    assert _collect(got) == _collect(_plain(df))


def test_no_whole_partition_window_in_plan(spark):
    # the point of the operator: every windowspec must include the bucket
    # column (fact side) or run over the tiny per-bucket artifact — never
    # partition the fact rows by the low-cardinality key alone
    df = _mk(spark, [("a", 1, 0, 0.0), ("a", 150, 1, 1.0)])
    got = segmented_lead(
        df, ["part"], ["us", "id"], "us", F.expr("us DIV 100"), "nxt"
    )
    txt = plan_text(got)
    specs = [
        seg.split("]")[0]
        for seg in txt.split("windowspecdefinition(")[1:]
    ]
    assert specs, "expected Window operators in the plan"
    fact_specs = [s for s in specs if "__seg" in s]
    # exactly one spec (deduped) runs on the fact side with the bucket in
    # its partition clause; the handoff spec runs post-aggregation
    assert fact_specs, f"no bucketed fact-side window found: {specs}"


def test_lag_matches_plain_lag_on_random_data(spark):
    from ubparquet_spark.operators.segmented import segmented_lag

    rng = random.Random(13)
    rows = [
        (p, rng.randrange(0, 5000), i, float(i))
        for i, p in enumerate(p for p in ("a", "b") for _ in range(300))
    ]
    df = _mk(spark, rows)
    w = Window.partitionBy("part").orderBy("us", "id")
    plain = df.withColumn("prv", F.lag("us").over(w))
    got = segmented_lag(
        df, ["part"], ["us", "id"], "us", F.expr("us DIV 100"), "prv"
    )
    key = lambda d: sorted((r["part"], r["us"], r["id"], r["prv"]) for r in d.collect())
    assert key(got) == key(plain)


def test_lag_null_target_prev_row_is_preserved(spark):
    from ubparquet_spark.operators.segmented import segmented_lag

    # previous row's target NULL -> NULL, even at a bucket boundary
    rows = [("a", 1, 0, None), ("a", 300, 1, 3.0), ("a", 301, 2, 4.0)]
    df = _mk(spark, rows)
    got = segmented_lag(
        df, ["part"], ["us", "id"], "v", F.expr("us DIV 100"), "prv"
    )
    act = sorted((r["us"], r["prv"]) for r in got.collect())
    assert act == [(1, None), (300, None), (301, 3.0)]
