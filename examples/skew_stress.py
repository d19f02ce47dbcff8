"""Skew-stress harness: operators/skew under a deliberately Zipf-hot key.

Builds an N× `events` replica (the scale_stress user-offset technique)
and then REMAPS ~30 % of all rows onto user_id 1 — a single viral key
holding 30 % of a fact table, the canonical hot-key pathology — plus a
user-grain dim table sized past the broadcast threshold when asked.

Measured matrix (best-of-2 wall seconds each):

aggregation
  agg_plain     groupBy(user).agg(sum, count) on the hot table
  agg_salted    operators/skew.salted_aggregate, same aggregates
    Expected finding: PARITY. Spark's partial aggregation (map-side
    combine) already spreads algebraic aggregates across every mapper —
    the hot key arrives at its reducer as ~n_mappers partial rows, not
    30 % of the fact table. salted_aggregate exists for engines/paths
    without that combine, not as a speedup over it; this harness PROVES
    the plain plan is safe rather than assuming it.

join (dim side pinned shuffle_hash so it cannot broadcast — the
"broadcast-infeasible" case the operator targets)
  join_aqe      plain join, AQE skew-join ON (the shipped default)
  join_noaqe    plain join, AQE skew-join OFF — the raw hot-partition cost
  join_salted   operators/skew.salted_join, AQE skew-join OFF
    Expected finding: join_noaqe degrades with the hot key (one reducer
    sorts/hashes 30 % of the table); join_salted recovers most of it by
    splitting the key across n_salts reducers; join_aqe shows the
    default path needs no manual salting. salted_join is therefore the
    documented fallback for skew AQE cannot see (streaming joins, or a
    shuffle-hash build side AQE declines to split).

Run: python examples/skew_stress.py [factor] [workdir]
Results go to BENCHNOTES.md ("skew" section).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from ubparquet_spark.io import load_table
from ubparquet_spark.operators.skew import salted_aggregate, salted_join
from ubparquet_spark.session import get_session

HOT_USER = 1
HOT_FRAC_PCT = 30  # % of ALL rows remapped onto HOT_USER


def build_skewed(spark, src_dir: str, dst_dir: str, factor: int) -> str:
    out = os.path.join(dst_dir, "events_skewed.parquet")
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    ev = load_table(spark, src_dir, "events")
    n = ev.count()
    reps = [
        ev.select(
            (F.col("event_id") + k * n).alias("event_id"),
            "ts",
            (F.col("user_id") + k * 100_000).alias("user_id"),
            "event_type",
            "value",
        )
        for k in range(factor)
    ]
    big = reps[0]
    for r in reps[1:]:
        big = big.unionByName(r)
    skewed = big.withColumn(
        "user_id",
        F.when(
            F.pmod(F.xxhash64("event_id"), 100) < HOT_FRAC_PCT, F.lit(HOT_USER)
        ).otherwise(F.col("user_id")),
    )
    skewed.repartition(32).write.mode("overwrite").parquet(out)
    return out


def build_dim(spark, events_path: str, dst_dir: str) -> str:
    out = os.path.join(dst_dir, "user_dim.parquet")
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    ev = spark.read.parquet(events_path)
    dim = (
        ev.select("user_id")
        .distinct()
        .withColumn("segment", F.pmod(F.xxhash64("user_id"), 7))
        # pad the dim rows so the size estimate is honest about a real
        # user-attribute table (not a 2-column sliver)
        .withColumn("attrs", F.expr("repeat(cast(user_id as string), 64)"))
    )
    dim.repartition(8).write.mode("overwrite").parquet(out)
    return out


def timed(label: str, fn, reps: int = 2) -> float:
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label}: {best:.2f}s", flush=True)
    return best


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    workdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/stress_skew"
    os.makedirs(workdir, exist_ok=True)
    spark = get_session("skew-stress")
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    ev_path = build_skewed(spark, src, workdir, factor)
    dim_path = build_dim(spark, ev_path, workdir)
    ev = spark.read.parquet(ev_path)
    dim = spark.read.parquet(dim_path)
    hot = ev.filter(F.col("user_id") == HOT_USER).count()
    total = ev.count()
    print(f"rows={total} hot_user_rows={hot} ({100.0 * hot / total:.1f}%)")

    results: dict[str, float] = {}

    # -- aggregation: plain vs salted -------------------------------------
    results["agg_plain"] = timed(
        "agg_plain",
        lambda: ev.groupBy("user_id")
        .agg(F.sum("value").alias("s"), F.count(F.lit(1)).alias("c"))
        .agg(F.count(F.lit(1)), F.sum("s"), F.sum("c"))
        .collect(),
    )
    results["agg_salted"] = timed(
        "agg_salted",
        lambda: salted_aggregate(
            ev,
            ["user_id"],
            {"s": ("sum", "value"), "c": ("count", F.lit(1))},
            n_salts=32,
        )
        .agg(F.count(F.lit(1)), F.sum("s"), F.sum("c"))
        .collect(),
    )

    # -- join: dim pinned shuffle_hash (broadcast-infeasible case) --------
    def run_join(join_df):
        return (
            join_df.groupBy("segment")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
            .collect()
        )

    def set_skewjoin(on: bool) -> None:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(on).lower())

    set_skewjoin(True)
    results["shj_aqe"] = timed(
        "shj_aqe", lambda: run_join(ev.join(dim.hint("shuffle_hash"), "user_id"))
    )
    set_skewjoin(False)
    try:
        results["shj_noaqe"] = timed(
            "shj_noaqe",
            lambda: run_join(ev.join(dim.hint("shuffle_hash"), "user_id")),
        )
        results["shj_salted"] = timed(
            "shj_salted",
            lambda: run_join(salted_join(ev, dim, "user_id", n_salts=32)),
        )
        # sort-merge variants: the hot partition pays an O(n log n) SORT,
        # the skew shape where salting has real leverage
        results["smj_noaqe"] = timed(
            "smj_noaqe", lambda: run_join(ev.join(dim.hint("merge"), "user_id"))
        )
        results["smj_salted"] = timed(
            "smj_salted",
            lambda: run_join(
                salted_join(ev, dim.hint("merge"), "user_id", n_salts=32)
            ),
        )
    finally:
        set_skewjoin(True)
    results["smj_aqe"] = timed(
        "smj_aqe", lambda: run_join(ev.join(dim.hint("merge"), "user_id"))
    )

    print("RESULTS", {k: round(v, 2) for k, v in results.items()})


if __name__ == "__main__":
    main()
