"""Incremental-maintenance cost model, measured (round 8).

The claim in SCALING.md: keeping corpus statistics current from deltas
costs one scan of EACH DELTA plus a state-sized merge, vs a full rescan
of history every time. This harness measures exactly that on the events
table split into daily deltas:

  - ``recompute``: full GROUP BY over all days, run once per day as a
    naive nightly job would (cost grows linearly with history length);
  - ``incremental``: fold each day's delta into the running state via
    ``operators.incremental.maintain_state`` (cost stays ~flat per day).

Reports per-day wall time for both strategies and the crossover day.
The statistics maintained are the q_incremental_stats set (count, exact
decimal sum, min/max) plus an HLL distinct-users sketch — the sketch is
the part a plain GROUP BY recompute cannot carry incrementally at all
(COUNT DISTINCT does not decompose; the HLL state does).

Two phases:

A. sf_dir events split into real daily deltas — correctness (fold ==
   recompute on exact fields, sketch within error) plus honest wall
   numbers. At sf0.1 the deltas are ~3.3k rows, so BOTH strategies are
   job-overhead-bound and the recompute WINS — reported as-is; this is
   the regime where incremental is pointless.
B. synthetic history at [rows_per_day] x [n_days] — the steady-state
   question: what does DAY N cost? Recompute scans the whole history
   (N x delta rows, growing forever); maintain_state scans the new
   delta only. The crossover is where delta-scan time overtakes the
   fixed per-job overhead; past it the gap widens linearly with
   history length — at 100 TB of history the recompute is a full-lake
   scan, the incremental step is unchanged.

Usage: python examples/incremental_maintenance.py [sf_dir] [rows_per_day] [n_days]
Defaults $SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1, 2_000_000 x 12.
Results land in BENCHNOTES.md's round-8 section.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from ubparquet_spark.io import load_table  # noqa: E402
from ubparquet_spark.operators.incremental import (  # noqa: E402
    agg_state,
    finalize_state,
    maintain_state,
)
from ubparquet_spark.session import get_session  # noqa: E402

KEYS = ["event_type"]
SPEC = dict(sums=["value"], mins=["ts"], maxs=["ts"], distincts=["user_id"])


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_session("incremental-maintenance")
    ev = load_table(spark, sf_dir, "events")

    with tempfile.TemporaryDirectory() as tmp:
        # materialize daily deltas as separate parquet dirs (the lake's
        # append layout); NULL-ts rows ride with day 0
        days = sorted(
            str(r[0])
            for r in ev.select(F.to_date("ts")).distinct().collect()
            if r[0] is not None
        )
        delta_paths = []
        for i, d in enumerate(days):
            p = f"{tmp}/day={d}"
            sel = ev.filter(F.to_date("ts") == F.lit(d))
            if i == 0:
                sel = sel.unionByName(ev.filter(F.col("ts").isNull()))
            sel.write.parquet(p)
            delta_paths.append(p)
        print(f"{len(delta_paths)} daily deltas at {sf_dir}")

        # warm the JVM so day-1 numbers aren't JVM startup
        spark.read.parquet(delta_paths[0]).count()

        state = None
        state_rows = None
        incr_total = 0.0
        recompute_total = 0.0
        print(f"{'day':>4} {'incr_s':>8} {'recompute_s':>12}")
        for i, p in enumerate(delta_paths):
            t0 = time.perf_counter()
            delta = spark.read.parquet(p)
            state = maintain_state(state, delta, KEYS, **SPEC)
            # persist the state like a real job (bounded: #event_types)
            state_rows = state.collect()
            state = spark.createDataFrame(state_rows, state.schema)
            incr_s = time.perf_counter() - t0

            t0 = time.perf_counter()
            full = spark.read.parquet(*delta_paths[: i + 1])
            full.groupBy(*KEYS).agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("value").cast("decimal(38,6)")).alias("s"),
                F.min("ts").alias("mn"),
                F.max("ts").alias("mx"),
                F.approx_count_distinct("user_id").alias("du"),
            ).collect()
            recompute_s = time.perf_counter() - t0

            incr_total += incr_s
            recompute_total += recompute_s
            if i < 3 or i == len(delta_paths) - 1:
                print(f"{i:>4} {incr_s:>8.3f} {recompute_s:>12.3f}")

        # exact fields must match the recompute bit-for-bit; the sketch
        # estimate carries the sketch's error bound instead (merged vs
        # single-shot estimates legitimately differ past coupon mode)
        drop_distinct = lambda r: {
            k: v
            for k, v in r.asDict().items()
            if not k.startswith("distinct_")
        }
        fin = finalize_state(state)
        direct = finalize_state(agg_state(ev, KEYS, **SPEC))
        key = lambda df: sorted(map(str, map(drop_distinct, df.collect())))
        assert key(fin) == key(direct), "state fold != recompute"
        exact = {
            r["event_type"]: r["x"]
            for r in ev.filter(F.col("user_id").isNotNull())
            .groupBy(*KEYS)
            .agg(F.countDistinct("user_id").alias("x"))
            .collect()
        }
        for r in fin.collect():
            err = abs(r["distinct_user_id"] - exact[r["event_type"]])
            assert err <= max(3, 0.05 * exact[r["event_type"]])

        print(
            f"PHASE A TOTAL over {len(delta_paths)} days: incremental "
            f"{incr_total:.2f}s, nightly-recompute {recompute_total:.2f}s "
            f"({recompute_total / incr_total:.2f}x); state is "
            f"{len(state_rows)} rows. Fold == recompute verified."
        )

    rows_per_day = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    n_days = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    phase_b(spark, rows_per_day, n_days)


def phase_b(spark, rows_per_day: int, n_days: int) -> None:
    """Steady-state cost at a history/delta ratio that matters."""
    with tempfile.TemporaryDirectory() as tmp:
        paths = []
        for day in range(n_days):
            p = f"{tmp}/day={day}"
            (
                spark.range(rows_per_day)
                .select(
                    (F.col("id") + day * rows_per_day).alias("event_id"),
                    F.concat(
                        F.lit("t"), (F.col("id") % 5).cast("string")
                    ).alias("event_type"),
                    (F.xxhash64("id", F.lit(day)) % 1_000_000).alias(
                        "user_id"
                    ),
                    (
                        (F.xxhash64("id", F.lit(day), F.lit(1)) % 100_000)
                        / 100.0
                    ).alias("value"),
                )
                .write.parquet(p)
            )
            paths.append(p)
        spark.read.parquet(paths[0]).count()  # warm

        spec = dict(sums=["value"], distincts=["user_id"])
        state = None
        last_incr = last_re = 0.0
        for i, p in enumerate(paths):
            t0 = time.perf_counter()
            state = maintain_state(
                state, spark.read.parquet(p), KEYS, **spec
            )
            rows = state.collect()
            state = spark.createDataFrame(rows, state.schema)
            last_incr = time.perf_counter() - t0

            t0 = time.perf_counter()
            spark.read.parquet(*paths[: i + 1]).groupBy(*KEYS).agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("value").cast("decimal(38,6)")).alias("s"),
                F.approx_count_distinct("user_id").alias("du"),
            ).collect()
            last_re = time.perf_counter() - t0
        scans_re = rows_per_day * n_days * (n_days + 1) // 2
        scans_incr = rows_per_day * n_days
        print(
            f"PHASE B ({rows_per_day:,} rows/day x {n_days} days): "
            f"DAY-{n_days} steady state: incremental {last_incr:.2f}s vs "
            f"recompute {last_re:.2f}s ({last_re / last_incr:.2f}x); "
            f"cumulative row-scans {scans_incr:,} vs {scans_re:,} "
            f"({scans_re / scans_incr:.1f}x) — the recompute line grows "
            f"with history length, the incremental line does not."
        )


if __name__ == "__main__":
    main()
