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

Usage: python examples/incremental_maintenance.py [sf_dir]
Defaults $SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1. Results land in
BENCHNOTES.md's round-8 section.
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

        fin = finalize_state(state)
        direct = finalize_state(agg_state(ev, KEYS, **SPEC))
        key = lambda df: sorted(map(str, df.collect()))
        assert key(fin) == key(direct), "state fold != recompute"

        print(
            f"TOTAL over {len(delta_paths)} days: incremental "
            f"{incr_total:.2f}s, nightly-recompute {recompute_total:.2f}s "
            f"({recompute_total / incr_total:.2f}x); state is "
            f"{len(state_rows)} rows. Fold == recompute verified."
        )


if __name__ == "__main__":
    main()
