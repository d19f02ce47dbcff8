"""Round-11 per-query measurement harness (guide §1).

For each requested query at $SPARK_GRAFT_SF_DIR (default sf0.1):
  - warm once at sf0.001 (same as bench.py),
  - run REPS timed reps with the same action as bench.py (collect),
  - record best/median wall seconds AND the number of Spark jobs the
    query launches (statusTracker job-id delta — driver round-trips are
    the dominant cost at local scale),
  - optionally dump .explain("formatted") to plans/r12/<q>_<tag>.txt.

Usage:
  python tools/measure_r12.py q_semantic_dedup q_profile_lineitem
  python tools/measure_r12.py --explain-tag before --all-above 1.0
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", help="query names to measure")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--explain-tag",
        default=None,
        help="write plans/r12/<q>_<tag>.txt with explain('formatted')",
    )
    ap.add_argument(
        "--all-above",
        type=float,
        default=None,
        help="measure every query whose BENCHFULL_latest time >= this",
    )
    ap.add_argument("--out", default=None, help="write JSON results here")
    args = ap.parse_args()

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, here)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from ubparquet_spark.session import get_session

    spark = get_session("measure-r12")
    sc = spark.sparkContext

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()

    names = list(args.queries)
    if args.all_above is not None:
        with open(os.path.join(here, "BENCHFULL_latest.json")) as f:
            base = json.load(f)["queries"]
        names += [
            q
            for q, v in sorted(base.items(), key=lambda kv: -kv[1])
            if v >= args.all_above and q not in names
        ]
    if not names:
        ap.error("no queries selected")

    warm_dir = "/root/testdata/sf0.001"
    results: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        try:
            fn(spark, warm_dir).collect()
        except Exception:
            pass
        times: list[float] = []
        jobs = 0
        rows = 0
        for rep in range(args.reps):
            sc.setJobDescription(f"{name} rep{rep}")
            jobs_before = len(sc.statusTracker().getJobIdsForGroup(None))
            t0 = time.perf_counter()
            rows = len(fn(spark, sf_dir).collect())
            times.append(time.perf_counter() - t0)
            jobs = len(sc.statusTracker().getJobIdsForGroup(None)) - jobs_before
        sc.setJobDescription(None)
        times.sort()
        results[name] = {
            "best": round(times[0], 3),
            "median": round(times[len(times) // 2], 3),
            "all": [round(t, 3) for t in times],
            "jobs": jobs,
            "rows": rows,
        }
        print(
            f"{name}: best={times[0]:.3f}s med={times[len(times)//2]:.3f}s "
            f"jobs={jobs} rows={rows}",
            flush=True,
        )
        if args.explain_tag:
            import io
            from contextlib import redirect_stdout

            os.makedirs(os.path.join(here, "plans", "r12"), exist_ok=True)
            p = os.path.join(
                here, "plans", "r12", f"{name}_{args.explain_tag}.txt"
            )
            buf = io.StringIO()
            with redirect_stdout(buf):
                fn(spark, sf_dir).explain("formatted")
            with open(p, "w") as f:
                f.write(buf.getvalue())
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
    print(json.dumps({k: v["best"] for k, v in results.items()}))


if __name__ == "__main__":
    main()
