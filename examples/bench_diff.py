"""Diff two BENCHFULL artifacts: per-query movers, adds/drops, totals.

The bench harness writes a complete per-query JSON each run
(`BENCHFULL_latest.json`; frozen per round as `BENCHFULL_r{N}.json`), so
round-over-round regressions are diffable without scraping prose:

    python examples/bench_diff.py BENCHFULL_r05.json BENCHFULL_r06.json
    python examples/bench_diff.py old.json new.json --threshold 1.2

Prints queries whose time moved by more than ``--threshold`` (ratio,
default 1.3) in either direction with absolute times, plus registry
adds/drops and the total. Exit code 0 always — this is a report, not a
gate (the shuffle-budget and oracle suites are the gates).
"""

from __future__ import annotations

import argparse
import json
import signal

# die silently when piped into `head` instead of a BrokenPipeError trace
signal.signal(signal.SIGPIPE, signal.SIG_DFL)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.3)
    ap.add_argument(
        "--min-sec",
        type=float,
        default=0.3,
        help="ignore movers whose larger side is below this (scheduler noise)",
    )
    args = ap.parse_args()
    old = json.load(open(args.old))
    new = json.load(open(args.new))
    oq, nq = old["queries"], new["queries"]
    print(
        f"total: {old['value']:.1f}s ({len(oq)} queries) -> "
        f"{new['value']:.1f}s ({len(nq)} queries)"
    )
    added = sorted(set(nq) - set(oq))
    dropped = sorted(set(oq) - set(nq))
    if added:
        print("added:", ", ".join(f"{n} ({nq[n]:.2f}s)" for n in added))
    if dropped:
        print("dropped:", ", ".join(f"{n} ({oq[n]:.2f}s)" for n in dropped))
    movers = []
    for name in sorted(set(oq) & set(nq)):
        a, b = oq[name], nq[name]
        if max(a, b) < args.min_sec or min(a, b) <= 0:
            continue
        ratio = b / a
        if ratio >= args.threshold or ratio <= 1 / args.threshold:
            movers.append((ratio, name, a, b))
    for ratio, name, a, b in sorted(movers, key=lambda m: -m[0]):
        arrow = "SLOWER" if ratio > 1 else "faster"
        print(f"  {name:32s} {a:7.2f}s -> {b:7.2f}s  {ratio:5.2f}x {arrow}")
    if not movers:
        print(f"  no movers past {args.threshold}x (min {args.min_sec}s)")


if __name__ == "__main__":
    main()
