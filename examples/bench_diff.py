"""Diff two BENCHFULL artifacts: per-query movers, adds/drops, totals.

The bench harness writes a complete per-query JSON each run
(`BENCHFULL_latest.json`; frozen per round as `BENCHFULL_r{N}.json`), so
round-over-round regressions are diffable without scraping prose:

    python examples/bench_diff.py BENCHFULL_r05.json BENCHFULL_r06.json
    python examples/bench_diff.py old.json new.json --threshold 1.2

Prints queries whose time moved by more than ``--threshold`` (ratio,
default 1.3) in either direction with absolute times, plus registry
adds/drops and the total. Host drift is separated automatically
(round 7): the MEDIAN per-query ratio over the common set estimates
uniform host-speed drift (robust to the minority of structural
movers), and each mover is reported with BOTH its raw ratio and its
drift-normalized ratio — a query whose normalized ratio is ~1.0 moved
with the host, not structurally. Exit code 0 always — this is a
report, not a gate (the shuffle-budget and oracle suites are the
gates).
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
    common = sorted(set(oq) & set(nq))
    ratios = sorted(nq[n] / oq[n] for n in common if oq[n] > 0)
    drift = 1.0
    if ratios:
        mid = len(ratios) // 2
        drift = (
            ratios[mid]
            if len(ratios) % 2
            else (ratios[mid - 1] + ratios[mid]) / 2
        )
        print(
            f"host drift (median common-query ratio): {drift:.2f}x — "
            "mover ratios below are shown raw and drift-normalized"
        )
    added = sorted(set(nq) - set(oq))
    dropped = sorted(set(oq) - set(nq))
    if added:
        print("added:", ", ".join(f"{n} ({nq[n]:.2f}s)" for n in added))
    if dropped:
        print("dropped:", ", ".join(f"{n} ({oq[n]:.2f}s)" for n in dropped))
    movers = []
    for name in common:
        a, b = oq[name], nq[name]
        if max(a, b) < args.min_sec or min(a, b) <= 0:
            continue
        norm = (b / a) / drift
        if norm >= args.threshold or norm <= 1 / args.threshold:
            movers.append((norm, name, a, b))
    for norm, name, a, b in sorted(movers, key=lambda m: -m[0]):
        arrow = "SLOWER" if norm > 1 else "faster"
        print(
            f"  {name:32s} {a:7.2f}s -> {b:7.2f}s  "
            f"{b / a:5.2f}x raw, {norm:5.2f}x normalized {arrow}"
        )
    if not movers:
        print(
            f"  no drift-normalized movers past {args.threshold}x "
            f"(min {args.min_sec}s)"
        )


if __name__ == "__main__":
    main()
