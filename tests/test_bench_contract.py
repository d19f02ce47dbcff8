"""Pins bench.py's timing invariant (round 12, VERDICT r11 #9).

The bench times ``fn(spark, sf_dir).collect()`` — query construction AND
the action — inside one ``perf_counter`` window. Several query builders
run bounded size-dispatch collects at construction time (dedup CC tails,
brand-graph tails, k-means init): that is real corpus work, and the
measurement is only honest while it stays inside the clock. A refactor
that hoists construction out of the timed region (e.g. pre-building all
plans before the rep loop) would silently convert the dispatch pattern
into untimed precomputation. This test fails loudly if the timed region
ever stops covering the construction call.
"""

from __future__ import annotations

import ast
import os


def _bench_rep_loop() -> list[ast.stmt]:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "bench.py")) as f:
        tree = ast.parse(f.read())
    # the innermost `for _ in range(reps)` loop of main()
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.For)
            and isinstance(node.iter, ast.Call)
            and getattr(node.iter.func, "id", None) == "range"
            and getattr(node.iter.args[0], "id", None) == "reps"
        ):
            return node.body
    raise AssertionError("bench.py rep loop not found — update this test")


def _src(stmt: ast.stmt) -> str:
    return ast.unparse(stmt)


def test_construction_is_inside_the_timed_region():
    body = [_src(s) for s in _bench_rep_loop()]
    t0_idx = next(
        i for i, s in enumerate(body) if "perf_counter()" in s and s.startswith("t0")
    )
    call_idx = next(i for i, s in enumerate(body) if "fn(spark, sf_dir)" in s)
    dt_idx = next(
        i for i, s in enumerate(body) if "perf_counter() - t0" in s
    )
    # construction (the fn(...) call that builds the plan, including any
    # bounded dispatch collects) must sit strictly between the two clock
    # reads, and the action must be part of the same statement
    assert t0_idx < call_idx < dt_idx, body
    assert ".collect()" in body[call_idx], body[call_idx]


def test_rep_loop_has_no_precomputed_plan():
    # no statement before the clock in the rep loop may call fn(...): the
    # plan must be rebuilt inside the timed window on every rep
    body = [_src(s) for s in _bench_rep_loop()]
    t0_idx = next(
        i for i, s in enumerate(body) if "perf_counter()" in s and s.startswith("t0")
    )
    assert not any("fn(" in s for s in body[:t0_idx]), body[:t0_idx]
