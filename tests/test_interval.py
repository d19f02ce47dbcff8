"""Temporal proximity join (operators.interval) vs brute-force ground truth.

The bucketed equi-join must reproduce exactly the pairs a nested-loop
``0 < t_b - t_a <= gap`` scan finds — including pairs that straddle a cell
boundary and pairs exactly at the gap bound (inclusive upper, strict lower)."""

from __future__ import annotations

import datetime as dt
import itertools
import random

from ubparquet_spark.operators.interval import event_pairs_within

GAP_S = 600


def _synthetic_events():
    rng = random.Random(42)
    t0 = dt.datetime(2024, 3, 1, 0, 0, 0)
    rows = []
    eid = 0
    for user in range(5):
        t = t0
        for _ in range(40):
            t += dt.timedelta(seconds=rng.randint(1, 900))
            rows.append((eid, user, t))
            eid += 1
    # edge cases: identical ts (excluded), exactly gap apart (included),
    # one microsecond over the gap (excluded), across a cell boundary
    base = dt.datetime(2024, 3, 2, 0, 0, 0)
    rows += [
        (9001, 9, base),
        (9002, 9, base),  # same instant -> not a pair
        (9003, 9, base + dt.timedelta(seconds=GAP_S)),  # == gap -> pair
        (9004, 9, base + dt.timedelta(seconds=2 * GAP_S, microseconds=1)),
        (9005, 8, base + dt.timedelta(seconds=1)),  # other user: never pairs
    ]
    return rows


def _brute_force(rows):
    expected = set()
    for (ia, ua, ta), (ib, ub, tb) in itertools.permutations(rows, 2):
        if ua != ub or ia == ib:
            continue
        if tb > ta and (tb - ta) <= dt.timedelta(seconds=GAP_S):
            expected.add((ua, ia, ib, int((tb - ta) / dt.timedelta(microseconds=1))))
    return expected


def test_event_pairs_matches_bruteforce(spark):
    rows = _synthetic_events()
    df = spark.createDataFrame(
        [(e, u, t) for e, u, t in rows], "event_id long, user_id long, ts timestamp"
    )
    got = {
        (r.user_id, r.event_id_a, r.event_id_b, r.gap_us)
        for r in event_pairs_within(
            df, ts_col="ts", id_col="event_id", keys=["user_id"],
            max_gap_seconds=GAP_S,
        ).collect()
    }
    assert got == _brute_force(rows)


def test_edge_semantics(spark):
    base = dt.datetime(2024, 3, 2, 0, 0, 0)
    df = spark.createDataFrame(
        [
            (1, 9, base),
            (2, 9, base),
            (3, 9, base + dt.timedelta(seconds=GAP_S)),
            (4, 9, base + dt.timedelta(seconds=GAP_S, microseconds=1)),
        ],
        "event_id long, user_id long, ts timestamp",
    )
    got = {
        (r.event_id_a, r.event_id_b)
        for r in event_pairs_within(
            df, ts_col="ts", id_col="event_id", keys=["user_id"],
            max_gap_seconds=GAP_S,
        ).collect()
    }
    # same-instant rows never pair (strict lower bound); the gap bound is
    # inclusive; one microsecond past the bound is out
    assert got == {(1, 3), (2, 3), (3, 4)}


def test_interval_overlap_self_join_matches_bruteforce(spark):
    """Property: the cell-bucketed overlap join finds EXACTLY the pairs a
    brute-force O(n²) reference finds, with identical exact overlaps —
    across random interval sets whose lengths straddle the cell width."""
    import random

    from ubparquet_spark.operators.interval import interval_overlap_self_join

    rng = random.Random(17)
    CELL = 1000  # small cell so intervals span 0..several cells
    for trial in range(4):
        rows = []
        for i in range(40):
            s = rng.randrange(0, 20_000)
            e = s + rng.randrange(1, 3_500)  # up to 3.5 cells long
            rows.append((i, s, e))
        df = spark.createDataFrame(rows, "iid long, s_us long, e_us long")
        got = {
            (r["a_iid"], r["b_iid"]): r["overlap_us"]
            for r in interval_overlap_self_join(
                df, id_cols=["iid"], cell_us=CELL
            ).collect()
        }
        want = {}
        for i, s1, e1 in rows:
            for j, s2, e2 in rows:
                if i < j:
                    ov = min(e1, e2) - max(s1, s2)
                    if ov > 0:
                        want[(i, j)] = ov
        assert got == want, f"trial {trial}"
