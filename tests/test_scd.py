"""operators/scd.collapse_runs — gaps-and-islands run compaction."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from ubparquet_spark.operators.scd import collapse_runs


def _ts(h):
    return dt.datetime(2024, 1, 1, h, 0, 0)


def _build(spark, rows):
    return spark.createDataFrame(
        rows, "user_id bigint, ts timestamp_ntz, event_id bigint, state string"
    )


def test_collapse_runs_golden(spark):
    rows = [
        # user 1: A A B A  -> runs A(2), B(1), A(1)
        (1, _ts(1), 10, "A"),
        (1, _ts(2), 11, "A"),
        (1, _ts(3), 12, "B"),
        (1, _ts(4), 13, "A"),
        # user 2: single observation -> one current run
        (2, _ts(5), 20, "C"),
    ]
    out = collapse_runs(
        _build(spark, rows), ["user_id"], ["ts", "event_id"], "state"
    )
    got = sorted(
        (
            (r.user_id, r.state, r.valid_from, r.valid_to, r.run_len, r.is_current)
            for r in out.collect()
        )
    )
    assert got == [
        (1, "A", _ts(1), _ts(3), 2, False),
        (1, "A", _ts(4), None, 1, True),
        (1, "B", _ts(3), _ts(4), 1, False),
        (2, "C", _ts(5), None, 1, True),
    ]


def test_collapse_runs_half_open_ranges_cover_history(spark):
    """Each non-final run's valid_to equals the next run's valid_from, and
    exactly one run per entity is current."""
    rows = [
        (1, _ts(i), 100 + i, s)
        for i, s in enumerate(["A", "B", "B", "C", "C", "C", "A"], start=1)
    ]
    out = collapse_runs(
        _build(spark, rows), ["user_id"], ["ts", "event_id"], "state"
    ).orderBy("valid_from")
    runs = out.collect()
    assert sum(r.is_current for r in runs) == 1
    for prev, nxt in zip(runs, runs[1:]):
        assert prev.valid_to == nxt.valid_from
    assert runs[-1].valid_to is None
    assert sum(r.run_len for r in runs) == len(rows)


def test_collapse_runs_null_state_is_a_run(spark):
    """Null states form runs like any other value (null-safe comparison),
    and a null->value flip breaks the run."""
    rows = [
        (1, _ts(1), 1, None),
        (1, _ts(2), 2, None),
        (1, _ts(3), 3, "A"),
    ]
    out = collapse_runs(
        _build(spark, rows), ["user_id"], ["ts", "event_id"], "state"
    )
    got = sorted(
        ((r.state, r.run_len, r.is_current) for r in out.collect()),
        key=lambda t: (t[0] is not None, t),
    )
    assert got == [(None, 2, False), ("A", 1, True)]


def test_collapse_runs_tie_break_on_row_key(spark):
    """Equal timestamps are ordered by the tie-break column, so the run
    structure is deterministic."""
    rows = [
        (1, _ts(1), 2, "B"),
        (1, _ts(1), 1, "A"),  # same ts — event_id orders A before B
        (1, _ts(2), 3, "B"),
    ]
    out = collapse_runs(
        _build(spark, rows), ["user_id"], ["ts", "event_id"], "state"
    )
    states = [r.state for r in out.orderBy("valid_from", "state").collect()]
    # A(1) then B(2): the two B rows are consecutive under the total order
    lens = {r.state: r.run_len for r in out.collect()}
    assert states == ["A", "B"] and lens == {"A": 1, "B": 2}


def test_collapse_runs_no_low_cardinality_window(spark):
    """All window partitions key on the entity id — never on the state
    column alone (the low-cardinality scale defect)."""
    df = _build(spark, [(1, _ts(1), 1, "A")])
    plan = collapse_runs(
        df, ["user_id"], ["ts", "event_id"], "state"
    )._jdf.queryExecution().optimizedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "user_id" in line


# -- property: collapse_runs equals a brute-force single-pass compaction --

from hypothesis import given, settings
from hypothesis import strategies as st


def _brute_runs(seq):
    """Reference implementation: one linear pass over the ordered states."""
    runs = []
    for i, s in enumerate(seq):
        if runs and runs[-1][0] == s:
            runs[-1][2] += 1
        else:
            runs.append([s, i, 1])  # state, first index, length
    out = []
    for j, (s, first, ln) in enumerate(runs):
        nxt = runs[j + 1][1] if j + 1 < len(runs) else None
        out.append((s, first, nxt, ln, nxt is None))
    return out


@given(
    seq=st.lists(st.sampled_from(["A", "B", "C"]), min_size=1, max_size=40),
    seed=st.integers(0, 2**32 - 1),
)
@settings(max_examples=25, deadline=None)
def test_collapse_runs_matches_bruteforce(spark, seq, seed):
    rows = [(1, _ts(1) + dt.timedelta(minutes=i), i, s) for i, s in enumerate(seq)]
    out = collapse_runs(
        _build(spark, rows), ["user_id"], ["ts", "event_id"], "state"
    ).collect()
    got = sorted(
        (
            r.state,
            int((r.valid_from - _ts(1)).total_seconds() // 60),
            None
            if r.valid_to is None
            else int((r.valid_to - _ts(1)).total_seconds() // 60),
            r.run_len,
            r.is_current,
        )
        for r in out
    )
    assert got == sorted(_brute_runs(seq))
