"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no streaming state (SURVEY.md §2.8); this is the
extension-surface pattern for operators that windowed aggregation can't
express: arbitrary per-key state machines (running totals with custom
logic, cross-batch counters, decaying scores).

``running_user_stats`` keeps one state tuple per user — (n_events,
sum_value_cents, max_value) — updated per micro-batch, emitting the running
totals after each batch. State is keyed and partitioned by user: memory per
executor is bounded by (users in its partitions) × a few longs, and state
ages out via the GroupStateTimeout if configured.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n_events long, sum_cents long, max_value double"
OUTPUT_SCHEMA = "user_id long, n_events long, sum_value double, max_value double"


def _update_user_stats(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, sum_cents, max_v = state.get
    else:
        n, sum_cents, max_v = 0, 0, float("-inf")
    for pdf in pdfs:
        n += len(pdf)
        # floor(x*100 + 0.5): match the engine's batch money convention
        # (cents() in plans/tpch.py, half-up) — numpy .round() is half-even
        # and would drift 1 cent per .xx5 tie from batch equivalents
        sum_cents += int(np.floor(pdf["value"].to_numpy() * 100 + 0.5).sum())
        if len(pdf):
            max_v = max(max_v, float(pdf["value"].max()))
    state.update((n, sum_cents, max_v))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value": [sum_cents / 100.0],
            "max_value": [max_v],
        }
    )


def running_user_stats(stream: DataFrame) -> DataFrame:
    """Per-user running (count, exact sum, max) across micro-batches."""
    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_stats,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming TWAP: the stateful twin of plans/events.q_twap. Per event
# type, state carries (last_us, last_vc, weighted_sum, total_dur) — the
# last observation plus the running LOCF integral in EXACT integer units
# (cents × microseconds fits int; Python ints are unbounded, and the
# state column is stored as DECIMAL-free strings of bounded longs via two
# longs: ws_hi/ws_lo would be overkill — a float64 of cents·seconds loses
# exactness past 2^53, so weighted work is kept in integer MICROcent-
# seconds split across two longs).
#
# Ordering contract: rows WITHIN a micro-batch are sorted here; ACROSS
# batches the source must deliver time-ordered files (the normal
# append-only ingest layout) — same contract as any LOCF streaming
# operator. Defensive departures from that contract are handled, not
# crashed on: LATE rows (us < carried us) are skipped and counted in
# state; an equal-timestamp row arriving in a later batch only replaces
# the carried value when its event_id is higher (matching the batch
# twin's (us, event_id) total order — duration contribution at a tie is
# zero either way). Emitted value per batch: running TWAP so far; a key
# with zero accumulated duration (single event, or all events at one
# microsecond) emits NOTHING, matching the batch query which drops such
# groups — 0.0 would be a plausible-but-fabricated TWAP.
# ---------------------------------------------------------------------------

TWAP_STATE_SCHEMA = (
    "last_us long, last_vc long, last_eid long, ws_hi long, ws_lo long,"
    " total_dur long, n_segments long, n_late long"
)
TWAP_OUTPUT_SCHEMA = (
    "event_type string, n_segments long, span_s double, twap double"
)
_WS_BASE = 10**18  # split base: weighted sums as hi*BASE + lo, exact in ints


def _update_twap(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        last_us, last_vc, last_eid, ws_hi, ws_lo, total_dur, n_seg, n_late = (
            state.get
        )
        ws = ws_hi * _WS_BASE + ws_lo
        have_last = True
    else:
        last_us, last_vc, last_eid, ws, total_dur, n_seg, n_late = (
            0, 0, 0, 0, 0, 0, 0
        )
        have_last = False
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["us", "event_id"], ignore_index=True)
    us = rows["us"].to_numpy()
    vc = rows["vc"].to_numpy()
    eid = rows["event_id"].to_numpy()
    for j in range(len(rows)):
        u, v, e = int(us[j]), int(vc[j]), int(eid[j])
        if not have_last:
            last_us, last_vc, last_eid, have_last = u, v, e, True
            continue
        if u < last_us:
            n_late += 1  # contract violation: skip, don't corrupt the integral
            continue
        if u == last_us:
            # zero-duration tie: batch total order (us, event_id) carries
            # the HIGHEST event_id's value forward
            if e > last_eid:
                last_vc, last_eid = v, e
            continue
        dur = u - last_us
        ws += last_vc * dur
        total_dur += dur
        n_seg += 1
        last_us, last_vc, last_eid = u, v, e
    state.update(
        (last_us, last_vc, last_eid, ws // _WS_BASE, ws % _WS_BASE,
         total_dur, n_seg, n_late)
    )
    if total_dur > 0:
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_segments": [n_seg],
                "span_s": [total_dur / 1e6],
                "twap": [ws / total_dur / 100.0],
            }
        )
    else:
        yield pd.DataFrame(
            {"event_type": [], "n_segments": [], "span_s": [], "twap": []}
        )


def running_twap(stream: DataFrame) -> DataFrame:
    """Per-event-type running time-weighted average value."""
    from pyspark.sql import functions as F

    prepared = stream.select(
        "event_type",
        F.expr("timestampdiff(MICROSECOND, to_timestamp_ntz('1970-01-01 00:00:00'), ts)").alias("us"),
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("vc"),
        "event_id",
    ).filter(
        # a null ts/value would arrive as NaN in the Arrow batch and crash
        # the int conversion; the batch twin (plans/events.q_twap) filters
        # null us/vc before its lead window with the same LOCF semantics —
        # an unobserved sample neither starts a segment nor advances the
        # span — so batch and stream stay value-equal on null-bearing input
        F.col("us").isNotNull() & F.col("vc").isNotNull()
    )
    return prepared.groupBy("event_type").applyInPandasWithState(
        _update_twap,
        outputStructType=TWAP_OUTPUT_SCHEMA,
        stateStructType=TWAP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming event-type transitions: the stateful twin of
# plans/events.q_event_transitions. State per user is just the last
# observation (us, event_id, event_type); each micro-batch emits the
# (prev_type, next_type) INCREMENTS observed in that batch — including
# the one bridging the batch boundary via state — so summing every
# emitted row over the drained stream reproduces the batch transition
# counts exactly (asserted in tests/test_streaming_stateful.py). The
# same in-order contract as running_twap: a row older than the state's
# last observation is counted late and skipped rather than corrupting
# the sequence.
#
# Non-null event_type PRECONDITION: rows with a null event_type are
# dropped at the stream edge, while the batch twin keeps nulls as
# ordinary sequence members (it only drops the pair whose PREV is null)
# — so the tested stream≡batch equivalence holds on null-free
# event_type input. Feed both sides a null-filtered stream to compare
# them on null-bearing data.
# ---------------------------------------------------------------------------

TRANS_STATE_SCHEMA = "last_us long, last_eid long, last_type string, n_late long"
TRANS_OUTPUT_SCHEMA = (
    "user_id long, prev_type string, next_type string, n long"
)


def _update_transitions(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        last_us, last_eid, last_type, n_late = state.get
        have_last = last_type is not None
    else:
        last_us, last_eid, last_type, n_late = 0, 0, None, 0
        have_last = False
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["us", "event_id"], ignore_index=True)
    us = rows["us"].to_numpy()
    eid = rows["event_id"].to_numpy()
    types = rows["event_type"].to_numpy()
    inc: dict[tuple[str, str], int] = {}
    for j in range(len(rows)):
        u, e, t = int(us[j]), int(eid[j]), str(types[j])
        if not have_last:
            last_us, last_eid, last_type, have_last = u, e, t, True
            continue
        if (u, e) < (last_us, last_eid):
            n_late += 1
            continue
        pair = (last_type, t)
        inc[pair] = inc.get(pair, 0) + 1
        last_us, last_eid, last_type = u, e, t
    state.update((last_us, last_eid, last_type, n_late))
    if inc:
        pairs = sorted(inc)
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(pairs),
                "prev_type": [p for p, _ in pairs],
                "next_type": [n for _, n in pairs],
                "n": [inc[p] for p in pairs],
            }
        )
    else:
        yield pd.DataFrame(
            {"user_id": [], "prev_type": [], "next_type": [], "n": []}
        )


def running_transitions(stream: DataFrame) -> DataFrame:
    """Per-user (prev_type, next_type) transition increments per batch."""
    from pyspark.sql import functions as F

    prepared = stream.select(
        "user_id",
        F.expr(
            "timestampdiff(MICROSECOND, to_timestamp_ntz('1970-01-01 00:00:00'), ts)"
        ).alias("us"),
        "event_id",
        "event_type",
    ).filter(F.col("us").isNotNull() & F.col("event_type").isNotNull())
    return prepared.groupBy("user_id").applyInPandasWithState(
        _update_transitions,
        outputStructType=TRANS_OUTPUT_SCHEMA,
        stateStructType=TRANS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming source-mix counters: the stateful twin of the batch
# plans/text.q_mixture_weights per-source aggregate. State per source is
# the cumulative (n_docs, n_tokens); each micro-batch emits the UPDATED
# counters, so the LAST emission per source over the drained stream
# equals the batch per-source aggregate exactly (asserted in
# tests/test_streaming_stateful.py) — a foreachBatch consumer can
# recompute the temperature-scaled weights from the ≤|sources|-row
# update at any point mid-ingest. Counter semantics mirror the batch
# plan: every row counts toward n_docs; a null token count (null text)
# contributes nothing to n_tokens, exactly like the batch SUM.
# ---------------------------------------------------------------------------

MIX_STATE_SCHEMA = "n_docs long, n_tokens long"
MIX_OUTPUT_SCHEMA = "source string, n_docs long, n_tokens long"


def _update_source_mix(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n_docs, n_tokens = state.get
    else:
        n_docs, n_tokens = 0, 0
    rows = pd.concat(list(pdfs), ignore_index=True)
    n_docs += len(rows)
    n_tokens += int(rows["nt"].dropna().sum())
    state.update((n_docs, n_tokens))
    yield pd.DataFrame(
        {"source": [key[0]], "n_docs": [n_docs], "n_tokens": [n_tokens]}
    )


def running_source_mix(stream: DataFrame) -> DataFrame:
    """Cumulative (n_docs, n_tokens) per source, emitted per batch."""
    from pyspark.sql import functions as F

    prepared = stream.select(
        "source", F.size(F.split("text", " ")).alias("nt")
    ).filter(F.col("source").isNotNull())
    return prepared.groupBy("source").applyInPandasWithState(
        _update_source_mix,
        outputStructType=MIX_OUTPUT_SCHEMA,
        stateStructType=MIX_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming SCD-type-2 run compaction: the stateful twin of the batch
# operators/scd.collapse_runs (q_user_state_history). State per user is the
# OPEN run — (run_id, state, valid_from, run_len) plus the last-seen
# (us, event_id) ordering cursor. Each batch closes runs at every state
# flip (emitting them with valid_to = the next run's valid_from, the batch
# half-open convention) and re-emits the updated open run, so in update
# mode the LAST emission per (user, run_id) over a drained, time-ordered
# stream equals the batch history table exactly (asserted in
# tests/test_streaming_stateful.py). Cross-batch contract mirrors
# running_twap: files must arrive time-ordered per user; late rows are
# counted into state and skipped, never silently reordered.
#
# Non-null event_type PRECONDITION (same as running_transitions): the
# stream edge drops null event_type rows, while the batch twin's
# eqNullSafe flip detection keeps null states as real runs — the tested
# stream≡batch equivalence therefore assumes null-free event_type input;
# null-filter the batch side too when comparing on null-bearing data.
# ---------------------------------------------------------------------------

SCD_STATE_SCHEMA = (
    "run_id long, run_state string, from_us long, run_len long,"
    " last_us long, last_eid long, n_late long"
)
SCD_OUTPUT_SCHEMA = (
    "user_id long, run_id long, state string, from_us long, to_us long,"
    " run_len long, is_current boolean"
)


def _update_state_history(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        run_id, run_state, from_us, run_len, last_us, last_eid, n_late = state.get
    else:
        run_id, run_state, from_us, run_len = 0, None, 0, 0
        last_us, last_eid, n_late = 0, 0, 0
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["us", "event_id"], ignore_index=True)
    us = rows["us"].to_numpy()
    eid = rows["event_id"].to_numpy()
    types = rows["event_type"].to_numpy()
    out: list[tuple] = []
    for j in range(len(rows)):
        u, e, t = int(us[j]), int(eid[j]), str(types[j])
        if run_id == 0:
            run_id, run_state, from_us, run_len = 1, t, u, 1
            last_us, last_eid = u, e
            continue
        if (u, e) < (last_us, last_eid):
            n_late += 1
            continue
        if t == run_state:
            run_len += 1
        else:
            out.append((run_id, run_state, from_us, u, run_len, False))
            run_id, run_state, from_us, run_len = run_id + 1, t, u, 1
        last_us, last_eid = u, e
    state.update(
        (run_id, run_state, from_us, run_len, last_us, last_eid, n_late)
    )
    # the open run is re-emitted every batch; update-mode consumers keep
    # the latest row per (user, run_id)
    if run_id > 0:
        out.append((run_id, run_state, from_us, None, run_len, True))
    yield pd.DataFrame(
        {
            "user_id": [key[0]] * len(out),
            "run_id": [r[0] for r in out],
            "state": [r[1] for r in out],
            "from_us": [r[2] for r in out],
            "to_us": [r[3] for r in out],
            "run_len": [r[4] for r in out],
            "is_current": [r[5] for r in out],
        }
    )


def running_state_history(stream: DataFrame) -> DataFrame:
    """Per-user SCD2 run table maintained across micro-batches."""
    from pyspark.sql import functions as F

    prepared = stream.select(
        "user_id",
        F.expr(
            "timestampdiff(MICROSECOND, to_timestamp_ntz('1970-01-01 00:00:00'), ts)"
        ).alias("us"),
        "event_id",
        "event_type",
    ).filter(F.col("us").isNotNull() & F.col("event_type").isNotNull())
    return prepared.groupBy("user_id").applyInPandasWithState(
        _update_state_history,
        outputStructType=SCD_OUTPUT_SCHEMA,
        stateStructType=SCD_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming daily EWMA: the stateful twin of plans/events.q_ewma_daily
# (round 9). State per event_type is the OPEN day's (day, cents-so-far)
# plus the rounded EWMA over CLOSED days; a day closes when a row from a
# later day arrives, and closing emits exactly the (day, rev, ewma) row
# the batch plan produces — the same floor(x·1e6+0.5)/1e6 rounding at
# every recursion step, so stream and batch are BIT-equal on closed days
# (asserted in tests/test_streaming_stateful.py). Same in-order contract
# as running_twap: a row from an already-closed day is counted late and
# skipped rather than retro-editing an emitted EWMA. The still-open final
# day is intentionally unemitted (its daily sum isn't final until a later
# day proves it complete — emit-on-close is the watermarkless analogue of
# a day watermark).
# ---------------------------------------------------------------------------

EWMA_STATE_SCHEMA = (
    "open_day_us long, open_rc long, have_ewma boolean, ewma double,"
    " n_late long"
)
EWMA_OUTPUT_SCHEMA = (
    "event_type string, day timestamp_ntz, rev double, ewma double"
)
_EWMA_ALPHA = 0.25  # keep in lockstep with plans/events.EWMA_ALPHA


def _update_ewma(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        open_day, open_rc, have_ewma, ewma, n_late = state.get
        have_open = True
    else:
        open_day, open_rc, have_ewma, ewma, n_late = 0, 0, False, 0.0, 0
        have_open = False
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["day_us"], ignore_index=True)
    day_us = rows["day_us"].to_numpy()
    vc = rows["vc"].to_numpy()
    out_day, out_rev, out_ewma = [], [], []

    def close(day: int, rc: int) -> None:
        nonlocal have_ewma, ewma
        x = rc / 100.0
        nxt = x if not have_ewma else _EWMA_ALPHA * x + (1 - _EWMA_ALPHA) * ewma
        ewma = np.floor(nxt * 1000000.0 + 0.5) / 1000000.0
        have_ewma = True
        out_day.append(day)
        out_rev.append(x)
        out_ewma.append(ewma)

    for j in range(len(rows)):
        d, v = int(day_us[j]), int(vc[j])
        if not have_open:
            open_day, open_rc, have_open = d, v, True
            continue
        if d < open_day:
            n_late += 1
            continue
        if d == open_day:
            open_rc += v
            continue
        close(open_day, open_rc)
        open_day, open_rc = d, v
    state.update((open_day, open_rc, have_ewma, float(ewma), n_late))
    yield pd.DataFrame(
        {
            "event_type": [key[0]] * len(out_day),
            "day": pd.to_datetime(pd.Series(out_day, dtype="int64"), unit="us"),
            "rev": out_rev,
            "ewma": out_ewma,
        }
    )


def running_ewma_daily(stream: DataFrame) -> DataFrame:
    """Per-event-type daily-revenue EWMA, emitted as days close."""
    from pyspark.sql import functions as F

    prepared = stream.select(
        "event_type",
        F.expr(
            "timestampdiff(MICROSECOND, to_timestamp_ntz('1970-01-01"
            " 00:00:00'), date_trunc('DAY', ts))"
        ).alias("day_us"),
        # batch parity: a NULL value contributes 0 to its day (the day
        # still EXISTS — q_ewma_daily coalesces an all-NULL day to rev 0)
        F.coalesce(
            F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"), F.lit(0)
        ).alias("vc"),
    ).filter(F.col("day_us").isNotNull())
    return prepared.groupBy("event_type").applyInPandasWithState(
        _update_ewma,
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def ewma_drain_flush(closed: DataFrame, source: DataFrame) -> DataFrame:
    """Optional end-of-drain flush (round 10, VERDICT r09 #5): append each
    type's still-OPEN final day to the closed-day rows a drained
    ``AvailableNow`` run emitted, so the drained twin equals
    ``q_ewma_daily`` on the FULL day set.  The unbounded-stream operator
    is untouched (emit-on-close stays the default semantics): this is a
    post-drain composition — once the stream has stopped, the open day's
    revenue is one tail aggregation over the batch-readable input
    (per-type max day only), and its EWMA is ONE rounded recursion step
    from the last EMITTED ewma, which is recoverable from the sink
    because closed days were emitted in order.  A type that never closed
    a day (single-day type) flushes with ewma = rev, exactly the batch
    first-day rule.

    Why not a state timeout: availableNow + ProcessingTimeTimeout does
    not deterministically run a final timeout batch before termination
    (measured on Spark 4.1 local — the query can loop instead of
    draining), while this composition is exact by construction and adds
    ZERO cost to the steady-state stream.
    """
    from pyspark.sql import functions as F

    a, b = _EWMA_ALPHA, 1.0 - _EWMA_ALPHA
    daily = (
        source.filter(F.col("ts").isNotNull())
        .select(
            "event_type",
            F.date_trunc("DAY", F.col("ts")).alias("day"),
            F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("vc"),
        )
        .groupBy("event_type", "day")
        .agg(F.coalesce(F.sum("vc"), F.lit(0)).alias("rc"))
    )
    last_open = daily.groupBy("event_type").agg(
        F.max("day").alias("day"), F.max_by("rc", "day").alias("rc")
    )
    carry = closed.groupBy("event_type").agg(
        F.max_by("ewma", "day").alias("prev")
    )
    x = F.col("rc") / F.lit(100.0)
    nxt = F.when(
        F.col("prev").isNotNull(), F.lit(a) * x + F.lit(b) * F.col("prev")
    ).otherwise(x)
    flushed = last_open.join(carry, "event_type", "left").select(
        "event_type",
        F.col("day").cast("timestamp_ntz").alias("day"),
        x.alias("rev"),
        (F.floor(nxt * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)).alias(
            "ewma"
        ),
    )
    return closed.select("event_type", "day", "rev", "ewma").unionByName(
        flushed
    )
