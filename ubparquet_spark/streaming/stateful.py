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
