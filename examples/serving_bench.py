"""Serving-edge throughput bench (round 8, VERDICT r07 "Next round" #6).

Measures the U2/U3 serving path — ``serving.EventDataset.epoch_batches``
(Arrow end-to-end: executors assemble columnar chunks via mapInArrow,
the driver decodes vectorized) — against the per-row pickle iteration it
replaced (the reference's ``larmatch_dataset.py:144-163`` pattern, noted
"SLOW ASF" in the reference itself: row-at-a-time driver decode).

Reports, for each path:
  - first-batch latency (time from call to the first yielded batch —
    the "how long until the GPU sees data" number), and
  - full-epoch throughput in events/sec and Mpoints/sec.

Usage: python examples/serving_bench.py [n_events] [points_per_event]
Defaults 1500 x 1200 (~58 MB of spacepoints). Results land in
BENCHNOTES.md's round-8 section.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from ubparquet_spark.codec import decode_ndarray  # noqa: E402
from ubparquet_spark.serving import EventDataset  # noqa: E402
from ubparquet_spark.session import get_session  # noqa: E402

BATCH = 16


def synth(path: str, n_events: int, pts: int, seed: int = 7) -> None:
    """Write a ragged-tensor event table with pyarrow (driver-side synth
    is fine here: the BENCH subject is the read path, not the writer)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    cols = {
        "run": [], "subrun": [], "event": [],
        "spacepoint_t": [], "spacepoint_t_shape": [],
        "truetriplet_t": [], "truetriplet_t_shape": [],
    }
    for i in range(n_events):
        n = int(pts * (0.5 + rng.random()))  # ragged: 0.5x..1.5x
        cols["run"].append(1)
        cols["subrun"].append(i // 1000)
        cols["event"].append(i % 1000)
        cols["spacepoint_t"].append(
            rng.random(n * 4).astype(np.float64)
        )
        cols["spacepoint_t_shape"].append([n, 4])
        cols["truetriplet_t"].append(
            rng.integers(0, 2, n).astype(np.int64)
        )
        cols["truetriplet_t_shape"].append([n])
    tbl = pa.table(
        {
            "run": pa.array(cols["run"], pa.int64()),
            "subrun": pa.array(cols["subrun"], pa.int64()),
            "event": pa.array(cols["event"], pa.int64()),
            "spacepoint_t": pa.array(
                [c.tolist() for c in cols["spacepoint_t"]],
                pa.list_(pa.float64()),
            ),
            "spacepoint_t_shape": pa.array(
                cols["spacepoint_t_shape"], pa.list_(pa.int64())
            ),
            "truetriplet_t": pa.array(
                [c.tolist() for c in cols["truetriplet_t"]],
                pa.list_(pa.int64()),
            ),
            "truetriplet_t_shape": pa.array(
                cols["truetriplet_t_shape"], pa.list_(pa.int64())
            ),
        }
    )
    pq.write_table(tbl, path, row_group_size=256)


def run_arrow_path(ds: EventDataset) -> dict:
    t0 = time.perf_counter()
    it = ds.epoch_batches(batch_size=BATCH, epoch=0, seed=3)
    first = next(it)
    t_first = time.perf_counter() - t0
    n_events = len(first)
    n_points = sum(ev["spacepoint_t"].shape[0] for ev in first)
    for batch in it:
        n_events += len(batch)
        n_points += sum(ev["spacepoint_t"].shape[0] for ev in batch)
    dt = time.perf_counter() - t0
    return {
        "first_batch_sec": round(t_first, 3),
        "epoch_sec": round(dt, 2),
        "events_per_sec": round(n_events / dt, 1),
        "mpoints_per_sec": round(n_points / dt / 1e6, 3),
        "n_events": n_events,
    }


def run_pickle_path(ds: EventDataset) -> dict:
    """The reference anti-pattern twin: per-row driver iteration + per-row
    Python decode (Row -> dict -> numpy), no Arrow anywhere."""
    from ubparquet_spark.operators.sampling import epoch_order

    df = epoch_order(ds.df, 0, 3)
    t0 = time.perf_counter()
    t_first = None
    n_events = n_points = 0
    batch = []
    for row in df.toLocalIterator():  # per-row pickle transfer
        d = row.asDict()
        ev = {
            c: decode_ndarray(d[c], d[f"{c}_shape"])
            for c in ds.tensor_cols
        }
        batch.append(ev["spacepoint_t"])
        if len(batch) == BATCH:
            if t_first is None:
                t_first = time.perf_counter() - t0
            n_events += len(batch)
            n_points += sum(a.shape[0] for a in batch)
            batch = []
    n_events += len(batch)
    n_points += sum(a.shape[0] for a in batch)
    dt = time.perf_counter() - t0
    return {
        "first_batch_sec": round(t_first or dt, 3),
        "epoch_sec": round(dt, 2),
        "events_per_sec": round(n_events / dt, 1),
        "mpoints_per_sec": round(n_points / dt / 1e6, 3),
        "n_events": n_events,
    }


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    pts = int(sys.argv[2]) if len(sys.argv) > 2 else 1200
    spark = get_session("serving-bench")
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/events.parquet"
        synth(path, n_events, pts)
        ds = EventDataset(
            spark, path, columns=["spacepoint_t", "truetriplet_t"]
        )
        # warm-up: JVM scan + Python-worker startup, so neither measured
        # path pays the one-time session costs
        ds.df.limit(64).mapInArrow(lambda it: it, ds.df.schema).count()
        _ = len(ds)
        # materialize the epoch-0 sort once so BOTH paths read a warm
        # shuffle (round 9: the r8 first-batch gap was measurement-order
        # bias — arrow ran first and paid the one-time epoch sort, then
        # pickle re-read the already-materialized shuffle files)
        from ubparquet_spark.operators.sampling import epoch_order

        next(iter(epoch_order(ds.df, 0, 3).toLocalIterator()))
        next(
            iter(
                epoch_order(ds.df, 0, 3, num_partitions=8).toLocalIterator()
            )
        )
        results = {}
        for name, fn in (
            ("arrow_epoch", run_arrow_path),
            ("pickle_epoch", run_pickle_path),
        ):
            results[name] = fn(ds)
            print(name, results[name], file=sys.stderr)
        results["speedup_events_per_sec"] = round(
            results["arrow_epoch"]["events_per_sec"]
            / results["pickle_epoch"]["events_per_sec"],
            2,
        )
        print(json.dumps({"n_events": n_events, "pts": pts, **results}))


if __name__ == "__main__":
    main()
