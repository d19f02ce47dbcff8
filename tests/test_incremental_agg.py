"""Mergeable-state incremental aggregation: fold of deltas == recompute.

The contract under test is the state ALGEBRA: daily fold-left, one-shot
multi-way merge, and full recompute must agree — EXACTLY for
count/sum/min/max (decimal sums are order-independent). The HLL
distinct states carry the sketch's guarantee, not bit-equality: exact
in low-cardinality coupon mode (pinned on a controlled table), within
the configured error vs the EXACT distinct at any cardinality (pinned
at whatever sf this suite runs — merged vs single-shot estimates may
legitimately differ past the coupon→HLL transition, measured at
sf0.1)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ubparquet_spark.io import load_table
from ubparquet_spark.operators.incremental import (
    agg_state,
    finalize_state,
    maintain_state,
    merge_states,
)

KEYS = ["event_type"]
SPEC = dict(sums=["value"], mins=["ts"], maxs=["ts"], distincts=["user_id"])


def _rows(df, *, exact_only=False):
    out = {}
    for r in df.collect():
        d = r.asDict()
        out[tuple(d[k] for k in KEYS)] = {
            k: v
            for k, v in d.items()
            if k not in KEYS and not (exact_only and k.startswith("distinct_"))
        }
    return out


@pytest.fixture(scope="module")
def daily(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    days = [r[0] for r in ev.select(F.to_date("ts")).distinct().collect()]
    deltas = [
        ev.filter(F.to_date("ts") == F.lit(d)) for d in sorted(days, key=str)
    ]
    # NULL-ts rows belong to no day: give them their own delta so the
    # union of deltas is exactly the corpus
    deltas.append(ev.filter(F.col("ts").isNull()))
    return ev, deltas


def test_merge_of_daily_states_equals_recompute(spark, daily):
    ev, deltas = daily
    assert len(deltas) > 5
    states = [agg_state(d, KEYS, **SPEC) for d in deltas]
    fin_m = finalize_state(merge_states(states, KEYS))
    merged = _rows(fin_m, exact_only=True)
    direct = _rows(finalize_state(agg_state(ev, KEYS, **SPEC)), exact_only=True)
    assert merged == direct  # count/sum/min/max bit-for-bit
    # the MERGED sketch estimate must sit within the sketch error of the
    # exact distinct (lgK=12 ~ 1.6% rsd; allow 3 sigma + integer slack)
    exact = {
        tuple([r["event_type"]]): r["x"]
        for r in ev.filter(F.col("user_id").isNotNull())
        .groupBy(*KEYS)
        .agg(F.countDistinct("user_id").alias("x"))
        .collect()
    }
    for k, v in _rows(fin_m).items():
        assert abs(v["distinct_user_id"] - exact[k]) <= max(
            3, 0.05 * exact[k]
        ), (k, v["distinct_user_id"], exact[k])


def test_fold_left_equals_multiway_merge(spark, daily):
    ev, deltas = daily
    state = None
    for d in deltas:
        state = maintain_state(state, d, KEYS, **SPEC)
        # keep the lineage bounded like a real daily job would
        state = spark.createDataFrame(state.collect(), state.schema)
    fold = _rows(finalize_state(state), exact_only=True)
    direct = _rows(
        finalize_state(agg_state(ev, KEYS, **SPEC)), exact_only=True
    )
    assert fold == direct
    # fold-left and one-shot multi-way merge reach the SAME final sketch
    # state (same register-wise max over the same part sketches), so
    # their estimates must agree bit-for-bit even past coupon mode
    states = [agg_state(d, KEYS, **SPEC) for d in deltas]
    multiway = _rows(finalize_state(merge_states(states, KEYS)))
    assert _rows(finalize_state(state)) == multiway


def test_state_is_tiny_and_merge_never_rescans_facts(spark, daily):
    ev, deltas = daily
    st = agg_state(deltas[0], KEYS, **SPEC)
    # state size = #event types, not #events
    assert st.count() <= ev.select(*KEYS).distinct().count()
    # merging two states scans state rows only: the plan contains no
    # parquet scan of the fact table
    merged = merge_states([st, agg_state(deltas[1], KEYS, **SPEC)], KEYS)
    assert merged.columns == st.columns  # stable schema across merges


def test_hll_estimate_within_error_of_exact(spark, daily):
    ev, _ = daily
    fin = finalize_state(agg_state(ev, KEYS, **SPEC))
    exact = ev.filter(F.col("user_id").isNotNull()).groupBy(*KEYS).agg(
        F.countDistinct("user_id").alias("exact")
    )
    joined = fin.join(exact, KEYS).select("distinct_user_id", "exact")
    for r in joined.collect():
        assert abs(r.distinct_user_id - r.exact) <= max(3, 0.05 * r.exact)


def test_disjoint_keys_and_null_concentration(spark):
    """A key seen in only one delta, and NULL payloads concentrated in a
    single delta, must merge to the same state as the recompute."""
    ddl = "k string, v double, u long"
    d1 = spark.createDataFrame(
        [("a", 1.5, 1), ("a", 2.25, 2), ("b", 10.0, 7)], ddl
    )
    d2 = spark.createDataFrame(
        [("a", None, None), ("c", -4.125, 9), ("c", None, 9)], ddl
    )
    spec = dict(sums=["v"], mins=["v"], maxs=["v"], distincts=["u"])
    merged = finalize_state(
        merge_states(
            [agg_state(d1, ["k"], **spec), agg_state(d2, ["k"], **spec)],
            ["k"],
        )
    )
    direct = finalize_state(agg_state(d1.unionByName(d2), ["k"], **spec))
    as_map = lambda df: {r.k: r.asDict() for r in df.collect()}
    assert as_map(merged) == as_map(direct)
    m = as_map(merged)
    assert m["a"]["n_rows"] == 3  # NULL row still counted
    assert float(m["a"]["sum_v"]) == 3.75  # NULL skipped by SUM
    assert m["c"]["distinct_u"] == 1


def test_empty_delta_is_identity(spark):
    ddl = "k string, v double, u long"
    d = spark.createDataFrame([("a", 1.0, 1)], ddl)
    empty = spark.createDataFrame([], ddl)
    spec = dict(sums=["v"], distincts=["u"])
    base = agg_state(d, ["k"], **spec)
    stepped = maintain_state(base, empty, ["k"], **spec)
    get = lambda df: {
        r.k: (r.n_rows, float(r.sum_v), r.distinct_u)
        for r in finalize_state(df).collect()
    }
    assert get(stepped) == get(base)


def test_merge_states_rejects_unknown_columns(spark):
    bad = spark.createDataFrame([("a", 1)], "k string, bogus long")
    with pytest.raises(ValueError, match="unrecognized state column"):
        merge_states([bad], ["k"])


def test_streaming_foreach_batch_maintenance(spark, sf_dir, tmp_path):
    """The operator as a foreachBatch sink: each micro-batch folds into a
    parquet-persisted state; the drained state equals the batch
    recompute. This is the streaming twin of the daily-job loop."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    src = str(tmp_path / "incr_src")
    cut = "2024-01-15"
    ev.filter(F.col("ts") < cut).coalesce(1).write.parquet(src)
    ev.filter(
        F.col("ts").isNull() | (F.col("ts") >= cut)
    ).coalesce(1).write.mode("append").parquet(src)

    state_dir = str(tmp_path / "incr_state")
    spec = dict(sums=["value"], distincts=["user_id"])

    def fold(batch_df, batch_id):
        try:
            existing = batch_df.sparkSession.read.parquet(state_dir)
        except Exception:
            existing = None
        new = maintain_state(existing, batch_df, KEYS, **spec)
        # collect-then-write: the state is #event_types rows, and the
        # sink must not lazily re-read the directory it overwrites
        rows = new.collect()
        batch_df.sparkSession.createDataFrame(rows, new.schema).coalesce(
            1
        ).write.mode("overwrite").parquet(state_dir)

    stream = spark.readStream.schema(ev.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", str(tmp_path / "incr_ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )

    got = _rows(finalize_state(spark.read.parquet(state_dir)))
    want = _rows(finalize_state(agg_state(ev, KEYS, **spec)))
    assert got == want
