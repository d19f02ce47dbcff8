"""EventDataset serving: lookup, sampling, epochs, collation — reference
larmatchDataset semantics without per-row pickle collects."""

from __future__ import annotations

import numpy as np
import pytest

from ubparquet_spark.codec import decode_ndarray
from ubparquet_spark.serving import EventDataset, collate_batch

from .fixtures import make_spacepoint_events, spacepoint_df


@pytest.fixture(scope="module")
def dataset(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("events") / "sp.parquet")
    spacepoint_df(spark, 8).write.mode("overwrite").parquet(path)
    return EventDataset(spark, path)


def test_len(dataset):
    assert len(dataset) == 8


def test_point_lookup_decodes_tensors(dataset):
    rows = make_spacepoint_events(8)
    target = rows[3]
    got = dataset.get_entry(target["run"], target["subrun"], target["event"])
    assert got is not None
    expected = decode_ndarray(target["spacepoint_t"], target["spacepoint_t_shape"])
    np.testing.assert_array_equal(got["spacepoint_t"], expected)
    assert got["spacepoint_t"].shape[1] == 4


def test_point_lookup_missing_returns_none(dataset):
    assert dataset.get_entry(99, 99, 99) is None


def test_sample_seeded(dataset):
    a = dataset.sample(3, seed=11)
    b = dataset.sample(3, seed=11)
    assert len(a) == 3
    ka = [(e["run"], e["subrun"], e["event"]) for e in a]
    kb = [(e["run"], e["subrun"], e["event"]) for e in b]
    assert ka == kb


def test_epoch_batches_cover_all_events_once(dataset):
    seen = []
    for batch in dataset.epoch_batches(batch_size=3, epoch=0, seed=5):
        for ev in batch:
            seen.append((ev["run"], ev["subrun"], ev["event"]))
    assert len(seen) == 8 and len(set(seen)) == 8
    # different epoch -> different order, same cover
    seen1 = [
        (ev["run"], ev["subrun"], ev["event"])
        for b in dataset.epoch_batches(batch_size=3, epoch=1, seed=5)
        for ev in b
    ]
    assert sorted(seen1) == sorted(seen)
    assert seen1 != seen


def test_epoch_partitions_disjoint_cover(dataset):
    keys = [set(), set()]
    for i in range(2):
        for batch in dataset.epoch_batches(2, epoch=0, seed=1, partition=(i, 2)):
            keys[i].update((e["run"], e["subrun"], e["event"]) for e in batch)
    assert keys[0] | keys[1] == {
        (e["run"], e["subrun"], e["event"]) for e in dataset.sample(100, seed=0)
    } or len(keys[0] | keys[1]) == 8
    assert not (keys[0] & keys[1])


def test_collate_concat_and_batch_index(dataset):
    batch = next(dataset.epoch_batches(batch_size=3, epoch=0, seed=2))
    out = collate_batch(
        batch, ["spacepoint_t"], batch_index_cols=["spacepoint_t"]
    )
    n_total = sum(ev["spacepoint_t"].shape[0] for ev in batch)
    assert out["spacepoint_t"].shape == (n_total, 5)  # batch idx prepended
    # rows of event ib carry batch index ib in column 0
    o0, o1 = out["batch_offsets"][0], out["batch_offsets"][1]
    assert (out["spacepoint_t"][o0:o1, 0] == 0).all()
    assert (out["spacepoint_t"][o1:, 0] >= 1).all()


def test_epoch_batches_never_convert_rows_on_driver(dataset, monkeypatch):
    """The serving edge must be Arrow end-to-end: poison the per-row
    conversion entry points (Row.asDict and the per-row decode helper) and
    run a full epoch — executor-assembled IPC chunks mean neither is
    called on this path."""
    from pyspark.sql import Row

    import ubparquet_spark.serving as serving_mod

    def _boom(*a, **k):
        raise AssertionError("per-row conversion on the driver serving path")

    monkeypatch.setattr(Row, "asDict", _boom)
    monkeypatch.setattr(serving_mod, "_decode_pandas_row", _boom)
    n = sum(len(b) for b in dataset.epoch_batches(batch_size=3, epoch=0, seed=5))
    assert n == 8


def test_epoch_batches_preserve_stored_dtype(spark, tmp_path):
    """Columnar decode keeps the parquet dtype (a float32 tensor stays
    float32 — the old per-row path promoted everything to float64 via
    Python floats). The module fixture stores doubles; write a float32
    variant to prove the narrow type survives end-to-end."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "sp32.parquet")
    spacepoint_df(spark, 4).withColumn(
        "spacepoint_t", F.col("spacepoint_t").cast("array<float>")
    ).write.mode("overwrite").parquet(path)
    ds32 = EventDataset(spark, path)
    batch = next(ds32.epoch_batches(batch_size=2, epoch=0, seed=2))
    arr = batch[0]["spacepoint_t"]
    assert arr.dtype == np.float32
    assert arr.ndim == 2 and arr.shape[1] == 4
    # and the module fixture's doubles stay doubles
    assert batch[0]["ssnet_label"].dtype == np.int64
