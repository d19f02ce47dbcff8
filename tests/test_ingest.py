"""Distributed converter: files → encode → sorted Parquet → decode equality."""

from __future__ import annotations

import numpy as np
import pytest

from ubparquet_spark import ingest
from ubparquet_spark.codec import decode_ndarray
from ubparquet_spark.serving import EventDataset

SCHEMA = (
    "run long, subrun long, event long, "
    "spacepoint_t array<double>, spacepoint_t_shape array<long>, "
    "ssnet_label array<long>, ssnet_label_shape array<long>"
)


def fake_reader(path: str):
    """Deterministic synthetic per-file events (stands in for uproot)."""
    file_id = int(path.rsplit("_", 1)[1])
    rng = np.random.default_rng(1000 + file_id)
    for ev in range(3):
        n = int(rng.integers(10, 40))
        yield {
            "run": 1,
            "subrun": file_id,
            "event": ev,
            "spacepoint_t": rng.uniform(0, 100, (n, 4)),
            "ssnet_label": rng.integers(0, 7, n),
        }


def test_encode_event_roundtrip():
    rng = np.random.default_rng(0)
    arr = rng.standard_normal((5, 3))
    enc = ingest.encode_event({"run": 2, "x": arr})
    assert enc["run"] == 2
    np.testing.assert_array_equal(decode_ndarray(enc["x"], enc["x_shape"]), arr)


def test_convert_files_distributed(spark):
    paths = [f"mem://file_{i}" for i in range(4)]
    df = ingest.convert_files(spark, paths, fake_reader, SCHEMA)
    assert df.count() == 12  # 4 files x 3 events
    keys = {(r.run, r.subrun, r.event) for r in df.select("run", "subrun", "event").collect()}
    assert len(keys) == 12


def test_convert_and_write_then_serve(spark, tmp_path):
    paths = [f"mem://file_{i}" for i in range(3)]
    out = str(tmp_path / "converted")
    ingest.convert_and_write(spark, paths, fake_reader, SCHEMA, out)
    ds = EventDataset(spark, out)
    assert len(ds) == 9
    # decode equality against a direct reader replay
    expected = {(e["run"], e["subrun"], e["event"]): e for p in paths for e in fake_reader(p)}
    got = ds.get_entry(1, 2, 1)
    exp = expected[(1, 2, 1)]
    np.testing.assert_array_equal(got["spacepoint_t"], exp["spacepoint_t"])
    np.testing.assert_array_equal(
        got["ssnet_label"].reshape(-1), exp["ssnet_label"]
    )


def test_root_reader_gated_without_uproot():
    """Without uproot the reader is constructable but raises the honest
    NotImplementedError on first use (env gate, not a silent fake)."""
    import importlib.util

    import pytest

    from ubparquet_spark.ingest import root_reader

    reader = root_reader("events", ["run", "x"])
    if importlib.util.find_spec("uproot") is None:
        with pytest.raises(NotImplementedError):
            next(iter(reader("/nonexistent.root")))
    else:
        pytest.skip("uproot present; covered by test_root_reader_roundtrip")


def test_root_reader_roundtrip(spark, tmp_path):
    """With uproot present: write a small TTree, convert it through the
    distributed pipeline, and check values + ragged encoding round-trip."""
    uproot = __import__("pytest").importorskip("uproot")
    import numpy as np

    from ubparquet_spark.ingest import convert_files, root_reader

    path = str(tmp_path / "t.root")
    with uproot.recreate(path) as f:
        f["events"] = {
            "run": np.array([1, 1, 2], dtype=np.int64),
            "x": np.array([0.5, 1.5, 2.5]),
        }
    df = convert_files(
        spark, [path], root_reader("events", ["run", "x"]),
        "run long, x double",
    )
    rows = sorted((r.run, r.x) for r in df.collect())
    assert rows == [(1, 0.5), (1, 1.5), (2, 2.5)]
