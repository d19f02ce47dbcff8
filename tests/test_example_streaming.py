"""The examples/streaming_pipeline.py script runs end-to-end."""

from __future__ import annotations

import subprocess
import sys


def test_streaming_pipeline_example_runs(tmp_path, sf_dir):
    out = subprocess.run(
        [sys.executable, "examples/streaming_pipeline.py", sf_dir, str(tmp_path)],
        capture_output=True,
        text=True,
        timeout=420,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "pipeline OK" in out.stdout
    assert "attribution:" in out.stdout
