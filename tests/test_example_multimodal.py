"""The examples/multimodal_pipeline.py script runs end-to-end."""

from __future__ import annotations

import subprocess
import sys


def test_multimodal_pipeline_example_runs(tmp_path):
    out = subprocess.run(
        [sys.executable, "examples/multimodal_pipeline.py", str(tmp_path)],
        capture_output=True,
        text=True,
        timeout=420,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "multimodal pipeline OK" in out.stdout
    assert "image: 24 items" in out.stdout
    assert "audio: 24 items" in out.stdout
