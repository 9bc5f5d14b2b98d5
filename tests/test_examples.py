"""The shipped examples must keep running end to end."""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_inverse_rendering_example(tmp_path):
    out = tmp_path / "strip.png"
    proc = subprocess.run(
        [
            sys.executable,
            str(REPO / "examples" / "inverse_rendering.py"),
            "--steps", "30",
            "--size", "32x24",
            "--platform", "cpu",
            "--out", str(out),
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert out.exists()
    assert "final loss" in proc.stdout
