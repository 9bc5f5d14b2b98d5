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


def test_geometry_fit_example(tmp_path):
    out = tmp_path / "strip.png"
    proc = subprocess.run(
        [
            sys.executable,
            str(REPO / "examples" / "geometry_fit.py"),
            "--steps", "40",
            "--size", "32x24",
            "--noise", "0.08",
            "--platform", "cpu",
            "--out", str(out),
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert proc.returncode == 0, (proc.stdout[-1000:], proc.stderr[-2000:])
    assert out.exists()
    assert "vertex RMSE" in proc.stdout


def test_inverse_rendering_checkpoint_resume(tmp_path):
    """Run with checkpointing, then resume from the saved state."""
    out = tmp_path / "strip.png"
    ckpt = tmp_path / "ckpts"
    base = [
        sys.executable,
        str(REPO / "examples" / "inverse_rendering.py"),
        "--size", "32x24",
        "--platform", "cpu",
        "--out", str(out),
        "--checkpoint-dir", str(ckpt),
        "--checkpoint-every", "5",
    ]
    first = subprocess.run(
        base + ["--steps", "10"], capture_output=True, text=True, timeout=300, cwd=REPO
    )
    assert first.returncode == 0, first.stderr[-2000:]
    assert (ckpt / "step_10").exists()

    second = subprocess.run(
        base + ["--steps", "15"], capture_output=True, text=True, timeout=300, cwd=REPO
    )
    assert second.returncode == 0, second.stderr[-2000:]
    assert "resumed from checkpoint step 10" in second.stdout
