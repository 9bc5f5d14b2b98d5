"""Checkpoint / resume for optimization loops (orbax-backed).

The reference's only persistence is a BMP screenshot (reference:
source/Renderer.cpp:184-187).  For the differentiable framework the real
state is the optimization pytree (scene parameters + optimizer state +
step counter); this module saves/restores it with orbax so long inverse
rendering runs survive preemption (SURVEY.md §5.4).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save(path: str, state: Any) -> None:
    """Save a pytree (params / opt_state / step ...) to ``path``."""
    p = Path(path).resolve()
    _checkpointer().save(p, state, force=True)


def restore(path: str, like: Optional[Any] = None) -> Any:
    """Restore a pytree saved with ``save``; ``like`` provides the structure
    (and shardings) to restore into."""
    import orbax.checkpoint as ocp

    p = Path(path).resolve()
    if like is not None:
        return _checkpointer().restore(p, item=like)
    return _checkpointer().restore(p)


def latest_step(root: str) -> Optional[int]:
    """Find the newest ``step_N`` checkpoint directory under ``root``."""
    r = Path(root)
    if not r.is_dir():
        return None
    steps = [int(d.name.split("_")[1]) for d in r.iterdir() if d.name.startswith("step_")]
    return max(steps) if steps else None


class CheckpointManager:
    """Tiny step-based manager: ``save_step(step, state)`` keeps the last
    ``keep`` checkpoints under ``root/step_N``; ``restore_latest`` resumes."""

    def __init__(self, root: str, keep: int = 3):
        self.root = Path(root)
        self.keep = keep
        self.root.mkdir(parents=True, exist_ok=True)

    def save_step(self, step: int, state: Any) -> None:
        save(str(self.root / f"step_{step}"), state)
        steps = sorted(
            int(d.name.split("_")[1]) for d in self.root.iterdir() if d.name.startswith("step_")
        )
        for s in steps[: -self.keep]:
            import shutil

            shutil.rmtree(self.root / f"step_{s}", ignore_errors=True)

    def restore_latest(self, like: Optional[Any] = None):
        step = latest_step(str(self.root))
        if step is None:
            return None, None
        return step, restore(str(self.root / f"step_{step}"), like)
