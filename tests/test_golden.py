"""Committed golden-buffer regression test: the full-resolution default scene
must keep rendering the same image (the TPU analog of the reference's
committed benchmark.txt + screenshot workflow, SURVEY.md §4)."""

from pathlib import Path

import numpy as np

from raytpu.core import scenes
from raytpu.core.types import RenderConfig
from raytpu.render import render_image

GOLDEN = Path(__file__).parent / "golden" / "reference_640x480.png"


def test_reference_scene_matches_committed_golden():
    from PIL import Image

    golden = np.asarray(Image.open(GOLDEN)).astype(int)
    img = np.asarray(render_image(scenes.get("reference").build(), RenderConfig(width=640, height=480))).astype(int)
    diff = np.abs(img - golden)
    flipped = (diff > 1).any(axis=-1).mean()
    # tiny boundary-flip budget for fp reassociation across jax versions
    assert flipped <= 0.002, f"{flipped:.4%} pixels flipped vs golden (max {diff.max()})"
    assert diff.mean() <= 0.1
