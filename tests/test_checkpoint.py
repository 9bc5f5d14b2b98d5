"""Checkpoint/resume round-trips (SURVEY.md §5.4).

The reference's only persistence is the BMP screenshot (reference:
source/Renderer.cpp:184-187); the framework checkpoints the optimization
state pytree instead.  These tests pin the orbax-backed save/restore API.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import optax
import pytest

from raytpu.core import scenes
from raytpu.grad import diff_render
from raytpu.utils import checkpoint


def _tree_allclose(a, b):
    import jax

    flat_a, treedef_a = jax.tree_util.tree_flatten(a)
    flat_b, treedef_b = jax.tree_util.tree_flatten(b)
    assert treedef_a == treedef_b
    for xa, xb in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb), rtol=0, atol=0)


@pytest.fixture(scope="module")
def opt_state_bundle():
    """(params, opt_state, step) as produced by a real optimization setup."""
    scene = scenes.get("w3_test").build()
    params = diff_render.material_params(scene)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    return {"params": params, "opt_state": opt_state, "step": jnp.int32(7)}


def test_save_restore_roundtrip(tmp_path, opt_state_bundle):
    path = tmp_path / "ckpt"
    checkpoint.save(str(path), opt_state_bundle)
    restored = checkpoint.restore(str(path), like=opt_state_bundle)
    _tree_allclose(restored, opt_state_bundle)
    assert int(restored["step"]) == 7


def test_restore_without_like(tmp_path, opt_state_bundle):
    path = tmp_path / "ckpt2"
    checkpoint.save(str(path), {"params": opt_state_bundle["params"]})
    restored = checkpoint.restore(str(path))
    np.testing.assert_allclose(
        np.asarray(restored["params"]["color"]),
        np.asarray(opt_state_bundle["params"]["color"]),
    )


def test_save_overwrites(tmp_path, opt_state_bundle):
    path = tmp_path / "ckpt3"
    checkpoint.save(str(path), {"step": jnp.int32(1)})
    checkpoint.save(str(path), {"step": jnp.int32(2)})
    assert int(checkpoint.restore(str(path))["step"]) == 2


def test_manager_keep_policy_and_resume(tmp_path, opt_state_bundle):
    mgr = checkpoint.CheckpointManager(str(tmp_path / "run"), keep=2)
    for step in (1, 5, 9):
        state = dict(opt_state_bundle, step=jnp.int32(step))
        mgr.save_step(step, state)

    # keep policy: only the last 2 survive
    kept = sorted(d.name for d in (tmp_path / "run").iterdir() if d.name.startswith("step_"))
    assert kept == ["step_5", "step_9"]

    step, restored = mgr.restore_latest(like=opt_state_bundle)
    assert step == 9
    assert int(restored["step"]) == 9
    _tree_allclose(restored["params"], opt_state_bundle["params"])


def test_manager_empty_root(tmp_path):
    mgr = checkpoint.CheckpointManager(str(tmp_path / "empty"))
    step, state = mgr.restore_latest()
    assert step is None and state is None
    assert checkpoint.latest_step(str(tmp_path / "nonexistent")) is None


def test_resume_continues_training(tmp_path, small_config):
    """Save mid-optimization, restore, and verify the loop continues from
    the same state (loss identical to an uninterrupted run)."""
    cfg = dataclasses.replace(small_config, soft_shadows=True)
    scene = scenes.get("sphere").build()
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    opt = optax.sgd(1e-2)
    step_fn = diff_render.make_train_step(
        cfg, opt, diff_render.material_params, diff_render.merge_material_params
    )

    # uninterrupted: 2 steps (fresh pytrees per branch: the train step
    # donates its params/opt_state buffers)
    p_ref = diff_render.material_params(scene)
    s_ref = opt.init(p_ref)
    for _ in range(2):
        p_ref, s_ref, loss_ref = step_fn(p_ref, s_ref, scene, target)

    # interrupted: 1 step, checkpoint, restore, 1 more step
    params = diff_render.material_params(scene)
    opt_state = opt.init(params)
    p1, s1, _ = step_fn(params, opt_state, scene, target)
    mgr = checkpoint.CheckpointManager(str(tmp_path / "resume"))
    mgr.save_step(1, {"params": p1, "opt_state": s1})
    _, restored = mgr.restore_latest(like={"params": p1, "opt_state": s1})
    p2, s2, loss2 = step_fn(restored["params"], restored["opt_state"], scene, target)

    np.testing.assert_allclose(float(loss2), float(loss_ref), rtol=1e-6)
    _tree_allclose(p2, p_ref)
