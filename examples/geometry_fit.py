"""Geometry fitting demo: recover mesh vertex positions from a target image.

Renders a ground-truth image of the bunny scene, perturbs the mesh's vertex
positions with noise, then optimizes them back by gradient descent through
the differentiable renderer — gradients flow through the detached closest
hit (re-derived winning triangle) AND through the soft-shadow transmittance
(on TPU via the hand-written Pallas VJP kernels, raytpu/render/pallas_soft.py;
the prim-side "wgrad" kernel produces exactly these vertex cotangents).

A capability the reference has no analog for (it is a pure forward
renderer); exercises SURVEY.md §7.4's differentiability layer end to end.

Usage: python examples/geometry_fit.py [--steps 120] [--size 96x72]
       [--platform cpu]
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=120)
    p.add_argument("--size", default="96x72")
    p.add_argument("--noise", type=float, default=0.15)
    p.add_argument("--out", default="geometry_fit.png")
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp
    import optax

    from raytpu.core import scenes
    from raytpu.core.types import RenderConfig
    from raytpu.grad import diff_render
    from raytpu.utils.image import write_png

    w, h = (int(x) for x in args.size.lower().split("x"))
    # a gentler sigmoid than the default: wider shadow-edge support gives the
    # vertex gradients a larger basin of attraction
    cfg = RenderConfig(width=w, height=h, soft_shadows=True, soft_beta=60.0)
    truth = scenes.get("bunny").build()
    target = diff_render.render_soft(truth, cfg)

    rng = np.random.default_rng(0)
    noise = jnp.asarray(
        rng.normal(0.0, args.noise, truth.meshes.positions.shape), jnp.float32
    )
    start_positions = truth.meshes.positions + noise

    def scene_with(positions):
        meshes = truth.meshes.with_positions(positions)  # refreshes face normals
        return truth.with_meshes(meshes)

    def loss_fn(positions):
        img = diff_render.render_soft(scene_with(positions), cfg)
        return jnp.mean((img - target) ** 2)

    opt = optax.adam(5e-3)

    @jax.jit
    def step(positions, opt_state):
        loss, g = jax.value_and_grad(loss_fn)(positions)
        updates, opt_state = opt.update(g, opt_state)
        return positions + updates, opt_state, loss

    positions = start_positions
    opt_state = opt.init(positions)
    start_img = diff_render.render_soft(scene_with(positions), cfg)
    loss0 = None
    t0 = time.time()
    for i in range(args.steps):
        positions, opt_state, loss = step(positions, opt_state)
        if loss0 is None:
            loss0 = float(loss)
        if i % 20 == 0 or i == args.steps - 1:
            print(f"step {i:4d}  loss {float(loss):.6f}", flush=True)
    dt = time.time() - t0
    final_loss = float(loss)
    vert_rmse0 = float(jnp.sqrt(jnp.mean((start_positions - truth.meshes.positions) ** 2)))
    vert_rmse = float(jnp.sqrt(jnp.mean((positions - truth.meshes.positions) ** 2)))
    print(f"{args.steps} steps in {dt:.1f}s | image loss {loss0:.6f} -> {final_loss:.6f} "
          f"| vertex RMSE {vert_rmse0:.4f} -> {vert_rmse:.4f}")

    final_img = diff_render.render_soft(scene_with(positions), cfg)
    strip = np.concatenate(
        [np.asarray(x) for x in (target, start_img, final_img)], axis=1
    )
    write_png(args.out, (np.clip(strip, 0.0, 1.0) * 255).astype(np.uint8))
    print(f"wrote {args.out} (target | start | recovered)")
    return 0 if final_loss < loss0 * 0.5 else 1


if __name__ == "__main__":
    sys.exit(main())
