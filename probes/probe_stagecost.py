"""Where does a mega2 frame go?  Same-window TPU A/B of config ablations:
full frame vs shadows-off (isolates the shadow fold + shade cost) on
bunny/optional, plus a closest-only variant (isolates primary folds).

Run: PYTHONPATH=/root/.axon_site:/root/repo timeout 900 python probes/probe_stagecost.py
"""

import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


import dataclasses
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from raytpu.core import scenes
from raytpu.core.types import RenderConfig
from raytpu.render import pallas_kernel as pk


def bench(fn, scene, frames=16, repeats=3):
    @functools.partial(jax.jit, static_argnames=("n",))
    def run(s, n):
        ts = jnp.linspace(0.0, 2.0 * np.pi, n)

        def body(carry, t):
            out = fn(s.update(t))
            return carry + jnp.sum(out, dtype=jnp.float32), None

        total, _ = jax.lax.scan(body, jnp.float32(0.0), ts)
        return total

    float(run(scene, frames))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run(scene, frames))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3 / frames


def closest_only(scene, config):
    """Just the mega2 closest-hit chain (t accumulator summed)."""
    from raytpu.ops import accel
    import raytpu.render.pallas_kernel as pk

    # call the full renderer with 0-light shade skipped is not exposed;
    # approximate with shadows-off minus shade via rendering in observed_area
    raise NotImplementedError


def main():
    cfg = RenderConfig(width=640, height=480)
    cfg_nosh = dataclasses.replace(cfg, shadows=False)
    for name in ("bunny", "optional"):
        scene = scenes.get(name).build()
        full = bench(lambda s: pk.render_image_mega2_f32(s, cfg), scene)
        nosh = bench(lambda s: pk.render_image_mega2_f32(s, cfg_nosh), scene)
        print(f"{name}: mega2 full {full:.2f} ms, shadows-off {nosh:.2f} ms "
              f"-> shadow stage ~{full-nosh:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
