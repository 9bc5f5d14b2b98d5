"""Probe: where the train-step time goes (real TPU)."""
import functools, time
import dataclasses
import jax, jax.numpy as jnp
import optax
from raytpu.core import scenes
from raytpu.core.types import RenderConfig
from raytpu.grad import diff_render

scene = scenes.get("reference").build()
config = RenderConfig(width=640, height=480, soft_shadows=True)
N = 16
target = jax.block_until_ready(diff_render.render_soft(scene, config))

def timeit(name, step, init):
    @jax.jit
    def run(carry):
        def body(c, _):
            return step(c), None
        c, _ = jax.lax.scan(body, carry, None, length=N)
        return jax.tree_util.tree_map(lambda x: jnp.sum(x) if hasattr(x, 'sum') else x, c)
    t0 = time.perf_counter(); jax.block_until_ready(run(init)); comp = time.perf_counter()-t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); jax.block_until_ready(jax.tree_util.tree_map(lambda x: x, run(init)))
        r = run(init); jax.tree_util.tree_map(lambda x: float(jnp.asarray(x).ravel()[0]) if hasattr(x, 'ravel') else x, r)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:50s} {best/N/2*1e3:8.2f} ms", flush=True)  # /2: two run() calls per loop

def loss_both(params):
    s = diff_render.merge_material_params(scene, params)
    return jnp.mean((diff_render.render_soft(s, config) - target) ** 2)

p0 = diff_render.material_params(scene)

# grads wrt color+params, MSE loss, no optimizer
timeit("vg color+params (MSE)", lambda p: jax.tree_util.tree_map(lambda a, g: a - 0.0 * g, p, jax.grad(loss_both)(p)), p0)

# color only, MSE
def loss_color(c):
    p = dict(p0); p = {**p0, "color": c}
    return loss_both(p)
timeit("vg color only (MSE)", lambda c: c - 0.0 * jax.grad(loss_color)(c), p0["color"])

# full train step (adam)
opt = optax.adam(1e-2)
step_fn = diff_render.make_train_step(config, opt, diff_render.material_params, diff_render.merge_material_params)
# carry = (params, opt_state); scene/target closed over as jit constants? pass via carry-free closure
@jax.jit
def run_full(params, opt_state):
    def body(c, _):
        params, opt_state = c
        loss, grads = jax.value_and_grad(lambda p: loss_both(p))(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return (params, opt_state), loss
    (params, opt_state), losses = jax.lax.scan(body, (params, opt_state), None, length=N)
    return losses
os0 = opt.init(p0)
t0 = time.perf_counter(); float(run_full(p0, os0)[-1]); print("full compile", time.perf_counter()-t0, flush=True)
best = 1e9
for _ in range(3):
    t0 = time.perf_counter(); float(run_full(p0, os0)[-1]); best = min(best, time.perf_counter()-t0)
print(f"{'full train step (adam)':50s} {best/N*1e3:8.2f} ms", flush=True)
