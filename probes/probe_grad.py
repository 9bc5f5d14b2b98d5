"""Probe: fast differentiable path fwd+bwd ms/frame on real TPU."""
import functools, sys, time
import jax, jax.numpy as jnp, numpy as np
import optax
from raytpu.core import scenes
from raytpu.core.types import RenderConfig
from raytpu.grad import diff_render

name = sys.argv[1] if len(sys.argv) > 1 else "reference"
wh = sys.argv[2] if len(sys.argv) > 2 else "640x480"
STEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 16
W, H = (int(v) for v in wh.split("x"))
scene = scenes.get(name).build()
config = RenderConfig(width=W, height=H, soft_shadows=True)
target = jax.block_until_ready(diff_render.render_soft(scene, config))
opt = optax.adam(1e-2)
params0 = diff_render.material_params(scene)
opt_state0 = opt.init(params0)

def loss_fn(params, scene, target):
    return diff_render.image_loss(diff_render.merge_material_params(scene, params), target, config)

@functools.partial(jax.jit, static_argnames=("n",))
def run(params, opt_state, scene, target, n):
    def body(carry, _):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(loss_fn)(params, scene, target)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return (params, opt_state), loss
    (params, opt_state), losses = jax.lax.scan(body, (params, opt_state), None, length=n)
    return losses

t0 = time.perf_counter()
l = run(params0, opt_state0, scene, target, STEPS)
print("first loss", float(l[0]), "last", float(l[-1]), f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    float(run(params0, opt_state0, scene, target, STEPS)[-1])
    best = min(best, time.perf_counter() - t0)
print(f"{name} {W}x{H} fast fwd+bwd+opt: {best/STEPS*1e3:8.2f} ms/step", flush=True)
