"""Probe: closest-hit variants — where do 3.6 ms go, what wins?"""
import pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp
from raytpu.core import scenes
from raytpu.core.types import RenderConfig
from raytpu.ops import intersect, soa
from raytpu.render import renderer

scene = scenes.get("reference").build()
config = RenderConfig(width=640, height=480, soft_shadows=True)
N = 16

def timeit(name, fn):
    @jax.jit
    def run():
        def body(c, _):
            return c + fn(), None
        tot, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=N)
        return tot
    t0 = time.perf_counter(); float(run()); comp = time.perf_counter() - t0
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter(); float(run()); best = min(best, time.perf_counter() - t0)
    print(f"{name:56s} {best/N*1e3:8.2f} ms  (compile {comp:.0f}s)", flush=True)

ro, rd = renderer.generate_rays(scene.camera, config)
ro_b = jnp.broadcast_to(ro, rd.shape)
tmin = jnp.float32(config.ray_min)
ro_c = soa.comps(ro_b)
rd_c = soa.comps(rd)
INF = intersect.INF

def tmat():
    return intersect._scene_t_matrix_T(scene, ro_c, rd_c, tmin, INF, False)

def class_ts():
    return (
        intersect._sphere_t_T(scene.spheres, ro_c, rd_c, tmin, INF),
        intersect._plane_t_T(scene.planes, ro_c, rd_c, tmin, INF),
        intersect._triangle_t_T(scene.triangles, ro_c, rd_c, tmin, INF, False),
    )

timeit("noop scan (floor)", lambda: jnp.float32(1.0) * 2.0)
timeit("t-matrix sum only (concat)", lambda: jnp.sum(jnp.where(jnp.isfinite(tmat()), tmat(), 0.0)))
timeit("per-class t sums (no concat)", lambda: sum(
    jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0)) for t in class_ts()))
timeit("per-class min fold", lambda: jnp.sum(jnp.where(
    jnp.isfinite(m := jnp.minimum(jnp.minimum(
        jnp.min(class_ts()[0], 0), jnp.min(class_ts()[1], 0)), jnp.min(class_ts()[2], 0))), m, 0.0)))
timeit("concat + argmin (current)", lambda: jnp.sum(
    jnp.argmin(tmat(), axis=0).astype(jnp.float32)))
timeit("concat + min (no argmin)", lambda: jnp.sum(
    jnp.where(jnp.isfinite(m := jnp.min(tmat(), 0)), m, 0.0)))
timeit("per-class min+argmin fold", lambda: (lambda ts: (lambda mins, idxs: jnp.sum(
    (jnp.minimum(jnp.minimum(mins[0], mins[1]), mins[2])
     ).astype(jnp.float32)) + jnp.sum(idxs[0].astype(jnp.float32)))(
        [jnp.min(t, 0) for t in ts], [jnp.argmin(t, 0) for t in ts]))(class_ts()))
timeit("current closest_hit full", lambda: jnp.sum(
    intersect.closest_hit(scene, ro_b, rd, tmin).point))

# transposed payload assembly after concat argmin
def ch_transposed():
    tm = tmat()
    t = jnp.min(tm, axis=0)
    idx = jnp.argmin(tm, axis=0)
    hit = jnp.isfinite(t)
    t_safe = jnp.where(hit, t, 0.0)
    p_c = soa.add(ro_c, soa.scale(rd_c, t_safe))
    S, P, T = scene.spheres.count, scene.planes.count, scene.triangles.count
    C = S + P + T
    table = jnp.concatenate([
        jnp.concatenate([scene.spheres.center, scene.spheres.material[:, None].astype(t.dtype)], 1),
        jnp.concatenate([scene.planes.normal, scene.planes.material[:, None].astype(t.dtype)], 1),
        jnp.concatenate([scene.triangles.normal, scene.triangles.material[:, None].astype(t.dtype)], 1),
    ], axis=0)  # (C,4)
    oh = ((jnp.arange(C)[:, None] == idx[None, :]) & hit[None, :]).astype(t.dtype)  # (C,R)
    out = table.T @ oh  # (4,R)
    v_c = (out[0], out[1], out[2])
    material = jnp.round(out[3]).astype(jnp.int32)
    in_s = (idx < S) & hit
    d_c = soa.where(in_s, soa.sub(p_c, v_c), (1.0, 1.0, 1.0))
    n_c = soa.where(in_s, soa.normalize_safe(d_c), v_c)
    return p_c, n_c, t, material, hit

timeit("transposed-payload closest hit (c3 out)", lambda: sum(
    jnp.sum(x) for x in ch_transposed()[0]))
timeit("transposed-payload + pack to (R,3)", lambda: jnp.sum(
    soa.pack(*ch_transposed()[0])) + jnp.sum(soa.pack(*ch_transposed()[1])))
