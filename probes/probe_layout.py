"""Probe: (R,3)/(R,N) layout vs component-SoA (R,) layout for the jnp hot ops."""
import pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp
from raytpu.core import scenes
from raytpu.core.types import RenderConfig
from raytpu.ops import intersect, shading
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
    print(f"{name:52s} {best/N*1e3:8.2f} ms  (compile {comp:.0f}s)", flush=True)

ro, rd = renderer.generate_rays(scene.camera, config)
ro_b = jnp.broadcast_to(ro, rd.shape)
rec = jax.jit(lambda: intersect.closest_hit(scene, ro_b, rd, config.ray_min))()
l, mag = shading.direction_to_light(scene.lights, 0, rec.point)
beta = jnp.float32(config.soft_beta)
tmin = jnp.float32(config.ray_min)

timeit("noop scan (floor)", lambda: jnp.float32(1.0) * 2.0)
timeit("soft_transmittance (R,N) current", lambda: jnp.sum(
    intersect.soft_transmittance(scene, rec.point, l, tmin, mag, beta)))

# component-SoA variant: rays as (R,) x/y/z, prims folded in a python loop
def soft_soa():
    px, py, pz = rec.point[:, 0], rec.point[:, 1], rec.point[:, 2]
    lx, ly, lz = l[:, 0], l[:, 1], l[:, 2]
    trans = jnp.ones_like(px)
    sp = scene.spheres
    for s in range(sp.count):
        cx, cy, cz, r = sp.center[s, 0], sp.center[s, 1], sp.center[s, 2], sp.radius[s]
        Lx, Ly, Lz = cx - px, cy - py, cz - pz
        proj = lx * Lx + ly * Ly + lz * Lz
        perp2 = Lx * Lx + Ly * Ly + Lz * Lz - proj * proj
        r2 = r * r
        margin = (r2 - perp2) / r2
        inside = margin > 0.0
        t = proj - jnp.sqrt(jnp.where(inside, r2 - perp2, 1.0))
        gate = inside & (t >= tmin) & (t <= mag)
        occ = jnp.minimum(jax.nn.sigmoid(beta * margin), 1.0 - 1e-6) * gate
        trans = trans * (1.0 - occ)
    pl_ = scene.planes
    for p in range(pl_.count):
        nx, ny, nz = pl_.normal[p, 0], pl_.normal[p, 1], pl_.normal[p, 2]
        ox, oy, oz = pl_.origin[p, 0], pl_.origin[p, 1], pl_.origin[p, 2]
        denom = lx * nx + ly * ny + lz * nz
        num = (ox - px) * nx + (oy - py) * ny + (oz - pz) * nz
        dn = jnp.abs(denom) > intersect.FLT_EPSILON
        t = num / jnp.where(dn, denom, 1.0)
        margin = jnp.minimum(t - tmin, mag - t)
        gate = dn & (margin > 0.0)
        occ = jnp.minimum(jax.nn.sigmoid(beta * margin), 1.0 - 1e-6) * gate
        trans = trans * (1.0 - occ)
    tr = scene.triangles
    for k in range(tr.count):
        v0x, v0y, v0z = tr.v0[k, 0], tr.v0[k, 1], tr.v0[k, 2]
        e1x, e1y, e1z = tr.v1[k, 0] - v0x, tr.v1[k, 1] - v0y, tr.v1[k, 2] - v0z
        e2x, e2y, e2z = tr.v2[k, 0] - v0x, tr.v2[k, 1] - v0y, tr.v2[k, 2] - v0z
        nx_, ny_, nz_ = tr.normal[k, 0], tr.normal[k, 1], tr.normal[k, 2]
        cd = nx_ * lx + ny_ * ly + nz_ * lz
        npar = jnp.abs(cd) >= intersect.FLT_EPSILON
        cull = tr.cull[k]
        cull_eff = jnp.where(cull == 2, 2, 1 - cull)
        culled = ((cull_eff == 0) & (cd < 0)) | ((cull_eff == 1) & (cd > 0))
        hx = ly * e2z - lz * e2y
        hy = lz * e2x - lx * e2z
        hz = lx * e2y - ly * e2x
        a = e1x * hx + e1y * hy + e1z * hz
        det_ok = jnp.abs(a) >= intersect.FLT_EPSILON
        inv_a = 1.0 / jnp.where(det_ok, a, 1.0)
        sx, sy, sz = px - v0x, py - v0y, pz - v0z
        u = inv_a * (sx * hx + sy * hy + sz * hz)
        qx = sy * e1z - sz * e1y
        qy = sz * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        v = inv_a * (lx * qx + ly * qy + lz * qz)
        t = inv_a * (e2x * qx + e2y * qy + e2z * qz)
        margin = jnp.minimum(jnp.minimum(u, v), 1.0 - u - v)
        gate = npar & ~culled & det_ok & (t >= tmin) & (t < mag)
        occ = jnp.minimum(jax.nn.sigmoid(beta * margin), 1.0 - 1e-6) * gate
        trans = trans * (1.0 - occ)
    return trans

timeit("soft_transmittance SoA python-unrolled", lambda: jnp.sum(soft_soa()))

# same for the closest-hit t-matrix: current vs SoA fold-min
timeit("scene_t_matrix (R,N) current + argmin", lambda: jnp.sum(
    jnp.argmin(intersect.scene_t_matrix(scene, ro_b, rd, config.ray_min, intersect.INF, False), axis=1).astype(jnp.float32)))
