"""A/B the tier-0 leaf-group width on the real chip.

tools/suspect_probe.py measured the SUSPECT RATE falling 11% -> 0.5% going
kp=2 -> kp=4 on helmet bounce rays; this probe measures what that buys in
TIME: tier-0 kernel alone at kp=2/3/4, and the full verified path at
(kp=2, s_cap=r/4) vs (kp=4, s_cap=r/32) — on camera rays (low suspect
rate) and on secondary-bounce rays (the hard case).

Methodology per docs/PERF.md: ITERS serialized inside one jit via a carry
dependence; fence = device->host copy.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/kp_ab.py
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from raytracing_c_tpu.io.loader import load_scene
from raytracing_c_tpu.ops import traverse
from raytracing_c_tpu.ops import traverse_pallas as tp
from raytracing_c_tpu.render import camera as cam
from raytracing_c_tpu.render import integrator
from raytracing_c_tpu.utils.vec3 import Vec3

ITERS = 8
R = 256 * 1024

print("backend:", jax.default_backend())
scene = load_scene(
    "/root/reference/models/helmet.glb", background_path=None,
    warn=lambda *a: None,
)
tris, bvh, PT = scene.triangles, scene.bvh, scene.ptables


def serial_loop(fn):
    def run(o, d, act):
        def body(i, carry):
            t, ox = carry
            # min() keeps the carry finite: miss lanes return t = INF and
            # INF * 0.0 = NaN would poison iterations 2..N
            oo = Vec3(ox + jnp.minimum(t, 1.0) * 0.0, o.y, o.z)
            return fn(oo, d, act), ox

        t, _ = jax.lax.fori_loop(
            0, ITERS, body, (jnp.zeros((R,), jnp.float32), o.x)
        )
        return t

    return run


def timed(name, fn, o, d, act):
    f = jax.jit(serial_loop(fn))
    np.asarray(f(o, d, act)[:8])
    best = np.inf
    for _ in range(2):
        t0 = time.perf_counter()
        np.asarray(f(o, d, act)[:8])
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{name}: {best*1e3:8.2f} ms  ({R / best / 1e6:7.1f} Mrays/s)",
          flush=True)
    return best


# camera rays: geometry-heavy center tile
ids = np.arange(R // 4, dtype=np.int32)
px = jnp.repeat(jnp.asarray(832 + ids % 128), 4)
py = jnp.repeat(jnp.asarray(476 + (ids // 128) % 128), 4)
key = jax.random.PRNGKey(0)
u2 = jax.random.uniform(key, (2, R), jnp.float32)
o_cam, d_cam = cam.generate_rays(scene.camera, 1920, 1080, px, py,
                                 u2[0], u2[1])
act_cam = jnp.ones((R,), bool)

# bounce-1 rays: advance the camera batch one bounce
@jax.jit
def one_bounce(o, d):
    st = {
        "origin": o, "direction": d,
        "throughput": Vec3.full((R,), 1.0), "radiance": Vec3.zeros((R,)),
        "active": jnp.ones((R,), bool), "rays": jnp.float32(0.0),
    }
    u6 = jax.random.uniform(jax.random.fold_in(key, 1), (6, R), jnp.float32)
    st = integrator.bounce_step(scene, st, u6[:4], method="pallas")
    return st["origin"], st["direction"], st["active"]


o_b1, d_b1, act_b1 = one_bounce(o_cam, d_cam)
print("bounce-1 live:", int(jnp.sum(act_b1)))

for label, (o, d, act) in (
    ("camera", (o_cam, d_cam, act_cam)),
    ("bounce1", (o_b1, d_b1, act_b1)),
):
    for kp in (2, 3, 4):
        timed(
            f"{label} tier0 kp={kp}",
            lambda o, d, a, kp=kp: tp.intersect_bvh_pallas(
                o, d, tris, bvh, a, kp=kp, tables=PT
            )["t"],
            o, d, act,
        )
    for kp, cap in ((2, R // 4), (4, R // 32)):
        timed(
            f"{label} verified kp={kp} cap=r/{R // cap}",
            lambda o, d, a, kp=kp, cap=cap: traverse.
            intersect_bvh_pallas_verified(
                o, d, tris, bvh, a, kp=kp, max_suspects=cap, tables=PT
            )["t"],
            o, d, act,
        )

# extended sweep: kp=3 (tier0 measured ~kp=2 cost) with tighter caps
for label, (o, d, act) in (
    ("camera", (o_cam, d_cam, act_cam)),
    ("bounce1", (o_b1, d_b1, act_b1)),
):
    for kp, cap in ((3, R // 16), (3, R // 32), (4, R // 64)):
        timed(
            f"{label} verified kp={kp} cap=r/{R // cap}",
            lambda o, d, a, kp=kp, cap=cap: traverse.
            intersect_bvh_pallas_verified(
                o, d, tris, bvh, a, kp=kp, max_suspects=cap, tables=PT
            )["t"],
            o, d, act,
        )
