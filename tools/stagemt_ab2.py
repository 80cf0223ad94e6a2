"""stage_mt A/B part 2: verified cost + suspect rates at U=4 vs U=8.

Part 1 (tools/stagemt_ab.py, same session): tier-0 kp=4 fused per-lane
10.99 ms/256k, stage_mt U=4 9.29, U=8 11.91, U=12 11.57, U=16 VMEM OOM
(39.7M scoped > 16M). U=4 keeps the per-lane path's 256 MT tests/lane
while deleting the refetch+assembly; U>=8 pays more MT than it saves.
The open question is the repair bill: U=4 overflows the slot buffer on
more tiles (union p95=7 at kp=4 per tools/union_probe.py), and every
overflow lane rides the certificate into tier-1.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/stagemt_ab2.py
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

print("backend:", jax.default_backend(), flush=True)
scene = load_scene(
    "/root/reference/models/helmet.glb", background_path=None,
    warn=lambda *a: None,
)
tris, bvh, PT = scene.triangles, scene.bvh, scene.ptables

ids = np.arange(R // 4, dtype=np.int32)
px = jnp.repeat(jnp.asarray(832 + ids % 128), 4)
py = jnp.repeat(jnp.asarray(476 + (ids // 128) % 128), 4)
key = jax.random.PRNGKey(0)
u2 = jax.random.uniform(key, (2, R), jnp.float32)
o_cam, d_cam = cam.generate_rays(scene.camera, 1920, 1080, px, py,
                                 u2[0], u2[1])
act_cam = jnp.ones((R,), bool)


def serial_loop(fn):
    def run(o, d, act):
        def body(i, carry):
            t, ox = carry
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
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f(o, d, act)[:8])
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{name}: {best*1e3:8.2f} ms/256k", flush=True)
    return best


def suspect_rate(o, d, act, smt, u):
    tp.STAGE_MT_U = u
    hit = jax.jit(
        lambda o, d, a: tp.intersect_bvh_pallas(
            o, d, tris, bvh, a, kp=4, tables=PT, fuse_attr=True,
            stage_mt=smt,
        )
    )(o, d, act)
    sus = np.asarray(hit["dropped_min"] < hit["t"]) & np.asarray(act)
    return sus.sum() / max(int(np.asarray(act).sum()), 1)


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
print("bounce-1 live:", int(jnp.sum(act_b1)), flush=True)

for label, (o, d, act) in (
    ("camera", (o_cam, d_cam, act_cam)),
    ("bounce1", (o_b1, d_b1, act_b1)),
):
    print(
        f"{label} suspect rates: per-lane "
        f"{suspect_rate(o, d, act, False, 8)*100:.3f}% | "
        f"smt U=4 {suspect_rate(o, d, act, True, 4)*100:.3f}% | "
        f"smt U=8 {suspect_rate(o, d, act, True, 8)*100:.3f}%",
        flush=True,
    )
    for name, smt, u in (
        ("per-lane", False, 8), ("smt U=4", True, 4), ("smt U=8", True, 8),
    ):
        tp.STAGE_MT = smt
        tp.STAGE_MT_U = u
        timed(
            f"{label} verified fused {name}",
            lambda o, d, a: traverse.intersect_bvh_pallas_verified(
                o, d, tris, bvh, a, tables=PT, fuse_attr=True,
            )["t"],
            o, d, act,
        )
tp.STAGE_MT = False
tp.STAGE_MT_U = 8
