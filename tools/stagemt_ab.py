"""On-chip A/B of the union-MT tier-0 (traverse_pallas.STAGE_MT).

stage_mt replaces the per-lane kp-group refetch (kp contraction-128
matmuls + per-lane int8x4 word assembly of (576, R) planes + kp*64 MT
tests per lane) with ONE tile-level union staging: assemble the union
buffer to f32 once ((576, U) elements) and run every lane's MT against
all U*64 staged triangles. Cost model (PERF r4 numbers): saves
refetch ~2.0 + assembly ~2.8 ms/256k, pays (U/4 - 1) * ~1.4 ms/256k of
extra MT — so U is the knob. The union census (tools/union_probe.py)
says U=8 covers 99.8% of helmet tiles at kp=4.

Times tier-0 kp=4 (fused) per-lane vs stage_mt at U in {4, 8, 12, 16},
camera rays; then the verified path (repair bill included — stage_mt
moves the suspect profile: in-union credit removes suspects, slot
overflow adds them) on camera and bounce-1 distributions, plus suspect
rates for each config.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/stagemt_ab.py
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


def suspect_rate(o, d, act, smt):
    hit = jax.jit(
        lambda o, d, a: tp.intersect_bvh_pallas(
            o, d, tris, bvh, a, kp=4, tables=PT, fuse_attr=True,
            stage_mt=smt,
        )
    )(o, d, act)
    sus = np.asarray(hit["dropped_min"] < hit["t"]) & np.asarray(act)
    return sus.sum() / max(int(np.asarray(act).sum()), 1)


# --- tier-0 kp=4 fused: per-lane baseline, then stage_mt U sweep ---------
timed(
    "tier0 kp=4 fused per-lane (shared)",
    lambda o, d, a: tp.intersect_bvh_pallas(
        o, d, tris, bvh, a, kp=4, tables=PT, fuse_attr=True,
        stage_mt=False,
    )["t"],
    o_cam, d_cam, act_cam,
)
for u in (4, 8, 12, 16):
    tp.STAGE_MT_U = u
    timed(
        f"tier0 kp=4 fused stage_mt U={u}",
        lambda o, d, a: tp.intersect_bvh_pallas(
            o, d, tris, bvh, a, kp=4, tables=PT, fuse_attr=True,
            stage_mt=True,
        )["t"],
        o_cam, d_cam, act_cam,
    )
tp.STAGE_MT_U = 8


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
    for smt in (False, True):
        print(
            f"{label} stage_mt={int(smt)} suspect rate: "
            f"{suspect_rate(o, d, act, smt)*100:.3f}%",
            flush=True,
        )
    for smt in (False, True):
        tp.STAGE_MT = smt
        timed(
            f"{label} verified fused stage_mt={int(smt)}",
            lambda o, d, a: traverse.intersect_bvh_pallas_verified(
                o, d, tris, bvh, a, tables=PT, fuse_attr=True,
            )["t"],
            o, d, act,
        )
tp.STAGE_MT = False
