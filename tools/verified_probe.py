"""Break down the verified-path overhead over the base Pallas kernel.

The verified tiering (ops/traverse.intersect_bvh_pallas_verified) costs
~10 ms over the 6.3 ms tier-0 kernel at 256k rays (tools/kernel_probe.py).
This probe times cumulative stages to localize it:

  t0        tier-0 kernel only
  +mask     suspect mask
  +compact  nonzero(size=s_cap) + 6-plane ray gather
  +wide     tier-1 kernel on the compacted buffer
  full      production verified (adds scatter-back + cond nesting)

Methodology per docs/PERF.md: ITERS serialized inside one jit via a carry
dependence; fence = device->host copy.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/verified_probe.py
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
    def run(o, d):
        def body(i, carry):
            t, ox = carry
            # min() keeps the carry finite: miss lanes return t = INF and
            # INF * 0.0 = NaN would poison iterations 2..N
            oo = Vec3(ox + jnp.minimum(t, 1.0) * 0.0, o.y, o.z)
            return fn(oo, d), ox

        t, _ = jax.lax.fori_loop(
            0, ITERS, body, (jnp.zeros((R,), jnp.float32), o.x)
        )
        return t

    return run


def timed(name, fn, o, d):
    f = jax.jit(serial_loop(fn))
    np.asarray(f(o, d)[:8])
    t0 = time.perf_counter()
    np.asarray(f(o, d)[:8])
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name}: {dt*1e3:8.2f} ms  ({R / dt / 1e6:7.1f} Mrays/s)")
    return dt


ids = np.arange(R, dtype=np.int64)
w = 1024
px = jnp.asarray((ids % w).astype(np.int32))
py = jnp.asarray(((ids // w) % w).astype(np.int32))
rng = np.random.default_rng(0)
jx = jnp.asarray(rng.random(R, np.float32))
jy = jnp.asarray(rng.random(R, np.float32))
o_cam, d_cam = cam.generate_rays(scene.camera, w, w, px, py, jx, jy)

S_CAP = R // 8


def stage_t0(o, d):
    hit = tp.intersect_bvh_pallas(o, d, tris, bvh, kp=2, tables=PT)
    return hit["t"] + 0.0 * hit["dropped_min"]


def stage_mask(o, d):
    hit = tp.intersect_bvh_pallas(o, d, tris, bvh, kp=2, tables=PT)
    suspect = hit["dropped_min"] < hit["t"]
    return hit["t"] + suspect


def stage_compact(o, d):
    hit = tp.intersect_bvh_pallas(o, d, tris, bvh, kp=2, tables=PT)
    suspect = hit["dropped_min"] < hit["t"]
    idx = jnp.nonzero(suspect, size=S_CAP, fill_value=0)[0]
    o_s = o.gather(idx)
    d_s = d.gather(idx)
    acc = o_s.x + o_s.y + o_s.z + d_s.x + d_s.y + d_s.z
    return hit["t"].at[:S_CAP].add(acc)


def stage_wide(o, d):
    hit = tp.intersect_bvh_pallas(o, d, tris, bvh, kp=2, tables=PT)
    suspect = hit["dropped_min"] < hit["t"]
    idx = jnp.nonzero(suspect, size=S_CAP, fill_value=0)[0]
    act = suspect[idx]
    o_s = o.gather(idx)
    d_s = d.gather(idx)
    wide = tp.intersect_bvh_pallas(
        o_s, d_s, tris, bvh, act, kp=16, ksel=16, tables=PT
    )
    return hit["t"].at[:S_CAP].add(wide["t"])


def stage_scatter(o, d):
    hit = tp.intersect_bvh_pallas(o, d, tris, bvh, kp=2, tables=PT)
    suspect = hit["dropped_min"] < hit["t"]
    idx = jnp.nonzero(suspect, size=S_CAP, fill_value=0)[0]
    act = suspect[idx]
    o_s = o.gather(idx)
    d_s = d.gather(idx)
    wide = tp.intersect_bvh_pallas(
        o_s, d_s, tris, bvh, act, kp=16, ksel=16, tables=PT
    )
    take = act & (wide["t"] <= hit["t"][idx])
    out_t = hit["t"].at[idx].set(jnp.where(take, wide["t"], hit["t"][idx]))
    out_u = hit["u"].at[idx].set(jnp.where(take, wide["u"], hit["u"][idx]))
    out_v = hit["v"].at[idx].set(jnp.where(take, wide["v"], hit["v"][idx]))
    out_tri = hit["tri"].at[idx].set(
        jnp.where(take, wide["tri"], hit["tri"][idx])
    )
    return out_t + out_u + out_v + out_tri


def full(o, d):
    h = traverse.intersect_bvh_pallas_verified(
        o, d, tris, bvh, tables=PT
    )
    return h["t"] + h["u"]


for name, fn in (
    ("tier0 only        ", stage_t0),
    ("+ suspect mask    ", stage_mask),
    ("+ nonzero+gather  ", stage_compact),
    ("+ wide tier       ", stage_wide),
    ("+ scatter back    ", stage_scatter),
    ("full verified     ", full),
):
    timed(name, fn, o_cam, d_cam)
