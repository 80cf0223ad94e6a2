"""Compare repair-machinery designs for the verified Pallas path.

tools/verified_probe.py localized the verified path's ~10 ms overhead to
per-lane indexed ops (nonzero+6-plane gather 3.9 ms, 4-plane scatter
5.2 ms at s_cap=32k). Candidates measured here, end-to-end per variant:

  cfg:kpK/capC   current machinery at tier-0 kp=K, s_cap=R/C
  sortcomp       full-batch lax.sort by suspect flag (payload: rays + hit
                 + orig idx), wide pass on a STATIC slice of the first
                 R/8 lanes, merge in-lane, restore by sorting on orig idx
  rowpack        pack rays+hit into (R,16) rows; ONE row gather at
                 nonzero indices; wide; ONE row scatter back

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/repair_probe.py
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


def consume(h):
    return h["t"] + h["u"] + h["v"] + h["tri"]


def cfg(kp, cap_div):
    def run(o, d):
        return consume(
            traverse.intersect_bvh_pallas_verified(
                o, d, tris, bvh, kp=kp, max_suspects=R // cap_div,
                tables=PT,
            )
        )

    return run


def sortcomp(o, d):
    S = R // 8
    hit = tp.intersect_bvh_pallas(o, d, tris, bvh, kp=2, tables=PT)
    suspect = hit["dropped_min"] < hit["t"]
    # sort suspects to the front (descending flag); stable so lanes keep
    # camera coherence within each class
    key = 1 - suspect.astype(jnp.int32)
    orig = jnp.arange(R, dtype=jnp.int32)
    (ks, ox, oy, oz, dx, dy, dz, t0, u0, v0, tr0, oi) = jax.lax.sort(
        (key, o.x, o.y, o.z, d.x, d.y, d.z,
         hit["t"], hit["u"], hit["v"], hit["tri"].astype(jnp.float32),
         orig),
        num_keys=1, is_stable=True,
    )
    o_s = Vec3(ox[:S], oy[:S], oz[:S])
    d_s = Vec3(dx[:S], dy[:S], dz[:S])
    act = ks[:S] == 0
    wide = tp.intersect_bvh_pallas(
        o_s, d_s, tris, bvh, act, kp=16, ksel=16, tables=PT
    )
    take = act & (wide["t"] <= t0[:S])
    t1 = t0.at[:S].set(jnp.where(take, wide["t"], t0[:S]))
    u1 = u0.at[:S].set(jnp.where(take, wide["u"], u0[:S]))
    v1 = v0.at[:S].set(jnp.where(take, wide["v"], v0[:S]))
    tr1 = tr0.at[:S].set(
        jnp.where(take, wide["tri"].astype(jnp.float32), tr0[:S])
    )
    # restore original order
    (_, t2, u2, v2, tr2) = jax.lax.sort(
        (oi, t1, u1, v1, tr1), num_keys=1
    )
    return t2 + u2 + v2 + tr2


def rowpack(o, d):
    S = R // 8
    hit = tp.intersect_bvh_pallas(o, d, tris, bvh, kp=2, tables=PT)
    suspect = hit["dropped_min"] < hit["t"]
    rows = jnp.stack(
        [o.x, o.y, o.z, d.x, d.y, d.z, hit["t"]], axis=1
    )  # (R, 7)
    idx = jnp.nonzero(suspect, size=S, fill_value=0)[0]
    g = rows[idx]  # one row gather, sorted indices
    act = suspect[idx]
    o_s = Vec3(g[:, 0], g[:, 1], g[:, 2])
    d_s = Vec3(g[:, 3], g[:, 4], g[:, 5])
    wide = tp.intersect_bvh_pallas(
        o_s, d_s, tris, bvh, act, kp=16, ksel=16, tables=PT
    )
    take = act & (wide["t"] <= g[:, 6])
    res = jnp.stack(
        [jnp.where(take, wide["t"], g[:, 6]),
         jnp.where(take, wide["u"], 0.0),
         jnp.where(take, wide["v"], 0.0),
         jnp.where(take, wide["tri"].astype(jnp.float32), -1.0),
         take.astype(jnp.float32)],
        axis=1,
    )  # (S, 5)
    outrows = jnp.stack(
        [hit["t"], hit["u"], hit["v"], hit["tri"].astype(jnp.float32),
         jnp.zeros((R,), jnp.float32)],
        axis=1,
    )
    merged = jnp.where(res[:, 4:5] > 0, res, outrows[idx])
    outrows = outrows.at[idx].set(merged)  # one row scatter
    return outrows[:, 0] + outrows[:, 1] + outrows[:, 2] + outrows[:, 3]


for name, fn in (
    ("cfg kp2 cap/8 (prod)", cfg(2, 8)),
    ("cfg kp3 cap/16     ", cfg(3, 16)),
    ("cfg kp4 cap/32     ", cfg(4, 32)),
    ("sortcomp kp2       ", sortcomp),
    ("rowpack kp2        ", rowpack),
):
    timed(name, fn, o_cam, d_cam)
