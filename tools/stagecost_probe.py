"""Calibrated marginal cost of the tier-0 SELECTION stage on the chip.

tools/selmode_probe.py showed per-parent selection is unusable for
production (45% camera suspects vs 0%), but as a TIMING instrument it is
perfect: it runs the identical kernel structure with ~1/8th of the pop
work, so (extract - parent) ~= 7/8 of the true selection cost — the same
real-kernel-sweep methodology as the round-4 kp calibration (synthetic
stubs constant-fold, docs/PERF.md r4 wave 3). Decides whether a cheaper
EXACT top-8 (bitonic octet merge) is worth building.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/stagecost_probe.py
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from raytracing_c_tpu.io.loader import load_scene
from raytracing_c_tpu.ops import traverse_pallas as tp
from raytracing_c_tpu.render import camera as cam
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


def timed(name, fn):
    f = jax.jit(serial_loop(fn))
    np.asarray(f(o_cam, d_cam, act_cam)[:8])
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f(o_cam, d_cam, act_cam)[:8])
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{name}: {best*1e3:8.2f} ms/256k", flush=True)
    return best


for fuse in (False, True):
    rows = {}
    for mode in ("extract", "parent"):
        rows[mode] = timed(
            f"tier0 kp=4 fuse={int(fuse)} sel={mode}",
            lambda o, d, a, m=mode, f=fuse: tp.intersect_bvh_pallas(
                o, d, tris, bvh, a, kp=4, tables=PT, selmode=m,
                fuse_attr=f,
            )["t"],
        )
    d_ms = (rows["extract"] - rows["parent"]) * 1e3
    print(f"  -> selection stage ~= {d_ms * 8 / 7:.2f} ms/256k "
          f"(delta {d_ms:.2f})", flush=True)
