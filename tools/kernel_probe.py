"""On-chip microbenchmark of the fused Pallas traversal kernel.

Times intersect per-ray cost for camera and bounce-like ray batches on
helmet.glb, comparing the Pallas kernel (base + verified) against the XLA
top-k production path of round 1. Methodology per docs/PERF.md "Round 2":
iterations are serialized inside ONE jit via a data dependence on the
carried output (so nothing hoists), and the fence is a device->host copy.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/kernel_probe.py
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from raytracing_c_tpu.io.loader import load_scene
from raytracing_c_tpu.render import camera as cam
from raytracing_c_tpu.ops import traverse
from raytracing_c_tpu.ops import traverse_pallas as tp
from raytracing_c_tpu.utils.vec3 import Vec3

ITERS = 8
R = 256 * 1024

print("backend:", jax.default_backend())
scene = load_scene(
    "/root/reference/models/helmet.glb", background_path=None,
    warn=lambda *a: None,
)
tris, bvh, PT = scene.triangles, scene.bvh, scene.ptables
print("tables:", PT.root.shape, [t.shape for t in PT.levels], PT.leaf.shape)


def timed(name, fn, o, d):
    f = jax.jit(fn)
    np.asarray(f(o, d)[:8])  # compile + fence
    t0 = time.perf_counter()
    np.asarray(f(o, d)[:8])
    dt = (time.perf_counter() - t0) / ITERS
    print(
        f"{name}: {dt*1e3:8.2f} ms/intersect  "
        f"({R / dt / 1e6:7.1f} Mrays/s)"
    )
    return dt


def serial_loop(intersect):
    """Chain ITERS intersects through a data dependence."""

    def run(o, d):
        def body(i, carry):
            t, ox = carry
            # min() keeps the carry finite: miss lanes return t = INF and
            # INF * 0.0 = NaN would poison iterations 2..N
            oo = Vec3(ox + jnp.minimum(t, 1.0) * 0.0, o.y, o.z)
            h = intersect(oo, d)
            return h["t"], ox

        t, _ = jax.lax.fori_loop(
            0, ITERS, body, (jnp.zeros((R,), jnp.float32), o.x)
        )
        return t

    return run


# camera rays
ids = np.arange(R, dtype=np.int64)
w = 1024
px = jnp.asarray((ids % w).astype(np.int32))
py = jnp.asarray(((ids // w) % w).astype(np.int32))
rng = np.random.default_rng(0)
jx = jnp.asarray(rng.random(R, np.float32))
jy = jnp.asarray(rng.random(R, np.float32))
o_cam, d_cam = cam.generate_rays(scene.camera, w, w, px, py, jx, jy)

# bounce-like rays: random dirs from camera-hit points (computed on chip)
hit0 = jax.jit(
    lambda o, d: tp.intersect_bvh_pallas(o, d, tris, bvh, kp=8, ksel=16, tables=PT)
)(o_cam, d_cam)
t0v = jnp.where(jnp.isfinite(hit0["t"]), hit0["t"], 1.0)
pts = Vec3(o_cam.x + d_cam.x * t0v, o_cam.y + d_cam.y * t0v,
           o_cam.z + d_cam.z * t0v)
rd = rng.normal(size=(3, R)).astype(np.float32)
rd /= np.linalg.norm(rd, axis=0, keepdims=True)
d_b = Vec3(jnp.asarray(rd[0]), jnp.asarray(rd[1]), jnp.asarray(rd[2]))
o_b = Vec3(pts.x + d_b.x * 1e-3, pts.y + d_b.y * 1e-3, pts.z + d_b.z * 1e-3)

for name, o, d in (("camera", o_cam, d_cam), ("bounce", o_b, d_b)):
    sus = {}
    for kp in (1, 2, 3):
        h = jax.jit(
            lambda o, d, kp=kp: tp.intersect_bvh_pallas(o, d, tris, bvh, kp=kp, tables=PT)
        )(o, d)
        sus[kp] = float(jnp.mean((h["dropped_min"] < h["t"])))
    print(f"[{name}] suspect rates: " +
          " ".join(f"kp{k}={v:.4f}" for k, v in sus.items()))
    for kp in (1, 2, 3):
        timed(
            f"[{name}] pallas kp={kp}        ",
            serial_loop(lambda o, d, kp=kp: tp.intersect_bvh_pallas(
                o, d, tris, bvh, kp=kp, tables=PT)),
            o, d,
        )
    timed(
        f"[{name}] pallas ksel16 kp8   ",
        serial_loop(lambda o, d: tp.intersect_bvh_pallas(
            o, d, tris, bvh, kp=8, ksel=16, tables=PT)),
        o, d,
    )
    timed(
        f"[{name}] pallas VERIFIED kp=2",
        serial_loop(lambda o, d: traverse.intersect_bvh_pallas_verified(
            o, d, tris, bvh, tables=PT)),
        o, d,
    )
    timed(
        f"[{name}] XLA topk k8/kl8     ",
        serial_loop(lambda o, d: traverse.intersect_bvh_topk(
            o, d, tris, bvh)),
        o, d,
    )


# --- tile-size sweep (run with PROBE_TILES=1) ------------------------------
if __name__ == "__main__" and __import__("os").environ.get("PROBE_TILES"):
    for tile in (256, 512, 1024, 2048):
        timed(
            f"[camera] pallas kp=2 tile={tile:5d}",
            serial_loop(lambda o, d, tile=tile: tp.intersect_bvh_pallas(
                o, d, tris, bvh, kp=2, tables=PT, tile=tile)),
            o_cam, d_cam,
        )
