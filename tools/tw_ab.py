"""Tile-wavefront traversal on-chip A/B (docs/PERF.md r5: the successor
the stage_mt marginals named). Production 32x32-tile pixel order, central
helmet tiles, 16k px x 16 spp = 256k rays; per-lane kp=4 baseline vs TW
at UL in {4, 6, 8}, tier-0 fused + verified + suspect rates.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/tw_ab.py [model]
(model defaults to helmet.glb; pass /root/reference/models/tower.obj for
the secondary-scene check — docs/PERF.md r5 wave 2 ran both)
"""

import sys
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
from raytracing_c_tpu.render.renderer import _pixel_tables
from raytracing_c_tpu.utils.vec3 import Vec3

ITERS = 8
SPP = 16
NPX = 16 * 1024
R = NPX * SPP

print("backend:", jax.default_backend(), flush=True)
MODEL = sys.argv[1] if len(sys.argv) > 1 else \
    "/root/reference/models/helmet.glb"
scene = load_scene(MODEL, background_path=None, warn=lambda *a: None)
tris, bvh, PT = scene.triangles, scene.bvh, scene.ptables

xs_all, ys_all, _ = _pixel_tables(1920, 1080, pad=1)
n_img = 1920 * 1080
xs_all, ys_all = np.asarray(xs_all[:n_img]), np.asarray(ys_all[:n_img])
center = np.argmin((xs_all - 960.0) ** 2 + (ys_all - 540.0) ** 2)
b0 = max(0, min(int(center) - NPX // 2, n_img - NPX))
px = jnp.repeat(jnp.asarray(xs_all[b0:b0 + NPX]), SPP)
py = jnp.repeat(jnp.asarray(ys_all[b0:b0 + NPX]), SPP)
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


def suspect_rate(o, d, act, tw, ul):
    tp.TW_UL = ul
    hit = jax.jit(
        lambda o, d, a: tp.intersect_bvh_pallas(
            o, d, tris, bvh, a, kp=4, tables=PT, fuse_attr=True,
            tile_wavefront=tw,
        )
    )(o, d, act)
    sus = np.asarray(hit["dropped_min"] < hit["t"]) & np.asarray(act)
    return sus.sum() / max(int(np.asarray(act).sum()), 1)


print(
    "camera(prod) suspects: per-lane "
    f"{suspect_rate(o_cam, d_cam, act_cam, False, 8)*100:.3f}% | "
    f"tw UL=4 {suspect_rate(o_cam, d_cam, act_cam, True, 4)*100:.3f}% | "
    f"tw UL=6 {suspect_rate(o_cam, d_cam, act_cam, True, 6)*100:.3f}% | "
    f"tw UL=8 {suspect_rate(o_cam, d_cam, act_cam, True, 8)*100:.3f}%",
    flush=True,
)

for name, tw, ul in (
    ("per-lane", False, 8), ("tw UL=4", True, 4),
    ("tw UL=6", True, 6), ("tw UL=8", True, 8),
):
    tp.TW_UL = ul
    timed(
        f"camera(prod) tier0 fused {name}",
        lambda o, d, a, t=tw: tp.intersect_bvh_pallas(
            o, d, tris, bvh, a, kp=4, tables=PT, fuse_attr=True,
            tile_wavefront=t,
        )["t"],
        o_cam, d_cam, act_cam,
    )
for name, tw, ul in (
    ("per-lane", False, 8), ("tw UL=6", True, 6), ("tw UL=8", True, 8),
):
    tp.TW = tw
    tp.TW_UL = ul
    timed(
        f"camera(prod) verified fused {name}",
        lambda o, d, a: traverse.intersect_bvh_pallas_verified(
            o, d, tris, bvh, a, tables=PT, fuse_attr=True,
        )["t"],
        o_cam, d_cam, act_cam,
    )
tp.TW = False
tp.TW_UL = 8
