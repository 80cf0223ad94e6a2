"""Per-stage cost census of ONE full-width bounce on the chip.

Times, with the serialized-in-jit methodology (fori_loop over the op, body
depends on the carry so nothing hoists):

  intersect   verified Pallas traversal (tier-0 + escalation)
  tier0       unverified kernel alone (the escalation overhead = delta)
  attrs       Pallas attr fetch + interpolation
  shade       disney.shade (material row + 4 textures x 4 taps + BRDF)
  shade_notex disney.shade on an EMPTY atlas scene (same math, no taps):
              the texture-tap cost = shade - shade_notex
  bounce      full bounce_step (everything above + miss/bg + bookkeeping)

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/stage_probe.py
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from raytracing_c_tpu.io.loader import load_scene
from raytracing_c_tpu.ops import disney, traverse
from raytracing_c_tpu.ops import traverse_pallas as tp
from raytracing_c_tpu.render import camera as cam
from raytracing_c_tpu.render.integrator import (
    _gather_hit_geometry, bounce_step,
)
from raytracing_c_tpu.utils.vec3 import Vec3

ITERS = 8
R = 256 * 1024

print("backend:", jax.default_backend())
scene = load_scene(
    "/root/reference/models/helmet.glb", background_path=None,
    warn=lambda *a: None,
)

ids = np.arange(R, dtype=np.int64)
w = 1024
px = jnp.asarray((ids % w).astype(np.int32))
py = jnp.asarray(((ids // w) % w).astype(np.int32))
rng = np.random.default_rng(0)
jx = jnp.asarray(rng.random(R, np.float32))
jy = jnp.asarray(rng.random(R, np.float32))
o_cam, d_cam = cam.generate_rays(scene.camera, w, w, px, py, jx, jy)
rand4 = jnp.asarray(rng.random((4, R), np.float32))

# precompute one hit + geom for the shade-only timings
hit0 = jax.jit(
    lambda o, d: traverse.intersect_scene(scene, o, d, method="pallas")
)(o_cam, d_cam)
geom0 = jax.jit(
    lambda o, d, h: _gather_hit_geometry(scene, o, d, h, method="pallas")
)(o_cam, d_cam, hit0)
geom0 = jax.tree.map(jax.block_until_ready, geom0)


def timed(name, fn, *args):
    def loop(*a):
        def body(i, carry):
            out = fn(carry, *a[1:])
            return out

        return jax.lax.fori_loop(0, ITERS, body, a[0])

    f = jax.jit(loop)
    jax.block_until_ready(f(*args))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{name}: {best*1e3:8.2f} ms / 256k  "
          f"({R / best / 1e6:7.1f} Mrays/s)")
    return best


# each carry-dependent wrapper perturbs an input with the carry so the
# loop body cannot be hoisted
def f_tier0(ox, d):
    h = tp.intersect_bvh_pallas(
        Vec3(ox, o_cam.y, o_cam.z), d, scene.triangles, scene.bvh,
        kp=4, tables=scene.ptables,
    )
    return ox + 0.0 * h["t"]


def f_intersect(ox, d):
    h = traverse.intersect_scene(
        scene, Vec3(ox, o_cam.y, o_cam.z), d, method="pallas"
    )
    return ox + 0.0 * h["t"]


def f_attrs(u, _):
    g = tp.fetch_attrs(scene.ptables, hit0["tri"], u, hit0["v"])
    return u + 0.0 * g["uv_u"]


def f_shade(u, sc):
    out = disney.shade(
        sc, d_cam, geom0["normal"].normalized(), geom0["ng"],
        geom0["tangent"], geom0["bitangent"], u, geom0["uv_v"],
        geom0["mat_id"], rand4,
    )
    return u + 0.0 * out["tint"].x


def f_bounce(st, _):
    out = bounce_step(scene, st, rand4, method="pallas")
    return out


def f_intersect_fused(ox, d):
    h = traverse.intersect_scene(
        scene, Vec3(ox, o_cam.y, o_cam.z), d, method="pallas_fused"
    )
    return ox + 0.0 * h["t"]


def f_bounce_fused(st, _):
    out = bounce_step(scene, st, rand4, method="pallas_fused")
    return out


def f_geom(ox, _):
    g = _gather_hit_geometry(
        scene, Vec3(ox, o_cam.y, o_cam.z), d_cam, hit0, method="pallas"
    )
    return ox + 0.0 * g["uv_u"]


state0 = {
    "origin": o_cam,
    "direction": d_cam,
    "throughput": Vec3.full((R,), 1.0),
    "radiance": Vec3.zeros((R,)),
    "active": jnp.ones((R,), bool),
    "rays": jnp.float32(0.0),
}

from raytracing_c_tpu.models.scene import MROW_TEX_ALBEDO  # noqa: E402

scene_notex = scene.replace(
    atlas=type(scene.atlas).empty(),
    materials=scene.materials.replace(
        rows=scene.materials.rows.at[
            :, MROW_TEX_ALBEDO : MROW_TEX_ALBEDO + 4
        ].set(-1.0)
    ),
)

timed("tier0    ", f_tier0, o_cam.x, d_cam)
timed("intersect", f_intersect, o_cam.x, d_cam)
timed("isect_fused", f_intersect_fused, o_cam.x, d_cam)
timed("attrs    ", f_attrs, geom0["uv_u"], None)
timed("geom_gather", f_geom, o_cam.x, None)
timed("shade    ", f_shade, geom0["uv_u"], scene)
timed("shade_notex", f_shade, geom0["uv_u"], scene_notex)
timed("bounce   ", f_bounce, state0, None)
timed("bounce_fused", f_bounce_fused, state0, None)
