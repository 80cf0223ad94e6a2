"""Component timings at production batch size + escalation statistics."""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
import sys

sys.path.insert(0, "/root/repo")
from raytracing_c_tpu.io.loader import load_scene
from raytracing_c_tpu.ops import disney, traverse
from raytracing_c_tpu.render.camera import generate_rays
from raytracing_c_tpu.utils.vec3 import Vec3

R = 262144
key = jax.random.PRNGKey(0)
print("backend:", jax.default_backend())

scene = load_scene("/root/reference/models/helmet.glb",
                   background_path=None, warn=lambda *a: None)

# coherent camera rays over the full frame
px = jnp.asarray((np.arange(R, dtype=np.int32) % 1920))
py = jnp.asarray((np.arange(R, dtype=np.int32) // 1920) % 1080)
ju = jax.random.uniform(key, (2, R))
o_cam, d_cam = generate_rays(scene.camera, 1920, 1080, px, py, ju[0], ju[1])

# incoherent rays (bounce-like)
g = jax.random.normal(key, (3, R), jnp.float32)
d_rnd = Vec3(g[0], g[1], g[2]).normalized()


def bench(name, fn, reps=5):
    f = jax.jit(fn)
    out = jax.block_until_ready(f())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt*1e3:.1f} ms")


def fast(o, d):
    return traverse.intersect_bvh_topk(
        o, d, scene.triangles, scene.bvh)["t"].sum()


def verified(o, d):
    return traverse.intersect_bvh_verified(
        o, d, scene.triangles, scene.bvh)["t"].sum()


bench("fast cam", lambda: fast(o_cam, d_cam))
bench("verified cam", lambda: verified(o_cam, d_cam))
bench("fast rnd", lambda: fast(o_cam, d_rnd))
bench("verified rnd", lambda: verified(o_cam, d_rnd))


@jax.jit
def suspect_stats(o, d):
    h = traverse.intersect_bvh_topk(
        o, d, scene.triangles, scene.bvh, with_bound=True)
    return jnp.mean((h["dropped_min"] < h["t"]).astype(jnp.float32))

print("suspect rate cam:", float(suspect_stats(o_cam, d_cam)))
print("suspect rate rnd:", float(suspect_stats(o_cam, d_rnd)))


def shade_only():
    uni = jax.random.uniform(key, (4, R))
    tri = jnp.zeros((R,), jnp.int32)
    n = Vec3.splat((0, 0, 1), (R,))
    out = disney.shade(
        scene, d_cam, n, n, Vec3.splat((1, 0, 0), (R,)),
        Vec3.splat((0, 1, 0), (R,)),
        jnp.zeros((R,)), jnp.zeros((R,)), tri, uni,
    )
    return out["tint"].x.sum() + out["direction"].z.sum()

bench("shade only", shade_only)
