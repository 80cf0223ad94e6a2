"""Sweep traversal (k, k_leaf): time + suspect rate, coherent & random."""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
import sys

sys.path.insert(0, "/root/repo")
from raytracing_c_tpu.io.loader import load_scene
from raytracing_c_tpu.ops import traverse
from raytracing_c_tpu.render.camera import generate_rays
from raytracing_c_tpu.utils.vec3 import Vec3

R = 262144
key = jax.random.PRNGKey(0)
print("backend:", jax.default_backend())

scene = load_scene("/root/reference/models/helmet.glb",
                   background_path=None, warn=lambda *a: None)

px = jnp.asarray((np.arange(R, dtype=np.int32) % 1920))
py = jnp.asarray((np.arange(R, dtype=np.int32) // 1920) % 1080)
ju = jax.random.uniform(key, (2, R))
o_cam, d_cam = generate_rays(scene.camera, 1920, 1080, px, py, ju[0], ju[1])
g = jax.random.normal(key, (3, R), jnp.float32)
d_rnd = Vec3(g[0], g[1], g[2]).normalized()

# exactness reference for agreement checking (computed once with big k)
import functools


def run(k, kl, d):
    f = jax.jit(functools.partial(
        traverse.intersect_bvh_verified, k=k, k_leaf=kl))

    def g():
        return f(o_cam, d, scene.triangles, scene.bvh)["t"].sum()

    gg = jax.jit(g)
    jax.block_until_ready(gg())
    t0 = time.perf_counter()
    for _ in range(5):
        out = gg()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / 5 * 1e3


def suspects(k, kl, d):
    @jax.jit
    def s():
        h = traverse.intersect_bvh_topk(
            o_cam, d, scene.triangles, scene.bvh, k=k, k_leaf=kl,
            with_bound=True)
        return jnp.mean((h["dropped_min"] < h["t"]).astype(jnp.float32))
    return float(s())


for (k, kl) in [(8, 16), (8, 8), (6, 8), (4, 8), (4, 4)]:
    t_cam = run(k, kl, d_cam)
    t_rnd = run(k, kl, d_rnd)
    s_cam = suspects(k, kl, d_cam)
    s_rnd = suspects(k, kl, d_rnd)
    print(f"k={k} kl={kl}: cam {t_cam:.1f} ms rnd {t_rnd:.1f} ms "
          f"suspects cam {s_cam:.5f} rnd {s_rnd:.5f}")
