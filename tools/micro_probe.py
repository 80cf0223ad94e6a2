"""Microbenchmarks for suspect TPU ops: gather, argsort, MT, slab, topk."""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

R = 65536
N = 32768

print("backend:", jax.default_backend())
key = jax.random.PRNGKey(0)


def bench(name, fn, *args):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(5):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 5
    print(f"{name}: {dt*1e3:.2f} ms")
    return dt


table = jax.random.normal(key, (N,), jnp.float32)
idx128 = jax.random.randint(key, (128, R), 0, N, jnp.int32)
idx8 = idx128[:8]

bench("gather (128,R) from (N,)", lambda t, i: t[i].sum(), table, idx128)
bench("gather (8,R) from (N,)", lambda t, i: t[i].sum(), table, idx8)

nodes = jax.random.normal(key, (48, 585), jnp.float32)
nidx = jax.random.randint(key, (8, R), 0, 585, jnp.int32)
bench("node gather (48,8,R) from (48,585)",
      lambda t, i: t[:, i].sum(), nodes, nidx)

d = jax.random.normal(key, (64, R), jnp.float32)
bench("argsort (64,R) axis0", lambda x: jnp.argsort(x, axis=0).sum(), d)
bench("sort (64,R) axis0", lambda x: jnp.sort(x, axis=0).sum(), d)
bench("top8 via argsort slice",
      lambda x: jnp.argsort(x, axis=0)[:8].sum(), d)

# dense MT math without gathers: (128, R) components
def mt_math(ox, dx, v0x):
    # fake but similarly-shaped arithmetic: ~40 flops per lane
    a = ox * dx + v0x
    for _ in range(10):
        a = a * dx + v0x
    return a.sum()

ox = jax.random.normal(key, (128, R), jnp.float32)
bench("dense elementwise (128,R) ~20 flops", mt_math, ox, ox, ox)

# full topk on a real scene
import sys
sys.path.insert(0, "/root/repo")
from raytracing_c_tpu.io.loader import load_scene
from raytracing_c_tpu.ops import traverse
from raytracing_c_tpu.utils.vec3 import Vec3

scene = load_scene("/root/reference/models/helmet.glb",
                   background_path=None, warn=lambda *a: None)
o = Vec3(jnp.zeros((R,)), jnp.zeros((R,)), jnp.full((R,), 3.0))
g = jax.random.normal(key, (3, R), jnp.float32)
dirv = Vec3(g[0], g[1], g[2]).normalized()

bench("topk_fast intersect (R rays)",
      lambda ox: traverse.intersect_bvh_topk(
          Vec3(ox, o.y, o.z), dirv, scene.triangles, scene.bvh)["t"].sum(),
      o.x)
bench("verified intersect (R rays)",
      lambda ox: traverse.intersect_bvh_verified(
          Vec3(ox, o.y, o.z), dirv, scene.triangles, scene.bvh)["t"].sum(),
      o.x)
