"""Amortized microbenchmarks: repeat each op 100x inside one jit so tunnel
dispatch latency doesn't pollute the numbers."""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

R = 65536
N = 32768
REPS = 100
print("backend:", jax.default_backend())
key = jax.random.PRNGKey(0)


def bench(name, body, init):
    """body: carry -> carry; repeated REPS times inside one jit."""

    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, REPS, lambda i, c: body(c), x)

    out = jax.block_until_ready(run(init))
    t0 = time.perf_counter()
    out = jax.block_until_ready(run(init))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name}: {dt*1e3:.3f} ms/iter")
    return dt


table = jax.random.normal(key, (N,), jnp.float32)
idx = jax.random.randint(key, (128, R), 0, N, jnp.int32)

bench(
    "gather (128,R) from (N,)",
    lambda c: (c[0], (table[(idx + c[0].astype(jnp.int32)) % N]).sum() + c[1]),
    (jnp.float32(0), jnp.float32(0)),
)

d0 = jax.random.normal(key, (64, R), jnp.float32)
bench(
    "argsort (64,R) ax0",
    lambda c: (c[0] + 1, jnp.argsort(d0 + c[0], axis=0).astype(jnp.float32).sum() + c[1]),
    (jnp.float32(0), jnp.float32(0)),
)


def level(c):
    i, acc = c
    dd = d0 + i
    o = jnp.argsort(dd, axis=0).astype(jnp.int32)
    sd = jnp.take_along_axis(dd, o, axis=0)
    ids = jnp.take_along_axis((o * 3) % 64, o[:8], axis=0)
    return (i + 1, acc + sd[8].sum() + ids.astype(jnp.float32).sum())


bench("level pattern", level, (jnp.float32(0), jnp.float32(0)))

j = jax.random.randint(key, (R,), 0, 64, jnp.int32)
rr = jnp.arange(R)
bench(
    "fancy x[j, rr]",
    lambda c: (c[0] + 1, (d0 + c[0])[j, rr].sum() + c[1]),
    (jnp.float32(0), jnp.float32(0)),
)

# the real thing: full topk intersect repeated
import sys
sys.path.insert(0, "/root/repo")
from raytracing_c_tpu.io.loader import load_scene
from raytracing_c_tpu.ops import traverse
from raytracing_c_tpu.utils.vec3 import Vec3

scene = load_scene("/root/reference/models/helmet.glb",
                   background_path=None, warn=lambda *a: None)
g = jax.random.normal(key, (3, R), jnp.float32)
dirv = Vec3(g[0], g[1], g[2]).normalized()


def topk_once(c):
    i, acc = c
    o = Vec3(jnp.full((R,), 0.0) + i * 1e-6, jnp.zeros((R,)), jnp.full((R,), 3.0))
    h = traverse.intersect_bvh_topk(o, dirv, scene.triangles, scene.bvh)
    return (i + 1, acc + jnp.where(jnp.isfinite(h["t"]), h["t"], 0.0).sum())


REPS = 10
bench("topk_fast full (per call)", topk_once, (jnp.float32(0), jnp.float32(0)))
