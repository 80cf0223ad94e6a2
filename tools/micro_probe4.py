"""Ablation bisect of intersect_bvh_topk cost on TPU."""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
import sys

sys.path.insert(0, "/root/repo")
from raytracing_c_tpu import BVH_WIDTH as W, EPSILON
from raytracing_c_tpu.io.loader import load_scene
from raytracing_c_tpu.ops import intersect
from raytracing_c_tpu.ops.traverse import _leaf_mt, _node_boxes
from raytracing_c_tpu.utils.vec3 import Vec3

R = 65536
REPS = 20
print("backend:", jax.default_backend())
key = jax.random.PRNGKey(0)

scene = load_scene("/root/reference/models/helmet.glb",
                   background_path=None, warn=lambda *a: None)
tris = scene.triangles
bvh = scene.bvh
INF = jnp.inf

g = jax.random.normal(key, (3, R), jnp.float32)
dirv = Vec3(g[0], g[1], g[2]).normalized()
origin = Vec3(jnp.zeros((R,)), jnp.zeros((R,)), jnp.full((R,), 3.0))
inv_dir = Vec3(1.0 / dirv.x, 1.0 / dirv.y, 1.0 / dirv.z)
lane = jnp.arange(W, dtype=jnp.int32)
rr = jnp.arange(R)


def bench(name, fn, init):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, REPS, lambda i, c: fn(i, c), x)

    out = jax.block_until_ready(run(init))
    t0 = time.perf_counter()
    out = jax.block_until_ready(run(init))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name}: {dt*1e3:.2f} ms/iter")


def levels_only(i, acc):
    o = Vec3(origin.x + i * 1e-7, origin.y, origin.z)
    bmin, bmax = _node_boxes(bvh, jnp.zeros((), jnp.int32))
    dists = intersect.aabb_slab(
        o, inv_dir, bmin.map(lambda a: a[:, None]),
        bmax.map(lambda a: a[:, None]), EPSILON, INF)
    cand_ids = jnp.broadcast_to(lane[:, None] + 1, (W, R)).astype(jnp.int32)
    cand_d = dists
    for _ in range(1, bvh.depth):
        kk = min(8, cand_d.shape[0])
        if cand_d.shape[0] > kk:
            sd, sids = jax.lax.sort((cand_d, cand_ids), dimension=0, num_keys=1)
            ids, dk = sids[:kk], sd[:kk]
        else:
            ids, dk = cand_ids, cand_d
        node = jnp.clip(ids, 0, bvh.n_internal - 1)
        bmin, bmax = _node_boxes(bvh, node)
        d = intersect.aabb_slab(o, inv_dir, bmin, bmax, EPSILON, INF)
        d = jnp.where(jnp.isfinite(dk)[None, :, :], d, INF)
        child = node[None, :, :] * W + 1 + lane[:, None, None]
        cand_ids = child.reshape(-1, R)
        cand_d = d.reshape(-1, R)
    return acc + cand_d.min(axis=0).sum() + cand_ids.sum().astype(jnp.float32) * 0


def leaf_only_fixed(i, acc):
    # leaf stage with FIXED sequential blocks (no traversal/sort)
    o = Vec3(origin.x + i * 1e-7, origin.y, origin.z)
    blocks = jnp.broadcast_to(
        (jnp.arange(16, dtype=jnp.int32) * 17 % 4096)[:, None], (16, R)
    )
    tri_idx = (blocks[None] * W + lane[:, None, None]).reshape(W * 16, R)
    t, u, v = _leaf_mt(o, dirv, tris, tri_idx)
    j = jnp.argmin(t, axis=0)
    return acc + jnp.where(jnp.isfinite(t[j, rr]), t[j, rr], 0.0).sum()


def leaf_gather_only(i, acc):
    o = Vec3(origin.x + i * 1e-7, origin.y, origin.z)
    blocks = jnp.broadcast_to(
        (jnp.arange(16, dtype=jnp.int32) * 17 % 4096)[:, None], (16, R)
    )
    tri_idx = (blocks[None] * W + lane[:, None, None]).reshape(W * 16, R)
    v0 = tris.v0.gather(tri_idx)
    e1 = tris.e1.gather(tri_idx)
    e2 = tris.e2.gather(tri_idx)
    return acc + v0.x.sum() + e1.y.sum() + e2.z.sum() + o.x.sum() * 0


def leaf_random_blocks(i, acc):
    # leaf gathers with RANDOM (incoherent) block ids per ray
    o = Vec3(origin.x + i * 1e-7, origin.y, origin.z)
    blocks = jax.random.randint(
        jax.random.fold_in(key, 1), (16, R), 0, 4096, jnp.int32
    )
    tri_idx = (blocks[None] * W + lane[:, None, None]).reshape(W * 16, R)
    t, u, v = _leaf_mt(o, dirv, tris, tri_idx)
    j = jnp.argmin(t, axis=0)
    return acc + jnp.where(jnp.isfinite(t[j, rr]), t[j, rr], 0.0).sum()


bench("levels only (slab+sort, no leaf)", levels_only, jnp.float32(0))
bench("leaf stage, fixed blocks", leaf_only_fixed, jnp.float32(0))
bench("leaf gathers only, fixed blocks", leaf_gather_only, jnp.float32(0))
bench("leaf stage, random blocks", leaf_random_blocks, jnp.float32(0))
