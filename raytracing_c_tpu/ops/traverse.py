"""Batched ordered-DFS BVH traversal.

The reference's recursive nearest-first traversal (ray_bvh_node_hit,
raytracer.c:443-483) made iterative and batch-synchronous for XLA:

- Every ray carries a small explicit stack of (entry, distance) pairs.
  Entries < last_row_offset are internal nodes; entries >= last_row_offset
  are leaf blocks of 8 triangles (the reference's implicit-index scheme,
  raytracer.c:474-476).
- Each loop iteration pops one entry per ray in lockstep (masked). Internal
  pops slab-test all 8 children at once and push the hits nearest-first
  (children sorted by entry distance, pushed far-to-near so the nearest pops
  first — the reference's selection loop, raytracer.c:459-474). Leaf pops
  run 8 Moller-Trumbore tests and tighten best_t, which prunes stale stack
  entries at pop time (the `min_distance >= hit->distance` early-out,
  raytracer.c:470).
- All rays share the iteration count; finished rays are masked. Rays are
  fully independent — no cross-ray communication — so this vectorizes over
  arbitrarily large ray arenas and shards trivially over a device mesh.

This is the exact-traversal reference path; the Pallas packet kernel
(ops/traverse_pallas.py) must match it bit-for-bit on hit selection.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from raytracing_c_tpu import BVH_WIDTH, EPSILON
from raytracing_c_tpu.ops import intersect

W = BVH_WIDTH
INF = jnp.float32(jnp.inf)


def intersect_bvh(origin, direction, triangles, bvh, active=None):
    """Traverse the BVH for a batch of rays.

    origin/direction: (R, 3) f32. Returns dict(t, tri, u, v): (R,) arrays,
    t = +inf and tri = -1 where nothing was hit.
    """
    r = origin.shape[0]
    depth = bvh.depth
    n_internal = bvh.mins.shape[0]
    n_blocks = triangles.v0.shape[0] // W
    stack_size = 8 * (depth + 1)
    max_iters = n_internal + n_blocks + 8

    if active is None:
        active = jnp.ones((r,), bool)

    inv_dir = 1.0 / direction
    lane = jnp.arange(W, dtype=jnp.int32)
    rr = jnp.arange(r)

    state = {
        "sp": jnp.where(active, 1, 0).astype(jnp.int32),
        "stack_e": jnp.zeros((r, stack_size), jnp.int32),
        "stack_d": jnp.zeros((r, stack_size), jnp.float32),
        "best_t": jnp.full((r,), INF),
        "best_tri": jnp.full((r,), -1, jnp.int32),
        "best_u": jnp.zeros((r,), jnp.float32),
        "best_v": jnp.zeros((r,), jnp.float32),
        "it": jnp.int32(0),
    }

    def cond(st):
        return jnp.logical_and(jnp.any(st["sp"] > 0), st["it"] < max_iters)

    def body(st):
        sp = st["sp"]
        has = sp > 0
        top = jnp.maximum(sp - 1, 0)
        e = jnp.take_along_axis(st["stack_e"], top[:, None], axis=1)[:, 0]
        d = jnp.take_along_axis(st["stack_d"], top[:, None], axis=1)[:, 0]
        sp = jnp.where(has, sp - 1, sp)

        best_t = st["best_t"]
        process = has & (d < best_t)
        is_leaf = e >= n_internal

        # --- internal expand -------------------------------------------
        proc_int = process & ~is_leaf
        node = jnp.clip(e, 0, n_internal - 1)
        mins = bvh.mins[node]  # (R, 8, 3)
        maxs = bvh.maxs[node]
        dists = intersect.aabb_slab(origin, inv_dir, mins, maxs, EPSILON, best_t)
        dists = jnp.where(proc_int[:, None], dists, INF)

        order = jnp.argsort(dists, axis=1).astype(jnp.int32)
        sd = jnp.take_along_axis(dists, order, axis=1)  # ascending
        child = node[:, None] * W + 1 + order  # (R, 8)

        stack_e, stack_d = st["stack_e"], st["stack_d"]
        slot_ids = jnp.arange(stack_size, dtype=jnp.int32)[None, :]
        # push far-to-near so the nearest child pops first
        for k in range(W - 1, -1, -1):
            m = proc_int & (sd[:, k] < best_t)
            one_hot = (slot_ids == sp[:, None]) & m[:, None]
            stack_e = jnp.where(one_hot, child[:, k : k + 1], stack_e)
            stack_d = jnp.where(one_hot, sd[:, k : k + 1], stack_d)
            sp = sp + m.astype(jnp.int32)

        # --- leaf block test --------------------------------------------
        proc_leaf = process & is_leaf
        blk = jnp.clip(e - n_internal, 0, n_blocks - 1)
        tri_idx = blk[:, None] * W + lane[None, :]  # (R, 8)
        t, u, v = intersect.moller_trumbore(
            origin[:, None, :],
            direction[:, None, :],
            triangles.v0[tri_idx],
            triangles.e1[tri_idx],
            triangles.e2[tri_idx],
        )
        t = jnp.where(proc_leaf[:, None], t, INF)
        j = jnp.argmin(t, axis=1)
        tb = t[rr, j]
        better = tb < best_t

        return {
            "sp": sp,
            "stack_e": stack_e,
            "stack_d": stack_d,
            "best_t": jnp.where(better, tb, best_t),
            "best_tri": jnp.where(
                better, tri_idx[rr, j].astype(jnp.int32), st["best_tri"]
            ),
            "best_u": jnp.where(better, u[rr, j], st["best_u"]),
            "best_v": jnp.where(better, v[rr, j], st["best_v"]),
            "it": st["it"] + 1,
        }

    st = jax.lax.while_loop(cond, body, state)
    return {
        "t": st["best_t"],
        "tri": st["best_tri"],
        "u": st["best_u"],
        "v": st["best_v"],
    }


def intersect_scene(scene, origin, direction, active=None, use_bvh=True):
    """ray_scene_hit (raytracer.c:497-503) + the sphere pass: nearest hit
    among BVH triangles and analytic spheres.

    Returns dict(t, tri, sph, u, v); tri/sph are -1 where not the winner.
    """
    if use_bvh:
        hit = intersect_bvh(origin, direction, scene.triangles, scene.bvh, active)
    else:
        hit = intersect.intersect_bruteforce(origin, direction, scene.triangles)
        hit["tri"] = jnp.where(jnp.isfinite(hit["t"]), hit["tri"], -1)

    t_tri = hit["t"]
    tri = jnp.where(jnp.isfinite(t_tri), hit["tri"], -1)

    t_sph, sph = intersect.intersect_spheres(
        origin, direction, scene.spheres, t_tri
    )
    sphere_wins = t_sph < t_tri
    return {
        "t": jnp.where(sphere_wins, t_sph, t_tri),
        "tri": jnp.where(sphere_wins, -1, tri),
        "sph": jnp.where(sphere_wins, sph, -1),
        "u": hit["u"],
        "v": hit["v"],
    }
