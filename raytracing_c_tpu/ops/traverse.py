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


def intersect_bvh_topk(
    origin, direction, triangles, bvh, active=None, k: int = 8,
    k_leaf: int = 16, with_bound: bool = False,
):
    """Dense level-synchronous traversal — the TPU production path.

    Instead of a per-ray stack (which serializes into a divergent
    while_loop), every ray descends the complete tree level-by-level keeping
    the `k` nearest hit children (ranked by AABB entry distance — the same
    nearest-first ordering as the reference's selection loop,
    raytracer.c:459-474, made rank-based instead of sequential). The leaf
    stage tests the `k_leaf` nearest candidate blocks' triangles in ONE dense
    Moller-Trumbore batch. Every op is a fixed-shape sort/gather/VPU stage —
    no data-dependent control flow, so XLA pipelines it across the whole ray
    arena.

    Exactness: the top-8 root level is always complete (8 children). Deeper
    levels truncate to the k nearest candidate subtrees per ray; a hit is
    missed only if more than k closer-ranked AABBs hide the true one (resp.
    k_leaf blocks). intersect_bvh (ordered DFS) is the exact reference
    oracle; tests/test_traverse_topk.py measures agreement.
    """
    r = origin.shape[0]
    depth = bvh.depth
    n_internal = bvh.mins.shape[0]
    n_blocks = triangles.v0.shape[0] // W

    inv_dir = 1.0 / direction
    lane = jnp.arange(W, dtype=jnp.int32)

    # level 0: root children
    dists = intersect.aabb_slab(
        origin, inv_dir, bvh.mins[0][None], bvh.maxs[0][None], EPSILON, INF
    )  # (R, 8)
    if active is not None:
        dists = jnp.where(active[:, None], dists, INF)
    cand_ids = jnp.broadcast_to(lane[None, :] + 1, (r, W)).astype(jnp.int32)
    cand_d = dists
    # entry distance of the nearest candidate ever truncated; if it is >= the
    # final best_t the truncation was provably harmless (AABB entry distance
    # lower-bounds any hit inside it)
    dropped_min = jnp.full((r,), INF)

    for _level in range(1, depth):
        kk = min(k, cand_d.shape[1])
        if cand_d.shape[1] > kk:
            order = jnp.argsort(cand_d, axis=1).astype(jnp.int32)
            sd = jnp.take_along_axis(cand_d, order, axis=1)
            dropped_min = jnp.minimum(dropped_min, sd[:, kk])
            order = order[:, :kk]
            ids = jnp.take_along_axis(cand_ids, order, axis=1)
            dk = sd[:, :kk]
        else:
            ids, dk = cand_ids, cand_d
        node = jnp.clip(ids, 0, n_internal - 1)
        mins = bvh.mins[node]  # (R, kk, 8, 3)
        maxs = bvh.maxs[node]
        d = intersect.aabb_slab(
            origin[:, None, :], inv_dir[:, None, :], mins, maxs, EPSILON, INF
        )  # (R, kk, 8)
        d = jnp.where(jnp.isfinite(dk)[:, :, None], d, INF)
        child = node[:, :, None] * W + 1 + lane[None, None, :]
        cand_ids = child.reshape(r, kk * W)
        cand_d = d.reshape(r, kk * W)

    # leaf stage: candidates are leaf-row entries
    kl = min(k_leaf, cand_d.shape[1])
    if cand_d.shape[1] > kl:
        order = jnp.argsort(cand_d, axis=1).astype(jnp.int32)
        sd = jnp.take_along_axis(cand_d, order, axis=1)
        dropped_min = jnp.minimum(dropped_min, sd[:, kl])
        blk_ids = jnp.take_along_axis(cand_ids, order[:, :kl], axis=1)
        blk_d = sd[:, :kl]
    else:
        blk_ids, blk_d = cand_ids, cand_d

    blocks = jnp.clip(blk_ids - n_internal, 0, n_blocks - 1)
    tri_idx = (blocks[:, :, None] * W + lane[None, None, :]).reshape(r, kl * W)
    t, u, v = intersect.moller_trumbore(
        origin[:, None, :],
        direction[:, None, :],
        triangles.v0[tri_idx],
        triangles.e1[tri_idx],
        triangles.e2[tri_idx],
    )  # (R, kl*8)
    valid = jnp.repeat(jnp.isfinite(blk_d), W, axis=1)
    t = jnp.where(valid, t, INF)

    j = jnp.argmin(t, axis=1)
    rr = jnp.arange(r)
    tb = t[rr, j]
    hit = jnp.isfinite(tb)
    out = {
        "t": tb,
        "tri": jnp.where(hit, tri_idx[rr, j].astype(jnp.int32), -1),
        "u": u[rr, j],
        "v": v[rr, j],
    }
    if with_bound:
        out["dropped_min"] = dropped_min
    return out


def _merge_hits(a, b):
    """Pick the nearer hit per ray (b wins ties)."""
    b_wins = b["t"] <= a["t"]  # NaN-free: both are +inf on miss
    return {
        "t": jnp.where(b_wins, b["t"], a["t"]),
        "tri": jnp.where(b_wins, b["tri"], a["tri"]),
        "u": jnp.where(b_wins, b["u"], a["u"]),
        "v": jnp.where(b_wins, b["v"], a["v"]),
    }


def intersect_bruteforce_chunked(
    origin, direction, triangles, active=None, chunk: int = 4096
):
    """Memory-bounded exhaustive oracle: fori_loop over triangle chunks so
    the (R, N) intermediate never materializes. Last-resort exact fallback."""
    r = origin.shape[0]
    n = triangles.v0.shape[0]
    n_chunks = (n + chunk - 1) // chunk
    lane = jnp.arange(chunk, dtype=jnp.int32)

    def body(c, best):
        idx = jnp.clip(c * chunk + lane, 0, n - 1)
        t, u, v = intersect.moller_trumbore(
            origin[:, None, :],
            direction[:, None, :],
            triangles.v0[idx][None],
            triangles.e1[idx][None],
            triangles.e2[idx][None],
        )  # (R, chunk)
        # clipped duplicate tail indices can only repeat real triangles
        j = jnp.argmin(t, axis=1)
        rr = jnp.arange(r)
        cand = {
            "t": t[rr, j],
            "tri": idx[j].astype(jnp.int32),
            "u": u[rr, j],
            "v": v[rr, j],
        }
        return _merge_hits(best, cand)

    best = {
        "t": jnp.full((r,), INF),
        "tri": jnp.full((r,), -1, jnp.int32),
        "u": jnp.zeros((r,)),
        "v": jnp.zeros((r,)),
    }
    best = jax.lax.fori_loop(0, n_chunks, body, best)
    if active is not None:
        best["t"] = jnp.where(active, best["t"], INF)
        best["tri"] = jnp.where(active, best["tri"], -1)
    best["tri"] = jnp.where(jnp.isfinite(best["t"]), best["tri"], -1)
    return best


def intersect_bvh_verified(
    origin, direction, triangles, bvh, active=None, k: int = 8,
    k_leaf: int = 16,
):
    """Exact dense traversal: top-k pass + truncation-bound verification.

    Pass 1 runs the cheap top-k descent. A ray is `suspect` only if some
    truncated candidate's AABB entry distance beats its found hit — the
    provable condition for a possible miss. Suspects (rare; zero for
    coherent camera batches) escalate through a 4x-wider pass and finally a
    chunked brute-force sweep, both behind jax.lax.cond so clean batches pay
    nothing. The result is exact — bit-identical hit selection to the
    brute-force oracle — while keeping every op dense and fixed-shape.
    """
    hit = intersect_bvh_topk(
        origin, direction, triangles, bvh, active, k=k, k_leaf=k_leaf,
        with_bound=True,
    )
    suspect = hit.pop("dropped_min") < hit["t"]
    if active is not None:
        suspect = suspect & active

    width = triangles.v0.shape[0] // W  # total leaf blocks
    k2 = min(4 * k, 64)
    kl2 = min(4 * k_leaf, width)

    def escalate(args):
        hit, suspect = args
        wide = intersect_bvh_topk(
            origin, direction, triangles, bvh, suspect, k=k2, k_leaf=kl2,
            with_bound=True,
        )
        still = wide.pop("dropped_min") < wide["t"]
        still = still & suspect

        def brute(args2):
            wide, still = args2
            exact = intersect_bruteforce_chunked(
                origin, direction, triangles, still
            )
            return _merge_hits(wide, exact)

        wide = jax.lax.cond(
            jnp.any(still), brute, lambda a: a[0], (wide, still)
        )
        return _merge_hits(hit, wide)

    return jax.lax.cond(
        jnp.any(suspect), escalate, lambda a: a[0], (hit, suspect)
    )


def intersect_scene(
    scene, origin, direction, active=None, method: str = "topk",
    k: int = 8, k_leaf: int = 16,
):
    """ray_scene_hit (raytracer.c:497-503) + the sphere pass: nearest hit
    among BVH triangles and analytic spheres.

    method: "topk" (dense level-synchronous BVH with exactness verification —
    the TPU production path), "topk_fast" (single unverified pass),
    "dfs" (exact ordered DFS), or "brute" (exhaustive oracle).
    Returns dict(t, tri, sph, u, v); tri/sph are -1 where not the winner.
    """
    if method == "dfs":
        hit = intersect_bvh(origin, direction, scene.triangles, scene.bvh, active)
    elif method == "topk":
        hit = intersect_bvh_verified(
            origin, direction, scene.triangles, scene.bvh, active,
            k=k, k_leaf=k_leaf,
        )
    elif method == "topk_fast":
        hit = intersect_bvh_topk(
            origin, direction, scene.triangles, scene.bvh, active,
            k=k, k_leaf=k_leaf,
        )
    elif method == "brute":
        hit = intersect.intersect_bruteforce(origin, direction, scene.triangles)
        hit["tri"] = jnp.where(jnp.isfinite(hit["t"]), hit["tri"], -1)
    else:
        raise ValueError(f"unknown traversal method '{method}'")

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
