"""BVH traversal — component-plane, batch-minor layouts throughout.

Two device implementations of the reference's ordered traversal
(ray_bvh_node_hit, raytracer.c:443-483), plus the exhaustive oracle:

1. `intersect_bvh` — ordered DFS with per-ray stacks, batch-synchronous.
   Exact but serial in tree steps; it exists as the semantics oracle and the
   CPU-test reference. Stacks are (S, R): candidate axis leads, rays minor.

2. `intersect_bvh_topk` / `intersect_bvh_verified` — the TPU production
   path: dense level-synchronous top-k descent (no data-dependent control
   flow) with provable exactness restoration. See intersect_bvh_verified.

All hot intermediates keep the RAY axis minor: candidates/children/stack
slots lead, so every array tiles as (8, 128) without lane padding.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from raytracing_c_tpu import BVH_WIDTH, EPSILON
from raytracing_c_tpu.ops import intersect
from raytracing_c_tpu.utils.vec3 import Vec3

W = BVH_WIDTH
INF = jnp.float32(jnp.inf)


def _node_boxes(bvh, node):
    """Gather child AABBs for node ids `node` of any shape S.

    One 512-byte ROW gather per node id (the TPU fast path), one transpose
    back to batch-minor, free static slicing. Returns (box_min, box_max):
    Vec3 with components (8,) + S.

    Note: a conservative-bf16 variant (bvh.nodes_bf16, half the bytes) was
    measured SLOWER end-to-end (+8%): the fetch is row-LATENCY-bound, not
    bandwidth-bound, and the upcast adds VPU work (docs/PERF.md). The bf16
    table is kept for the future Pallas traversal, where rows stream
    through VMEM and bytes matter.
    """
    table = bvh.nodes
    g = table[node]  # S + (128,)
    gt = jnp.moveaxis(g, -1, 0)  # (128,) + S
    c = gt.reshape((16, W) + node.shape).astype(jnp.float32)
    return (
        Vec3(x=c[0], y=c[1], z=c[2]),
        Vec3(x=c[3], y=c[4], z=c[5]),
    )


def _leaf_mt(origin, direction, triangles, tri_idx):
    """Moller-Trumbore against gathered triangle slots.

    tri_idx: int array shaped C + (R,); origin/direction Vec3 of (R,).
    Returns (t, u, v) shaped like tri_idx. Per-lane gathers — slow on TPU;
    used only by the oracle paths (DFS / chunked brute force).
    """
    v0 = triangles.v0.gather(tri_idx)
    e1 = triangles.e1.gather(tri_idx)
    e2 = triangles.e2.gather(tri_idx)
    return intersect.moller_trumbore(origin, direction, v0, e1, e2)


def _leaf_mt_rows(origin, direction, triangles, blocks):
    """Moller-Trumbore against whole leaf blocks via ROW gathers.

    TPU gathers run at memory speed only when each index fetches a full
    (8,128)-tile row; per-lane-varying gathers cost ~7 cycles per element
    (measured ~60 ms for (128, 64k) lookups). The leaf row table packs each
    8-triangle block into one 512-byte row (models/scene.py), so the fetch
    here is `n_rays * k_leaf` row gathers at HBM bandwidth, followed by one
    transpose back to batch-minor and free static reshapes.

    blocks: (kl, R) block ids. Returns (t, u, v), each (kl*8, R),
    block-major rows (row = block * 8 + lane).
    """
    kl, r = blocks.shape
    g = triangles.leaf_rows[blocks]  # (kl, R, 128) row gather
    gt = jnp.transpose(g, (0, 2, 1))  # (kl, 128, R) — one bandwidth pass
    c = gt.reshape(kl, 16, W, r)  # 16 groups of 8 lanes; 9 used
    v0 = Vec3(c[:, 0], c[:, 1], c[:, 2])  # components (kl, 8, R)
    e1 = Vec3(c[:, 3], c[:, 4], c[:, 5])
    e2 = Vec3(c[:, 6], c[:, 7], c[:, 8])
    t, u, v = intersect.moller_trumbore(origin, direction, v0, e1, e2)
    return (
        t.reshape(kl * W, r),
        u.reshape(kl * W, r),
        v.reshape(kl * W, r),
    )


def _select_row(values, j):
    """values[j[r], r] per column WITHOUT a per-lane gather: one-hot mask +
    sum over the (small) leading axis — dense VPU work."""
    c = values.shape[0]
    one_hot = (
        jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0) == j[None, :]
    )
    return jnp.where(one_hot, values, 0).sum(axis=0, dtype=values.dtype)


def intersect_bvh(origin: Vec3, direction: Vec3, triangles, bvh, active=None):
    """Exact ordered DFS (the reference algorithm made iterative).

    Entries < last_row_offset are internal nodes; entries >= are leaf blocks
    (raytracer.c:474-476). Each iteration pops one entry per ray in
    lockstep: internal pops slab-test 8 children and push hits far-to-near
    (nearest pops first — the selection loop of raytracer.c:459-474); leaf
    pops run 8 triangle tests and tighten best_t, which prunes stale stack
    entries at pop time (raytracer.c:470).
    """
    r = origin.shape[0]
    depth = bvh.depth
    n_internal = bvh.n_internal
    n_blocks = triangles.capacity // W
    stack_size = 8 * (depth + 1)
    max_iters = n_internal + n_blocks + 8

    if active is None:
        active = jnp.ones((r,), bool)

    inv_dir = Vec3(1.0 / direction.x, 1.0 / direction.y, 1.0 / direction.z)
    lane = jnp.arange(W, dtype=jnp.int32)
    rr = jnp.arange(r)
    slot_ids = jnp.arange(stack_size, dtype=jnp.int32)[:, None]  # (S, 1)

    state = {
        "sp": jnp.where(active, 1, 0).astype(jnp.int32),
        "stack_e": jnp.zeros((stack_size, r), jnp.int32),
        "stack_d": jnp.zeros((stack_size, r), jnp.float32),
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
        e = jnp.take_along_axis(st["stack_e"], top[None, :], axis=0)[0]
        d = jnp.take_along_axis(st["stack_d"], top[None, :], axis=0)[0]
        sp = jnp.where(has, sp - 1, sp)

        best_t = st["best_t"]
        process = has & (d < best_t)
        is_leaf = e >= n_internal

        # --- internal expand -------------------------------------------
        proc_int = process & ~is_leaf
        node = jnp.clip(e, 0, n_internal - 1)
        bmin, bmax = _node_boxes(bvh, node)  # Vec3 (8, R)
        dists = intersect.aabb_slab(
            origin, inv_dir, bmin, bmax, EPSILON, best_t
        )  # (8, R)
        dists = jnp.where(proc_int[None, :], dists, INF)

        order = jnp.argsort(dists, axis=0).astype(jnp.int32)
        sd = jnp.take_along_axis(dists, order, axis=0)  # ascending
        child = node[None, :] * W + 1 + order  # (8, R)

        stack_e, stack_d = st["stack_e"], st["stack_d"]
        # push far-to-near so the nearest child pops first
        for k in range(W - 1, -1, -1):
            m = proc_int & (sd[k] < best_t)
            one_hot = (slot_ids == sp[None, :]) & m[None, :]
            stack_e = jnp.where(one_hot, child[k][None, :], stack_e)
            stack_d = jnp.where(one_hot, sd[k][None, :], stack_d)
            sp = sp + m.astype(jnp.int32)

        # --- leaf block test --------------------------------------------
        proc_leaf = process & is_leaf
        blk = jnp.clip(e - n_internal, 0, n_blocks - 1)
        tri_idx = blk[None, :] * W + lane[:, None]  # (8, R)
        t, u, v = _leaf_mt(origin, direction, triangles, tri_idx)
        t = jnp.where(proc_leaf[None, :], t, INF)
        j = jnp.argmin(t, axis=0)
        tb = t[j, rr]
        better = tb < best_t

        return {
            "sp": sp,
            "stack_e": stack_e,
            "stack_d": stack_d,
            "best_t": jnp.where(better, tb, best_t),
            "best_tri": jnp.where(
                better, tri_idx[j, rr].astype(jnp.int32), st["best_tri"]
            ),
            "best_u": jnp.where(better, u[j, rr], st["best_u"]),
            "best_v": jnp.where(better, v[j, rr], st["best_v"]),
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
    origin: Vec3, direction: Vec3, triangles, bvh, active=None, k: int = 8,
    k_leaf: int = 8, with_bound: bool = False,
):
    """Dense level-synchronous traversal — the TPU production path.

    Every ray descends the complete tree level-by-level keeping the `k`
    nearest hit children, ranked by AABB entry distance (the reference's
    nearest-first ordering, raytracer.c:459-474, made rank-based). The leaf
    stage tests the `k_leaf` nearest candidate blocks in ONE dense
    Moller-Trumbore batch. Every op is a fixed-shape sort/gather/VPU stage —
    no data-dependent control flow. Candidate axes lead; rays stay minor.

    with_bound=True additionally returns `dropped_min`, the entry distance
    of the nearest candidate ever truncated — the exactness certificate used
    by intersect_bvh_verified.

    Defaults (k=8, k_leaf=8) balance single-pass accuracy against speed on
    helmet.glb @ 256k rays (docs/PERF.md): ~40 ms/intersect with ~0.1%
    bounce-ray suspects — small enough that the O(suspects) escalation
    almost never overflows its compact buffer. (k=4, k_leaf=4 is ~25%
    faster per pass but its bounce-ray suspect volume spills the buffer,
    forcing full-width repairs that cost more than it saves.)
    """
    r = origin.shape[0]
    depth = bvh.depth
    n_internal = bvh.n_internal
    n_blocks = triangles.capacity // W

    inv_dir = Vec3(1.0 / direction.x, 1.0 / direction.y, 1.0 / direction.z)
    lane = jnp.arange(W, dtype=jnp.int32)

    # level 0: root children
    bmin, bmax = _node_boxes(bvh, jnp.zeros((), jnp.int32))  # Vec3 (8,)
    dists = intersect.aabb_slab(
        origin, inv_dir,
        bmin.map(lambda a: a[:, None]), bmax.map(lambda a: a[:, None]),
        EPSILON, INF,
    )  # (8, R)
    if active is not None:
        dists = jnp.where(active[None, :], dists, INF)
    cand_ids = jnp.broadcast_to(
        lane[:, None] + 1, (W, r)
    ).astype(jnp.int32)
    cand_d = dists
    dropped_min = jnp.full((r,), INF)

    for _level in range(1, depth):
        kk = min(k, cand_d.shape[0])
        if cand_d.shape[0] > kk:
            # variadic sort: the sort network carries the ids as payload —
            # avoids take_along_axis along the sublane axis, which lowers to
            # a pathological per-element gather on TPU (measured 60x slower)
            sd, sids = jax.lax.sort((cand_d, cand_ids), dimension=0, num_keys=1)
            dropped_min = jnp.minimum(dropped_min, sd[kk])
            ids = sids[:kk]
            dk = sd[:kk]
        else:
            ids, dk = cand_ids, cand_d
        node = jnp.clip(ids, 0, n_internal - 1)  # (kk, R)
        bmin, bmax = _node_boxes(bvh, node)  # Vec3 (8, kk, R)
        d = intersect.aabb_slab(origin, inv_dir, bmin, bmax, EPSILON, INF)
        d = jnp.where(jnp.isfinite(dk)[None, :, :], d, INF)  # (8, kk, R)
        child = node[None, :, :] * W + 1 + lane[:, None, None]
        cand_ids = child.reshape(W * kk, r)
        cand_d = d.reshape(W * kk, r)

    # leaf stage
    kl = min(k_leaf, cand_d.shape[0])
    if cand_d.shape[0] > kl:
        sd, sids = jax.lax.sort((cand_d, cand_ids), dimension=0, num_keys=1)
        dropped_min = jnp.minimum(dropped_min, sd[kl])
        blk_ids = sids[:kl]
        blk_d = sd[:kl]
    else:
        blk_ids, blk_d = cand_ids, cand_d

    blocks = jnp.clip(blk_ids - n_internal, 0, n_blocks - 1)  # (kl, R)

    # leaf candidates processed in chunks so the (chunk, R, 128) row-gather
    # transient stays a few hundred MB at production batch sizes
    chunk = min(4, kl)
    best_t = jnp.full((r,), INF)
    best_tri = jnp.full((r,), -1, jnp.int32)
    best_u = jnp.zeros((r,), jnp.float32)
    best_v = jnp.zeros((r,), jnp.float32)
    for c0 in range(0, kl, chunk):
        ch = min(chunk, kl - c0)
        blk_c = blocks[c0 : c0 + ch]  # (ch, R)
        t, u, v = _leaf_mt_rows(origin, direction, triangles, blk_c)
        valid = jnp.broadcast_to(
            jnp.isfinite(blk_d[c0 : c0 + ch])[:, None, :], (ch, W, r)
        ).reshape(ch * W, r)
        t = jnp.where(valid, t, INF)
        tri_c = (
            blk_c[:, None, :] * W + lane[None, :, None]
        ).reshape(ch * W, r)

        j = jnp.argmin(t, axis=0)
        tb = t.min(axis=0)
        better = tb < best_t
        best_tri = jnp.where(
            better, _select_row(tri_c, j).astype(jnp.int32), best_tri
        )
        best_u = jnp.where(better, _select_row(u, j), best_u)
        best_v = jnp.where(better, _select_row(v, j), best_v)
        best_t = jnp.minimum(best_t, tb)

    hit = jnp.isfinite(best_t)
    out = {
        "t": best_t,
        "tri": jnp.where(hit, best_tri, -1),
        "u": best_u,
        "v": best_v,
    }
    if with_bound:
        out["dropped_min"] = dropped_min
    return out


def _merge_hits(a, b):
    """Pick the nearer hit per ray (b wins ties)."""
    b_wins = b["t"] <= a["t"]
    return {
        "t": jnp.where(b_wins, b["t"], a["t"]),
        "tri": jnp.where(b_wins, b["tri"], a["tri"]),
        "u": jnp.where(b_wins, b["u"], a["u"]),
        "v": jnp.where(b_wins, b["v"], a["v"]),
    }


def intersect_bruteforce_chunked(
    origin: Vec3, direction: Vec3, triangles, active=None,
    chunk: int | None = None,
):
    """Memory-bounded exhaustive oracle: fori_loop over triangle chunks so
    the (N, R) intermediate never materializes. Last-resort exact fallback.

    chunk=None sizes chunks adaptively: small ray buffers (the tier-2
    repair path, r~512) take the whole scene in one chunk — the per-chunk
    argmin/merge machinery measured 2.6 ms per 512-ray call at chunk=4096
    on helmet, ~4x the MT math itself — while large buffers stay bounded
    at ~32 MB of (chunk, R) intermediates."""
    r = origin.shape[0]
    n = triangles.capacity
    if chunk is None:
        chunk = int(min(n, max(4096, 8 * 2**20 // max(r, 1))))
    n_chunks = (n + chunk - 1) // chunk
    lane = jnp.arange(chunk, dtype=jnp.int32)

    def body(c, best):
        idx = jnp.clip(c * chunk + lane, 0, n - 1)[:, None]  # (chunk, 1)
        t, u, v = _leaf_mt(origin, direction, triangles, idx)  # (chunk, R)
        j = jnp.argmin(t, axis=0)
        cand = {
            "t": t.min(axis=0),
            "tri": idx[j, 0].astype(jnp.int32),
            "u": _select_row(u, j),
            "v": _select_row(v, j),
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
    best["tri"] = jnp.where(jnp.isfinite(best["t"]), best["tri"], -1)
    return best


def _repair_suspects(hit, suspect, wide_exact, origin, direction, s_cap):
    """Shared escalation: move suspect rays to the FRONT with one stable
    full-batch lax.sort (rays + hit state + original index ride as
    payloads), rerun the first `s_cap` lanes — a STATIC slice, no gather —
    through `wide_exact`, merge repairs lane-wise, and restore order with a
    second sort keyed on the original index.

    Per-lane indexed compaction (nonzero + plane gathers + scatter-back)
    measured 9.1 ms at 32k-of-256k rays on the chip — latency-bound, the
    round-1 disease; the two lane-parallel sorts cost ~1.5 ms total
    (tools/repair_probe.py). Runs behind jax.lax.cond so clean batches pay
    nothing; overflowing the buffer falls back to a full-batch wide pass
    (rare by construction). Triangle ids ride the sorts as f32 payloads —
    exact to 2^24, far beyond the <=32k-triangle scenes the Pallas gate
    admits and any scene the XLA path has memory for."""
    r = origin.shape[0]
    s = min(s_cap, r)

    def escalate(args):
        hit, suspect = args
        n_sus = jnp.sum(suspect)

        def sorted_path(args2):
            hit, suspect = args2
            key = 1 - suspect.astype(jnp.int32)  # suspects first
            orig = jnp.arange(r, dtype=jnp.int32)
            ks, ox, oy, oz, dx, dy, dz, t0, u0, v0, tr0, oi = jax.lax.sort(
                (key, origin.x, origin.y, origin.z,
                 direction.x, direction.y, direction.z,
                 hit["t"], hit["u"], hit["v"],
                 hit["tri"].astype(jnp.float32), orig),
                num_keys=1,
            )
            act = ks[:s] == 0
            wide = wide_exact(
                Vec3(ox[:s], oy[:s], oz[:s]), Vec3(dx[:s], dy[:s], dz[:s]),
                act,
            )
            take = act & (wide["t"] <= t0[:s])
            t1 = t0.at[:s].set(jnp.where(take, wide["t"], t0[:s]))
            u1 = u0.at[:s].set(jnp.where(take, wide["u"], u0[:s]))
            v1 = v0.at[:s].set(jnp.where(take, wide["v"], v0[:s]))
            tr1 = tr0.at[:s].set(
                jnp.where(take, wide["tri"].astype(jnp.float32), tr0[:s])
            )
            # invert the permutation (oi is unique, so this is exact)
            _, t2, u2, v2, tr2 = jax.lax.sort(
                (oi, t1, u1, v1, tr1), num_keys=1
            )
            return {
                "t": t2, "u": u2, "v": v2, "tri": tr2.astype(jnp.int32),
            }

        def full_path(args2):
            hit, suspect = args2
            wide = wide_exact(origin, direction, suspect)
            return _merge_hits(hit, wide)

        return jax.lax.cond(
            n_sus <= s, sorted_path, full_path, (hit, suspect)
        )

    return jax.lax.cond(
        jnp.any(suspect), escalate, lambda a: a[0], (hit, suspect)
    )


def intersect_bvh_verified(
    origin: Vec3, direction: Vec3, triangles, bvh, active=None, k: int = 8,
    k_leaf: int = 8, max_suspects: int | None = None,
):
    """Exact dense traversal: top-k pass + truncation-bound verification.

    A ray is `suspect` only if some truncated candidate's AABB entry
    distance beats its found hit — the provable condition for a possible
    miss (AABB entry distance lower-bounds any contained hit). Suspects are
    rare (measured: 0 for coherent camera batches, ~0.03% for fully random
    bounce directions), so they are COMPACTED into a small fixed buffer and
    re-traversed with a 4x-wider pass + chunked brute-force backstop; the
    whole repair runs behind jax.lax.cond, so clean batches pay nothing and
    dirty batches pay O(max_suspects), not O(R). In the measure-zero case
    that suspects overflow the buffer, a full-width wide pass handles the
    batch instead. Hit selection is exact — identical to the brute-force
    oracle (tests/test_traverse_topk.py).
    """
    hit = intersect_bvh_topk(
        origin, direction, triangles, bvh, active, k=k, k_leaf=k_leaf,
        with_bound=True,
    )
    suspect = hit.pop("dropped_min") < hit["t"]
    if active is not None:
        suspect = suspect & active

    r = origin.shape[0]
    n_blocks = triangles.capacity // W
    k2 = min(4 * k, 64)
    kl2 = min(4 * k_leaf, max(n_blocks, 1))
    s_cap = max_suspects or min(max(r // 32, 512), r)

    def wide_exact(o, d, act):
        """Wider pass + brute-force backstop on whatever batch it's given."""
        wide = intersect_bvh_topk(
            o, d, triangles, bvh, act, k=k2, k_leaf=kl2, with_bound=True,
        )
        still = (wide.pop("dropped_min") < wide["t"]) & act

        def brute(args2):
            wide, still = args2
            exact = intersect_bruteforce_chunked(o, d, triangles, still)
            return _merge_hits(wide, exact)

        return jax.lax.cond(
            jnp.any(still), brute, lambda a: a[0], (wide, still)
        )

    return _repair_suspects(hit, suspect, wide_exact, origin, direction, s_cap)


#: tier-0 candidate budget knobs (env-overridable for bench A/Bs only —
#: the defaults ARE the tuned production values; round-3 kp story in the
#: docstring below, round-4 ksel sweep in docs/PERF.md)
TIER0_KP = int(os.environ.get("RAYTPU_TIER0_KP", "4"))
TIER0_KSEL = int(os.environ.get("RAYTPU_TIER0_KSEL", "8"))


def intersect_bvh_pallas_verified(
    origin: Vec3, direction: Vec3, triangles, bvh, active=None,
    kp: int | None = None, max_suspects: int | None = None, tables=None,
    fuse_attr: bool = False, tile_wavefront: bool | None = None,
):
    """Exact traversal with the fused Pallas kernel as the fast path.

    Tier 0: pallas kernel, ksel=8 candidates/level, kp leaf groups. kp=4
    (round 3): tools/suspect_probe.py measured helmet bounce-ray suspect
    rates of 11%% at kp=2 (mostly grazing MISS rays whose top-8 blocks span
    >2 leaf groups) vs 0.5%% at kp=4 — two extra one-hot MXU group fetches
    (~0.3 ms/262k) buy a ~20x smaller repair volume, which is what priced
    the verified path (the r/4-slice wide pass measured 8.3 ms per firing).
    Tier 1: suspects sort to the front of an r/32 slice and rerun the SAME
    kernel
    wider (ksel=16 candidates/level, kp=16: every top-16 block's group
    fetched) — measured to clear all but ~0.02-0.05%% of the batch.
    Tier 2: rays still suspect after that compact into a small buffer for
    the exhaustive chunked oracle.
    Each tier sits behind lax.cond, so its cost is O(its input), and each
    buffer overflow falls back to running the wider pass on the full
    previous tier — exactness is unconditional (tests/test_traverse_pallas.py).

    Scenes whose tables re-rooted into a ForestTables (depth > 4 or over
    the VMEM budget) run every tier through the subtree-chained forest
    traversal — same certificate, same escalation, and the same fused
    "attrs" contract (the merge selects the winning subtree's planes).
    """
    from raytracing_c_tpu.ops import traverse_pallas as tp

    # tile_wavefront applies to TIER 0 only (None defers to the module
    # default tp.TW): the wider repair passes are the per-lane exactness
    # backstop for the tile-global truncations — a TW wide pass would
    # re-run the very selection it is repairing
    if isinstance(tables, tp.ForestTables):
        def tier0(o, d, act, kp_, ksel_, fuse=False, tw=False):
            return tp.intersect_bvh_pallas_forest(
                o, d, tables, act, kp=kp_, ksel=ksel_,
                tile=256 if ksel_ > 8 else None, fuse_attr=fuse,
                tile_wavefront=tw,
            )
    else:
        def tier0(o, d, act, kp_, ksel_, fuse=False, tw=False):
            # wide (ksel=16/kp=16) passes run a smaller ray tile: their
            # per-tile scratch (16 exact leaf fetches + 16-wide candidate
            # buffers) overflowed the 16 MB scoped-VMEM limit at
            # tile=1024 under the 6-pass HIGHEST fetches. The r3 split-
            # table tile sweep (tools/split_ab.py, int8x4) confirmed 256
            # stays fastest: 24.1 ms vs 27.2 (512) / 25.9 (1024).
            return tp.intersect_bvh_pallas(
                o, d, triangles, bvh, act, kp=kp_, ksel=ksel_,
                tables=tables, tile=256 if ksel_ > 8 else None,
                fuse_attr=fuse, tile_wavefront=tw,
            )

    if kp is None:
        kp = TIER0_KP
    hit = tier0(origin, direction, active, kp, TIER0_KSEL, fuse_attr,
                tw=tile_wavefront)
    attrs = hit.pop("attrs", None)  # tier-0 winners' attrs (fused path)
    t0_t, t0_tri = hit["t"], hit["tri"]
    t0_u, t0_v = hit["u"], hit["v"]
    suspect = hit.pop("dropped_min") < hit["t"]
    if active is not None:
        suspect = suspect & active

    r = origin.shape[0]
    # TW tier-0 carries a 2x suspect budget: tile-vote truncation on
    # bounce rays runs ~2.5% suspects (tools/tw_bounce1.py) vs the
    # per-lane path's ~0.5% — overflowing the cap fires the FULL-width
    # wide pass (28 ms/256k measured), which the r/16 slice avoids
    div = 16 if tile_wavefront else 32
    s_cap = max_suspects or min(max(r // div, 512), r)

    def wide_exact(o, d, act):
        rw = o.shape[0]
        s2 = min(max(rw // 64, 128), rw)
        wide = tier0(o, d, act, 16, 16)
        still = (wide.pop("dropped_min") < wide["t"]) & act

        def brute_tier(args2):
            wide, still = args2

            def brute_exact(o2, d2, act2):
                return intersect_bruteforce_chunked(o2, d2, triangles, act2)

            return _repair_suspects(wide, still, brute_exact, o, d, s2)

        return jax.lax.cond(
            jnp.any(still), brute_tier, lambda a: a[0], (wide, still)
        )

    merged = _repair_suspects(
        hit, suspect, wide_exact, origin, direction, s_cap
    )
    if attrs is not None:
        # fused attrs describe tier-0's winners; flag lanes where the
        # repair changed ANY hit field so the consumer can refetch
        # exactly those (rare: suspects ~0.5%, most verify unchanged).
        # u/v matter independently of t/tri: an equal-t re-find of the
        # same triangle can carry differently-scheduled barycentrics
        # (the grazing-hit conditioning class) and the interpolated
        # attrs must match the RETURNED u/v.
        merged["attrs"] = attrs
        merged["attrs_stale"] = (
            (merged["tri"] != t0_tri)
            | (merged["t"] != t0_t)
            | (merged["u"] != t0_u)
            | (merged["v"] != t0_v)
        )
    return merged


def intersect_scene(
    scene, origin: Vec3, direction: Vec3, active=None, method: str = "topk",
    k: int = 8, k_leaf: int = 8, k_pallas: int | None = None,
    fuse_attr: bool = False, tw: bool = False,
):
    """ray_scene_hit (raytracer.c:497-503) + the sphere pass: nearest hit
    among BVH triangles and analytic spheres.

    method: "pallas" (fused Pallas kernel + tiered exactness escalation —
    the TPU production path), "pallas_fast" (single unverified kernel
    pass), "topk" (XLA dense + exactness verification), "topk_fast"
    (single unverified pass), "dfs" (exact ordered DFS), or "brute"
    (exhaustive oracle).
    Returns dict(t, tri, sph, u, v); tri/sph are -1 where not the winner.
    """
    # k_pallas=None defers to the verified path's tuned default — round 3
    # shipped a kp regression because a stale k_pallas=2 default HERE
    # silently overrode the callee's kp=4 (suspects then overflowed the
    # r/32 cap and the full-width wide pass fired every dense bounce,
    # +21 ms per 262k intersect in the batch profile)
    if method == "pallas_fused":
        # fused attr interpolation inside the traversal kernel; results
        # carry "attrs"/"attrs_stale" for _gather_hit_geometry (both
        # monolithic and forest tables)
        method, fuse_attr = "pallas", True
    if method == "pallas":
        kw = {} if k_pallas is None else {"kp": k_pallas}
        hit = intersect_bvh_pallas_verified(
            origin, direction, scene.triangles, scene.bvh, active,
            tables=getattr(scene, "ptables", None), fuse_attr=fuse_attr,
            tile_wavefront=tw, **kw,
        )
    elif method == "pallas_fast":
        from raytracing_c_tpu.ops import traverse_pallas as tp

        tabs = getattr(scene, "ptables", None)
        if isinstance(tabs, tp.ForestTables):
            hit = tp.intersect_bvh_pallas_forest(
                origin, direction, tabs, active,
                kp=(2 if k_pallas is None else k_pallas),
            )
        else:
            hit = tp.intersect_bvh_pallas(
                origin, direction, scene.triangles, scene.bvh, active,
                kp=(2 if k_pallas is None else k_pallas),
                tables=tabs,
            )
        hit.pop("dropped_min")
    elif method == "dfs":
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
        if active is not None:
            hit["t"] = jnp.where(active, hit["t"], INF)
        hit["tri"] = jnp.where(jnp.isfinite(hit["t"]), hit["tri"], -1)
    else:
        raise ValueError(f"unknown traversal method '{method}'")

    t_tri = hit["t"]
    tri = jnp.where(jnp.isfinite(t_tri), hit["tri"], -1)

    t_sph, sph = intersect.intersect_spheres(
        origin, direction, scene.spheres, t_tri
    )
    if active is not None:
        sphere_wins = (t_sph < t_tri) & active
    else:
        sphere_wins = t_sph < t_tri
    out = {
        "t": jnp.where(sphere_wins, t_sph, t_tri),
        "tri": jnp.where(sphere_wins, -1, tri),
        "sph": jnp.where(sphere_wins, sph, -1),
        "u": hit["u"],
        "v": hit["v"],
    }
    if "attrs" in hit:
        # fused tier-0 attrs (sphere-won lanes are overridden downstream,
        # _gather_hit_geometry's sphere pass)
        out["attrs"] = hit["attrs"]
        out["attrs_stale"] = hit["attrs_stale"]
    return out
