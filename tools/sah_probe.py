"""Tree-quality probe: reference midpoint splitter vs SAH position sweep.

CPU-only (numpy): builds the helmet BVH both ways and measures the
candidate pressure an exact traversal faces under each tree — the counts
that set tier-0's kp budget and the verified path's suspect rate
(docs/PERF.md round 4: the fetch engine is at MXU peak, so the remaining
lever is fetching FEWER candidates per ray; a tighter tree is the
cheapest way to need fewer).

Metrics per tree, over a 512x288 camera-ray grid (1 ray/px, center
jitter; rays are identical across trees, and the true hit t is
tree-independent, so it is computed once by brute force):

- groups<t:   per-ray count of leaf groups whose AABB entry distance is
              strictly below the ray's true hit t — candidates NO exact
              traversal may prune; the mean is a lower bound on the
              fetches/ray a one-hot design needs, the tail drives repair.
- entered:    per-ray count of groups entered at all (entry < inf).
- union32:    per-32x32-px-tile union of each ray's 4 nearest groups —
              sizes the per-tile fetch set of a tile-shared leaf stage
              (1024 coherent rays/tile; the production bench tiles are
              64px x 16spp and strictly MORE coherent).
- sumSA:      total leaf-group AABB surface area (tree tightness).

Usage: python tools/sah_probe.py [model.glb]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from raytracing_c_tpu import EPSILON  # noqa: E402
from raytracing_c_tpu.io.loader import load_model  # noqa: E402
from raytracing_c_tpu.models.bvh import build_bvh  # noqa: E402
from raytracing_c_tpu.models.scene import Camera  # noqa: E402
from raytracing_c_tpu.render.camera import generate_rays  # noqa: E402

W_IMG, H_IMG, TILE = 512, 288, 32


def camera_rays(camera):
    px, py = np.meshgrid(np.arange(W_IMG), np.arange(H_IMG))
    px = px.reshape(-1).astype(np.int32)
    py = py.reshape(-1).astype(np.int32)
    half = np.full(px.shape, 0.5, np.float32)
    import jax.numpy as jnp

    o, d = generate_rays(
        camera, W_IMG, H_IMG, jnp.asarray(px), jnp.asarray(py),
        jnp.asarray(half), jnp.asarray(half),
    )
    o = np.stack([np.asarray(o.x), np.asarray(o.y), np.asarray(o.z)], -1)
    d = np.stack([np.asarray(d.x), np.asarray(d.y), np.asarray(d.z)], -1)
    return o.astype(np.float32), d.astype(np.float32), px, py


def brute_t(pos, o, d, chunk_r=8192, chunk_t=4096):
    """Nearest-hit t per ray, brute force over all triangles (numpy MT)."""
    n = pos.shape[0]
    t_best = np.full(o.shape[0], np.inf, np.float32)
    v0 = pos[:, 0]
    e1 = pos[:, 1] - pos[:, 0]
    e2 = pos[:, 2] - pos[:, 0]
    for r0 in range(0, o.shape[0], chunk_r):
        oc, dc = o[r0 : r0 + chunk_r], d[r0 : r0 + chunk_r]
        tb = t_best[r0 : r0 + chunk_r]
        for t0 in range(0, n, chunk_t):
            a0, a1, a2 = (
                v0[t0 : t0 + chunk_t][:, None],
                e1[t0 : t0 + chunk_t][:, None],
                e2[t0 : t0 + chunk_t][:, None],
            )
            h = np.cross(dc[None], a2)
            det = (a1 * h).sum(-1)
            inv = 1.0 / np.where(np.abs(det) < 1e-12, np.inf, det)
            s = oc[None] - a0
            u = (s * h).sum(-1) * inv
            q = np.cross(s, a1)
            v = (dc[None] * q).sum(-1) * inv
            t = (a2 * q).sum(-1) * inv
            ok = (u >= 0) & (v >= 0) & (u + v <= 1) & (t > EPSILON)
            t = np.where(ok, t, np.inf).min(axis=0)
            np.minimum(tb, t, out=tb)
        t_best[r0 : r0 + chunk_r] = tb
    return t_best


def group_boxes(mesh, slot_map):
    cap = len(slot_map)
    n_groups = cap // 64
    tri_min = mesh.positions.min(axis=1) - EPSILON
    tri_max = mesh.positions.max(axis=1) + EPSILON
    gmin = np.full((n_groups, 3), np.inf, np.float32)
    gmax = np.full((n_groups, 3), -np.inf, np.float32)
    sm = slot_map.reshape(n_groups, 64)
    for g in range(n_groups):
        tris = sm[g][sm[g] >= 0]
        if len(tris):
            gmin[g] = tri_min[tris].min(axis=0)
            gmax[g] = tri_max[tris].max(axis=0)
    ne = np.isfinite(gmin[:, 0])
    return gmin[ne], gmax[ne]


def entry_dists(gmin, gmax, o, d):
    """Slab entry distance per (ray, group); inf = no entry. (R, G)."""
    inv = 1.0 / np.where(d == 0, 1e-30, d)
    t1 = (gmin[None] - o[:, None]) * inv[:, None]
    t2 = (gmax[None] - o[:, None]) * inv[:, None]
    tmin = np.minimum(t1, t2).max(-1)
    tmax = np.maximum(t1, t2).min(-1)
    hit = (tmax >= np.maximum(tmin, 0.0)) & (tmax > 0)
    return np.where(hit, np.maximum(tmin, 0.0), np.inf)


def stats(tag, gmin, gmax, o, d, t_hit, px, py, build_s):
    ext = gmax - gmin
    sum_sa = float(
        2 * (ext[:, 0] * ext[:, 1] + ext[:, 1] * ext[:, 2]
             + ext[:, 2] * ext[:, 0]).sum()
    )
    # chunk rays for the (R, G) slab matrix
    must = np.zeros(o.shape[0], np.int32)
    entered = np.zeros(o.shape[0], np.int32)
    top4 = np.zeros((o.shape[0], 4), np.int32)
    for r0 in range(0, o.shape[0], 16384):
        e = entry_dists(gmin, gmax, o[r0 : r0 + 16384], d[r0 : r0 + 16384])
        th = t_hit[r0 : r0 + 16384, None]
        must[r0 : r0 + 16384] = (e < th).sum(-1)
        entered[r0 : r0 + 16384] = np.isfinite(e).sum(-1)
        top4[r0 : r0 + 16384] = np.argsort(e, axis=-1)[:, :4]
    # per-tile union of each ray's 4 nearest groups (finite entries only)
    tx, ty = px // TILE, py // TILE
    tid = ty * (W_IMG // TILE) + tx
    unions = []
    for t in range(tid.max() + 1):
        m = tid == t
        unions.append(len(np.unique(top4[m])))
    unions = np.array(unions)
    print(
        f"{tag:7s} build={build_s:5.2f}s groups={len(gmin):4d} "
        f"sumSA={sum_sa:9.1f} | groups<t mean={must.mean():5.2f} "
        f"p95={np.percentile(must, 95):4.0f} max={must.max():4d} | "
        f"entered mean={entered.mean():5.2f} | "
        f"union32 mean={unions.mean():5.1f} p95={np.percentile(unions, 95):4.0f} "
        f"max={unions.max():4d}"
    )


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else (
        "/root/reference/models/helmet.glb"
    )
    mesh, _mats, _atlas, camera = load_model(path, warn=lambda *a: None)
    if camera is None:
        camera = Camera.default()
    o, d, px, py = camera_rays(camera)
    t0 = time.time()
    t_hit = brute_t(mesh.positions.astype(np.float32), o, d)
    print(f"# {path}: {mesh.positions.shape[0]} tris, "
          f"{o.shape[0]} rays, brute={time.time() - t0:.1f}s, "
          f"hit rate={np.isfinite(t_hit).mean():.3f}")
    for tag, sah in (("ref", False), ("sah", True)):
        t0 = time.time()
        _bvh, slot_map, _cap = build_bvh(mesh, sah=sah)
        build_s = time.time() - t0
        gmin, gmax = group_boxes(mesh, slot_map)
        stats(tag, gmin, gmax, o, d, t_hit, px, py, build_s)


if __name__ == "__main__":
    main()
