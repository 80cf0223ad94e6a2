"""Quantized-prefilter census: would an int8 per-triangle AABB prefilter
cut the leaf-stage exact-fetch bytes?

Round-4 close (docs/PERF.md): the leaf fetch runs at ~78% of MXU peak, so
the remaining lever is fetching FEWER BYTES per ray, not scheduling. The
cheapest byte diet keeps the tree and the groups but splits the leaf
stage in two:

  phase 1  fetch per-triangle CONSERVATIVE int8 AABBs (6 bytes/tri, 384
           bytes/group vs 2304 today) for the kp nearest groups, slab
           them, and MT the nearest few candidates exactly to obtain a
           provisional t;
  phase 2  fetch EXACT MT rows (36 bytes/tri at int8x4) only for
           triangles whose conservative entry distance beats the
           provisional t — the survivors.

The design pays off iff (a) survivors per ray are few, (b) the true hit
triangle ranks at the top of the conservative-entry order (else phase 1
needs many exact MTs to seed the bound), and (c) per-tile survivor
UNIONS fit a <=128-slot staging buffer (the SHARED machinery,
traverse_pallas.py). This probe measures all three on the reference
trees, CPU-only, for camera rays and a bounce-1 proxy (cosine hemisphere
at the camera hit points — less coherent, stresses the unions).

Quantization: tri AABBs stored as uint8 lo/hi per axis relative to the
GROUP AABB, lo floored / hi ceiled (dequantized box always contains the
true box, so the prefilter can only over-approve — exactness is free;
the existing certificate is untouched because phase 2 re-tests exactly).

Metrics per ray set:
  cand       triangles resident in the ray's kp=4 globally-nearest groups
             by slab entry over ALL groups — an OPTIMISTIC proxy for what
             tier-0 fetches exactly today: production derives its kp
             groups from the ksel=8 hierarchical candidate selection
             (traverse_pallas.py), which can pick a different (never
             better-ranked) set, so `cand` may under/over-state the real
             fetch set slightly
  surv_f32   candidates whose EXACT tri-AABB entry <= t_hit (the
             irreducible survivor count with a perfect provisional t)
  surv_q8    same with the conservative int8 AABBs (adds quantization
             slack — the number phase 2 actually pays)
  hitrank    rank of the true hit triangle in the q8 entry order
             (p50/p95/max; phase 1 must MT ~hitrank tris to seed t)
  union32    per-32x32-px-tile union of q8 survivors (staging budget)
  missq8     for MISS rays: candidates the q8 filter cannot reject
             (no t bound exists; phase 2 pays all of them)

Usage: python tools/quant_probe.py [model ...]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from sah_probe import camera_rays  # noqa: E402

from raytracing_c_tpu import EPSILON  # noqa: E402
from raytracing_c_tpu.io.loader import load_model  # noqa: E402
from raytracing_c_tpu.models.bvh import build_bvh  # noqa: E402
from raytracing_c_tpu.models.scene import Camera  # noqa: E402

TILE = 32
KP = 4  # groups fetched by the production tier-0 pass


def brute_hit(pos, o, d, chunk_r=8192, chunk_t=4096):
    """(t, tri_id) of the nearest hit per ray, brute force (numpy MT)."""
    n = pos.shape[0]
    t_best = np.full(o.shape[0], np.inf, np.float32)
    id_best = np.full(o.shape[0], -1, np.int64)
    v0 = pos[:, 0]
    e1 = pos[:, 1] - pos[:, 0]
    e2 = pos[:, 2] - pos[:, 0]
    for r0 in range(0, o.shape[0], chunk_r):
        oc, dc = o[r0:r0 + chunk_r], d[r0:r0 + chunk_r]
        tb = t_best[r0:r0 + chunk_r]
        ib = id_best[r0:r0 + chunk_r]
        for t0 in range(0, n, chunk_t):
            a0 = v0[t0:t0 + chunk_t][:, None]
            a1 = e1[t0:t0 + chunk_t][:, None]
            a2 = e2[t0:t0 + chunk_t][:, None]
            h = np.cross(dc[None], a2)
            det = (a1 * h).sum(-1)
            inv = 1.0 / np.where(np.abs(det) < 1e-12, np.inf, det)
            s = oc[None] - a0
            u = (s * h).sum(-1) * inv
            q = np.cross(s, a1)
            v = (dc[None] * q).sum(-1) * inv
            t = (a2 * q).sum(-1) * inv
            ok = (u >= 0) & (v >= 0) & (u + v <= 1) & (t > EPSILON)
            t = np.where(ok, t, np.inf)
            k = t.argmin(axis=0)
            tm = t[k, np.arange(t.shape[1])]
            better = tm < tb
            ib[better] = (t0 + k)[better]
            np.minimum(tb, tm, out=tb)
        t_best[r0:r0 + chunk_r] = tb
        id_best[r0:r0 + chunk_r] = ib
    return t_best, id_best


def group_tables(mesh, slot_map):
    """Per nonempty group: AABB, member tri ids, and tri AABBs both exact
    and int8-conservative (dequantized)."""
    pos = mesh.positions.astype(np.float32)
    tri_min = pos.min(axis=1) - EPSILON
    tri_max = pos.max(axis=1) + EPSILON
    sm = np.asarray(slot_map).reshape(-1, 64)
    groups = []
    for g in range(sm.shape[0]):
        tris = sm[g][sm[g] >= 0]
        if not len(tris):
            continue
        lo = tri_min[tris]
        hi = tri_max[tris]
        gmin = lo.min(axis=0)
        gmax = hi.max(axis=0)
        ext = np.maximum(gmax - gmin, 1e-12)
        qlo = np.floor((lo - gmin) / ext * 255.0).clip(0, 255)
        qhi = np.ceil((hi - gmin) / ext * 255.0).clip(0, 255)
        dlo = gmin + qlo / 255.0 * ext
        dhi = gmin + qhi / 255.0 * ext
        # conservative by construction; assert anyway (float dequant)
        dlo = np.minimum(dlo, lo)
        dhi = np.maximum(dhi, hi)
        groups.append((gmin, gmax, tris, lo, hi, dlo, dhi))
    return groups


def slab_entry(lo, hi, o, d):
    """Entry distance of rays (R,3) into boxes (B,3); inf = miss. (R,B)."""
    inv = 1.0 / np.where(d == 0, 1e-30, d)
    t1 = (lo[None] - o[:, None]) * inv[:, None]
    t2 = (hi[None] - o[:, None]) * inv[:, None]
    tmin = np.minimum(t1, t2).max(-1)
    tmax = np.maximum(t1, t2).min(-1)
    ok = (tmax >= np.maximum(tmin, 0.0)) & (tmax > 0)
    return np.where(ok, np.maximum(tmin, 0.0), np.inf)


def census(tag, groups, o, d, t_hit, hit_id, px, py):
    n_rays = o.shape[0]
    g_lo = np.stack([g[0] for g in groups])
    g_hi = np.stack([g[1] for g in groups])
    cand = np.zeros(n_rays, np.int32)
    surv_f = np.zeros(n_rays, np.int32)
    surv_q = np.zeros(n_rays, np.int32)
    miss_q = np.full(n_rays, -1, np.int32)
    hitrank = np.full(n_rays, -1, np.int32)
    # per-ray global ids of q8 survivors, padded, for tile unions. Sized
    # KP*64 (every candidate can survive) so union32 is known-exact; a
    # 64-slot cap silently truncated whenever surv_q > 64 (ADVICE r4)
    surv_ids = np.full((n_rays, KP * 64), -1, np.int64)
    for r0 in range(0, n_rays, 8192):
        oc, dc = o[r0:r0 + 8192], d[r0:r0 + 8192]
        th = t_hit[r0:r0 + 8192]
        hid = hit_id[r0:r0 + 8192]
        ge = slab_entry(g_lo, g_hi, oc, dc)  # (r, G)
        near = np.argsort(ge, axis=-1)[:, :KP]
        gsel = np.take_along_axis(ge, near, axis=-1)
        for i in range(oc.shape[0]):
            ks = near[i][np.isfinite(gsel[i])]
            if not len(ks):
                cand[r0 + i] = 0
                continue
            tris = np.concatenate([groups[k][2] for k in ks])
            lo = np.concatenate([groups[k][3] for k in ks])
            hi = np.concatenate([groups[k][4] for k in ks])
            dlo = np.concatenate([groups[k][5] for k in ks])
            dhi = np.concatenate([groups[k][6] for k in ks])
            ef = slab_entry(lo, hi, oc[i:i + 1], dc[i:i + 1])[0]
            eq = slab_entry(dlo, dhi, oc[i:i + 1], dc[i:i + 1])[0]
            cand[r0 + i] = len(tris)
            if np.isfinite(th[i]):
                sf = ef <= th[i]
                sq = eq <= th[i]
                surv_f[r0 + i] = sf.sum()
                surv_q[r0 + i] = sq.sum()
                ids = tris[sq]
                surv_ids[r0 + i, :len(ids)] = ids
                where = np.nonzero(tris == hid[i])[0]
                if len(where):
                    hitrank[r0 + i] = (eq < eq[where[0]]).sum()
            else:
                miss_q[r0 + i] = np.isfinite(eq).sum()
    hit = np.isfinite(t_hit)
    ranked = hitrank[hit & (hitrank >= 0)]
    in_k4 = float((hitrank[hit] >= 0).mean()) if hit.any() else 0.0

    def _p(arr, q):
        """np.percentile guarded for empty arrays (degenerate ray sets on
        arbitrary CLI models: no hits, or no hit tri inside cand)."""
        return float(np.percentile(arr, q)) if len(arr) else float("nan")

    def _mean(arr):
        return float(arr.mean()) if len(arr) else float("nan")

    def _max(arr):
        return int(arr.max()) if len(arr) else -1
    # per-tile unions of q8 survivors
    tx, ty = px // TILE, py // TILE
    tid = ty * (px.max() // TILE + 1) + tx
    unions = []
    for t in np.unique(tid):
        ids = surv_ids[tid == t]
        ids = ids[ids >= 0]
        unions.append(len(np.unique(ids)))
    unions = np.array(unions) if unions else np.zeros(1, np.int32)
    hc, hs_f, hs_q = cand[hit], surv_f[hit], surv_q[hit]
    print(
        f"{tag:10s} rays={n_rays} hit={hit.mean():.3f} | "
        f"cand mean={_mean(hc):6.1f} | "
        f"surv f32 mean={_mean(hs_f):5.2f} p95={_p(hs_f, 95):3.0f} "
        f"| surv q8 mean={_mean(hs_q):5.2f} p95={_p(hs_q, 95):3.0f} "
        f"max={_max(hs_q):4d} | hit-in-k4={in_k4:.4f} "
        f"hitrank p50={_p(ranked, 50):2.0f} p95={_p(ranked, 95):3.0f} "
        f"max={_max(ranked):4d} | "
        f"missq8 mean={_mean(miss_q[miss_q >= 0]):6.1f} | "
        f"union32 mean={unions.mean():5.1f} p95={_p(unions, 95):4.0f} "
        f"max={unions.max():4d}",
        flush=True,
    )


def bounce_rays(pos, o, d, t_hit, hit_id, rng):
    """Cosine-hemisphere bounce proxy at the camera hits (geometric n)."""
    m = np.isfinite(t_hit)
    p = o[m] + d[m] * t_hit[m, None]
    tri = pos[hit_id[m]]
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    n /= np.linalg.norm(n, axis=-1, keepdims=True) + 1e-30
    n = np.where((n * d[m]).sum(-1, keepdims=True) > 0, -n, n)
    u1, u2 = rng.random(len(p)), rng.random(len(p))
    r = np.sqrt(u1)
    phi = 2 * np.pi * u2
    a = np.where(np.abs(n[:, :1]) < 0.9,
                 np.array([[1.0, 0, 0]]), np.array([[0, 1.0, 0]]))
    tx = np.cross(n, a)
    tx /= np.linalg.norm(tx, axis=-1, keepdims=True) + 1e-30
    ty = np.cross(n, tx)
    nd = (tx * (r * np.cos(phi))[:, None] + ty * (r * np.sin(phi))[:, None]
          + n * np.sqrt(1 - u1)[:, None])
    return (p + n * 1e-4).astype(np.float32), nd.astype(np.float32), m


def main():
    paths = sys.argv[1:] or ["/root/reference/models/helmet.glb"]
    rng = np.random.default_rng(7)
    for path in paths:
        mesh, _m, _a, camera = load_model(path, warn=lambda *a: None)
        if camera is None:
            camera = Camera.default()
        pos = mesh.positions.astype(np.float32)
        o, d, px, py = camera_rays(camera)
        t0 = time.time()
        t_hit, hit_id = brute_hit(pos, o, d)
        _bvh, slot_map, _cap = build_bvh(mesh)
        groups = group_tables(mesh, slot_map)
        print(f"# {path}: {pos.shape[0]} tris, {len(groups)} groups, "
              f"brute={time.time() - t0:.1f}s", flush=True)
        census("camera", groups, o, d, t_hit, hit_id, px, py)
        bo, bd, m = bounce_rays(pos, o, d, t_hit, hit_id, rng)
        bt, bid = brute_hit(pos, bo, bd)
        census("bounce1", groups, bo, bd, bt, bid, px[m], py[m])


if __name__ == "__main__":
    main()
