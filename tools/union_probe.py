"""Per-KERNEL-TILE leaf-group union census — sizes the stage_mt buffer.

The round-5 candidate representation (VERDICT r4 #1) amortizes the leaf
phase per kernel tile: stage the tile's UNION of selected groups once,
then run Moller-Trumbore for EVERY lane against the staged union
directly — no per-lane refetch, no per-lane int8x4 word assembly. Its
cost is U_MT * 64 triangle tests per lane, so the whole design lives or
dies on the per-tile union size U:

  saving(U)  ~  [refetch 2.0 + assembly 2.8 + per-lane MT 1.4] ms/256k
              - [U/4 * 1.4 MT + select] ms/256k        (numbers: PERF r4)

This probe measures the union distribution at PRODUCTION geometry: rays
in the renderer's exact pixel order (32x32 tile scan, _pixel_tables),
kernel tiles = 1024 consecutive rays = 64 consecutive pixels at 16 spp
(spp jitter moves a ray < 1 px, so 1 ray/px unions are the right proxy).
Per tile it reports the union of each lane's kp-NEAREST groups by slab
entry distance — the same candidate proxy as tools/quant_probe.py
(CAVEAT recorded there: production tier-0 derives kp groups from the
hierarchical ksel=8 selection, which can only pick a SUBSET of parents,
so nearest-kp slightly over-states the union).

Usage: python tools/union_probe.py [model ...]   (default helmet+tower)
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from raytracing_c_tpu.io.loader import load_model  # noqa: E402
from raytracing_c_tpu.models.bvh import build_bvh  # noqa: E402
from raytracing_c_tpu.models.scene import Camera  # noqa: E402
from raytracing_c_tpu.render.camera import generate_rays  # noqa: E402
from raytracing_c_tpu.render.renderer import _pixel_tables  # noqa: E402
from tools.sah_probe import entry_dists, group_boxes  # noqa: E402

W_IMG, H_IMG = 1920, 1080
PX_PER_TILE = 64  # 1024-ray kernel tile / 16 spp


def census(path):
    mesh, _mats, _atlas, camera = load_model(path, warn=lambda *a: None)
    if camera is None:
        camera = Camera.default()
    _bvh, slot_map, _cap = build_bvh(mesh)
    gmin, gmax = group_boxes(mesh, slot_map)

    # production pixel order (tile scan), one ray per pixel, center jitter
    xs, ys, _ = _pixel_tables(W_IMG, H_IMG, pad=1)
    n = W_IMG * H_IMG
    xs, ys = xs[:n], ys[:n]
    import jax.numpy as jnp

    half = jnp.full((n,), 0.5, jnp.float32)
    o, d = generate_rays(
        camera, W_IMG, H_IMG, jnp.asarray(xs), jnp.asarray(ys), half, half
    )
    o = np.stack([np.asarray(o.x), np.asarray(o.y), np.asarray(o.z)], -1)
    d = np.stack([np.asarray(d.x), np.asarray(d.y), np.asarray(d.z)], -1)

    print(f"# {path}: {mesh.positions.shape[0]} tris, "
          f"{len(gmin)} groups, {n} px @ {W_IMG}x{H_IMG}")

    for kp in (2, 4):
        # kp-nearest groups per ray (inf-entry slots excluded from unions)
        topk = np.full((n, kp), -1, np.int64)
        for r0 in range(0, n, 65536):
            e = entry_dists(gmin, gmax, o[r0:r0 + 65536], d[r0:r0 + 65536])
            idx = np.argsort(e, axis=-1)[:, :kp]
            fin = np.isfinite(np.take_along_axis(e, idx, axis=-1))
            topk[r0:r0 + 65536] = np.where(fin, idx, -1)

        n_tiles = n // PX_PER_TILE
        usz = np.zeros(n_tiles, np.int32)
        for t in range(n_tiles):
            sel = topk[t * PX_PER_TILE:(t + 1) * PX_PER_TILE]
            u = np.unique(sel)
            usz[t] = len(u[u >= 0])
        geo = usz[usz > 0]  # tiles that touch geometry at all
        hist = " ".join(
            f"U<={u}:{(usz <= u).mean() * 100:.1f}%"
            for u in (4, 8, 12, 16, 24, 32)
        )
        print(
            f"  kp={kp}: union/tile mean={usz.mean():.2f} "
            f"p95={np.percentile(usz, 95):.0f} p99={np.percentile(usz, 99):.0f} "
            f"max={usz.max()} | geom-tiles mean={geo.mean():.2f} "
            f"p95={np.percentile(geo, 95):.0f} | {hist}"
        )
        # lane-weighted overflow: fraction of (lane, group) wants that
        # would MISS a U-slot buffer filled in column-id order (the
        # _stage_union prefix rule) -> these lanes hit the certificate
        for u_cap in (8, 12, 16):
            miss = 0
            want = 0
            for t in range(n_tiles):
                sel = topk[t * PX_PER_TILE:(t + 1) * PX_PER_TILE]
                uniq = np.unique(sel)
                uniq = uniq[uniq >= 0]
                if len(uniq) <= u_cap:
                    continue
                kept = set(uniq[:u_cap])  # column-id order prefix
                flat = sel[sel >= 0]
                want += len(flat)
                miss += sum(1 for g in flat if g not in kept)
            tot_want = (topk >= 0).sum()
            print(f"    U={u_cap}: lane-want overflow "
                  f"{miss / max(tot_want, 1) * 100:.3f}% of all wants")


def main():
    paths = sys.argv[1:] or [
        "/root/reference/models/helmet.glb",
        "/root/reference/models/tower.obj",
    ]
    for p in paths:
        census(p)


if __name__ == "__main__":
    main()
