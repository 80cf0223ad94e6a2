"""Stage ablation of the REAL fused traversal kernel (tier-0 cost anatomy).

tools/overlap_probe.py's synthetic kernel measured rates ~16x below what
the real kernel demonstrably achieves (its int8 dots did not lower to the
MXU path the production fetch gets), so its overlap verdict is unusable.
This probe instead ablates the production kernel itself: each variant
monkeypatches ONE stage of ops/traverse_pallas.py to a dependency-
preserving stub (values become garbage; shapes and the fetch->select->
fetch chain stay), then times intersect_bvh_pallas tier-0 (ksel=8, kp=4)
on 256k helmet camera rays. full - variant = that stage's SERIAL
contribution; if the contributions sum to far more than `full`, Mosaic is
already overlapping units and there is no restructuring win left.

Variants:
  full    : unmodified kernel
  nomxu   : _fetch_split -> zeros (all one-hot MXU fetches removed)
  noslab  : _slab48 -> rows[0:8] passthrough (AABB VPU math removed)
  nomt    : moller_trumbore -> passthrough (leaf test VPU math removed)
  noext   : _extract -> static first-n selection (the min-pop chain
            removed; downstream deps preserved via the payload slice)
  fetch1  : like full but _fetch_split fetches column 0 (static one-hot):
            MXU matmuls still execute at full shape — isolates whether
            the DYNAMIC one-hot construction (iota==ids) costs anything

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate_probe.py
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from raytracing_c_tpu.io.loader import load_scene
from raytracing_c_tpu.render import camera as cam
from raytracing_c_tpu.ops import intersect
from raytracing_c_tpu.ops import traverse_pallas as tp
from raytracing_c_tpu.utils.vec3 import Vec3

ITERS = 8
R = 256 * 1024

print("backend:", jax.default_backend(), flush=True)
scene = load_scene(
    "/root/reference/models/helmet.glb", background_path=None,
    warn=lambda *a: None,
)

ids = np.arange(R, dtype=np.int64)
w = 1024
px = jnp.asarray((ids % w).astype(np.int32))
py = jnp.asarray(((ids // w) % w).astype(np.int32))
rng = np.random.default_rng(0)
o_cam, d_cam = cam.generate_rays(
    scene.camera, w, w, px, py,
    jnp.asarray(rng.random(R, np.float32)),
    jnp.asarray(rng.random(R, np.float32)),
)

ORIG_FETCH = tp._fetch_split
ORIG_SLAB = tp._slab48
ORIG_EXTRACT = tp._extract
ORIG_MT = intersect.moller_trumbore


def _stub_fetch(table_ref, ids, interp=False):
    w_ = table_ref.shape[0] // (4 if table_ref.dtype == jnp.int8 else 3)
    # consume ids so the select->fetch dependency edge survives; build the
    # (w_, R) result via an explicit int broadcast (a broadcasted f32
    # zeros+dep crashed the Mosaic strided-slice layout pass)
    return jnp.broadcast_to(
        ids * 0, (w_, ids.shape[-1])
    ).astype(jnp.float32)


def _fetch_col0(table_ref, ids, interp=False):
    # full-shape MXU matmul against a STATIC one-hot (column 0): same MXU
    # work, no dynamic iota==ids comparison
    g = table_ref.shape[1]
    zero = (ids * 0).astype(ids.dtype)
    return ORIG_FETCH(table_ref, zero, interp)


def _stub_slab(o, inv, bmin, bmax, eps, tmax):
    return bmin.x + o.x * 1e-30 + 0.0 * tmax


def _stub_slab48(rows, o, inv, tmax):
    d = rows[0:8] + o.x * 1e-30 + 0.0 * tmax
    return jnp.abs(d) + 1.0  # positive finite "distances"


def _stub_mt(o, d, v0, e1, e2):
    t = jnp.abs(v0.x + o.x * 1e-30) + 1.0
    return t, t * 0.25, t * 0.25


def _stub_extract(keys, n, payload=None):
    sel = keys[:n]
    if payload is not None:
        return sel, keys, payload[:n]
    return sel, keys


VARIANTS = {
    "full": {},
    "noslab": {"slab": _stub_slab48},
    "nomt": {"mt": _stub_mt},
    "noext": {"ext": _stub_extract},
    "fetch1": {"fetch": _fetch_col0},
    "nomxu": {"fetch": _stub_fetch},
}


def timed(name, patch, fuse):
    tp._fetch_split = patch.get("fetch", ORIG_FETCH)
    tp._slab48 = patch.get("slab", ORIG_SLAB)
    tp._extract = patch.get("ext", ORIG_EXTRACT)
    intersect.moller_trumbore = patch.get("mt", ORIG_MT)
    try:
        def run(o, d):
            def body(i, carry):
                oo = Vec3(o.x + carry * 1e-30, o.y, o.z)
                hit = tp.intersect_bvh_pallas(
                    oo, d, scene.triangles, scene.bvh, kp=4, ksel=8,
                    tables=scene.ptables, fuse_attr=fuse,
                )
                return jnp.minimum(jnp.nan_to_num(hit["t"], posinf=1.0), 1.0)

            return jax.lax.fori_loop(
                0, ITERS, body, jnp.zeros((R,), jnp.float32)
            )

        f = jax.jit(run)
        np.asarray(f(o_cam, d_cam)[:8])
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(o_cam, d_cam)[:8])
            best = min(best, (time.perf_counter() - t0) / ITERS)
        print(f"{name:8s} fuse={int(fuse)}: {best * 1e3:7.3f} ms/256k",
              flush=True)
        return best
    finally:
        tp._fetch_split = ORIG_FETCH
        tp._slab48 = ORIG_SLAB
        tp._extract = ORIG_EXTRACT
        intersect.moller_trumbore = ORIG_MT


def main():
    res = {}
    for fuse in (False, True):
        for name, patch in VARIANTS.items():
            if fuse and name not in ("full", "nomxu"):
                continue  # the fused pass only needs the MXU split
            try:
                res[(name, fuse)] = timed(name, patch, fuse)
            except Exception as e:
                print(f"{name} fuse={int(fuse)}: FAILED "
                      f"({type(e).__name__}: {str(e)[:120]})", flush=True)
    full = res.get(("full", False))
    if full is None:
        return
    print("serial contributions (full - variant), tier-0:")
    tot = 0.0
    for n in ("nomxu", "noslab", "nomt", "noext", "fetch1"):
        if (n, False) in res:
            v = full - res[(n, False)]
            tot += v if n != "fetch1" else 0.0
            print(f"  {n:8s}: {v * 1e3:6.3f} ms")
    print(f"  sum     : {tot * 1e3:6.3f} ms (full = {full * 1e3:.3f} ms)")
    if ("full", True) in res:
        print(f"attr fetch serial cost (fused full - tier0 full): "
              f"{(res[('full', True)] - full) * 1e3:.3f} ms")


if __name__ == "__main__":
    main()
