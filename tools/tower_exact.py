"""Decisive tower traversal check — MC-noise-free (VERDICT r2 weak #2).

tools/tower_diag.py compared full 2-spp RENDERS (pallas vs topk, same
seed): 12.2 dB. That number is dominated by Monte-Carlo path divergence —
any f32-conditioning t-flip on ONE bounce decorrelates the whole path, so
at 2 spp the image delta measures flip amplification, not traversal error.

This probe removes the MC loop entirely: intersect tower's ACTUAL camera
rays (256^2, center jitter) once with each implementation and compare hit
distances/ids against the brute-force oracle directly. Verified paths
must be oracle-exact up to the documented Moller-Trumbore conditioning
class (tests/test_traverse_pallas.py); any structural defect shows up as
unexplained mismatches here, on the real scene.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/tower_exact.py
"""

import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from raytracing_c_tpu.io.loader import load_scene
from raytracing_c_tpu.ops import traverse
from raytracing_c_tpu.render import camera as cam

SIZE = 256
TIGHT = dict(rtol=1e-5, atol=1e-6)
LOOSE = dict(rtol=1e-2, atol=1e-4)


def main() -> int:
    print("backend:", jax.default_backend())
    scene = load_scene("/root/reference/models/tower.obj",
                       background_path=None, warn=lambda *a: None)
    ids = np.arange(SIZE * SIZE, dtype=np.int64)
    px = jnp.asarray((ids % SIZE).astype(np.int32))
    py = jnp.asarray((ids // SIZE).astype(np.int32))
    half = jnp.full((SIZE * SIZE,), 0.5, jnp.float32)
    o, d = cam.generate_rays(scene.camera, SIZE, SIZE, px, py, half, half)

    hits = {}
    for method in ("brute", "pallas", "topk"):
        h = jax.jit(
            lambda o, d, m=method: traverse.intersect_scene(
                scene, o, d, method=m
            )
        )(o, d)
        hits[method] = {k: np.asarray(v) for k, v in h.items()}
        print(f"{method}: {np.isfinite(hits[method]['t']).sum()} hits "
              f"/ {SIZE * SIZE} rays")

    want = hits["brute"]
    rc = 0
    for method in ("pallas", "topk"):
        got = hits[method]
        fin = lambda a: np.where(np.isfinite(a), a, 1e30)  # noqa: E731
        tight = np.isclose(fin(got["t"]), fin(want["t"]), **TIGHT)
        loose = np.isclose(fin(got["t"]), fin(want["t"]), **LOOSE)
        graze = ~tight & loose
        bad = ~tight & ~loose
        tri_flip = (
            tight & (got["tri"] != want["tri"]) & np.isfinite(want["t"])
        )
        print(f"{method:6s} vs oracle: tight {tight.mean():.6f}  "
              f"conditioning-class {graze.sum()}  "
              f"tri-flips-at-equal-t {tri_flip.sum()}  "
              f"UNEXPLAINED {bad.sum()}")
        if bad.sum():
            i = np.nonzero(bad)[0][:5]
            print("  idx", i, "got", got["t"][i], "want", want["t"][i])
            for j in i:
                print(f"  ray {j}: o=({float(o.x[j]):.9g},"
                      f"{float(o.y[j]):.9g},{float(o.z[j]):.9g}) "
                      f"d=({float(d.x[j]):.9g},{float(d.y[j]):.9g},"
                      f"{float(d.z[j]):.9g}) want_tri={want['tri'][j]}")
            rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
