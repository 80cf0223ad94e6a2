"""VERDICT r2 #4 done-bar: a >= 1M-triangle synthetic scene must traverse
on the (forest) Pallas path, oracle-exact, on the real chip.

Builds a 1.05M-triangle jittered-grid mesh (tree depth 6 -> ForestTables),
fires camera-style rays through the verified forest path, and bit-checks
against the exhaustive chunked oracle ON CHIP (brute force over 1M
triangles x 4k rays is MXU-cheap). Also times the verified forest call on
a 64k batch for the scaling story in docs/PERF.md.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/scale_probe.py
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo/tests")
from helpers import random_mesh, simple_scene  # noqa: E402

from raytracing_c_tpu.ops import intersect, traverse  # noqa: E402
from raytracing_c_tpu.ops import traverse_pallas as tp  # noqa: E402
from raytracing_c_tpu.utils.vec3 import Vec3  # noqa: E402

print("backend:", jax.default_backend(), flush=True)

rng = np.random.default_rng(7)
N = 1_050_000
t0 = time.perf_counter()
scene = simple_scene(random_mesh(N, rng, extent=10.0))
print(f"scene: {N} tris, depth={scene.bvh.depth}, "
      f"build {time.perf_counter()-t0:.1f}s", flush=True)
assert isinstance(scene.ptables, tp.ForestTables), type(scene.ptables)
print(f"forest: {len(scene.ptables.subtrees)} subtrees @ root_level="
      f"{scene.ptables.root_level}", flush=True)

R_CHECK = 4096
o = np.full((R_CHECK, 3), [0.0, 0.0, -30.0], np.float32)
d = rng.normal(size=(R_CHECK, 3)).astype(np.float32)
d[:, 2] = np.abs(d[:, 2]) + 2.0  # aim into the cloud
d /= np.linalg.norm(d, axis=1, keepdims=True)
ov = Vec3(*[jnp.asarray(o[:, i]) for i in range(3)])
dv = Vec3(*[jnp.asarray(d[:, i]) for i in range(3)])

ver = jax.jit(
    lambda o, d: traverse.intersect_bvh_pallas_verified(
        o, d, scene.triangles, scene.bvh, tables=scene.ptables
    )
)(ov, dv)
brute = jax.jit(
    lambda o, d: intersect.intersect_bruteforce_chunked(
        o, d, scene.triangles, jnp.ones((R_CHECK,), bool)
    )
)(ov, dv)

got_t, want_t = np.asarray(ver["t"]), np.asarray(brute["t"])
fin = np.isfinite(want_t)
print("hit rate:", fin.mean(), flush=True)
exact = np.array_equal(
    np.where(np.isfinite(got_t), got_t, 0), np.where(fin, want_t, 0)
) and np.array_equal(np.isfinite(got_t), fin)
tri_ok = np.array_equal(
    np.asarray(ver["tri"])[fin], np.asarray(brute["tri"])[fin]
)
print(f"oracle-exact t: {exact}; tri ids equal: {tri_ok}", flush=True)
if not exact:
    bad = np.nonzero(got_t != want_t)[0]
    rel = np.abs(got_t[bad] - want_t[bad]) / np.maximum(want_t[bad], 1e-9)
    print(f"  {len(bad)} mismatches, max rel {rel.max():.3e} "
          f"(MT conditioning class if ~1e-4)", flush=True)

# throughput on a 64k batch
R = 64 * 1024
ob = Vec3(*[jnp.tile(jnp.asarray(o[:, i]), R // R_CHECK) for i in range(3)])
db = Vec3(*[jnp.tile(jnp.asarray(d[:, i]), R // R_CHECK) for i in range(3)])
f = jax.jit(
    lambda o, d: traverse.intersect_bvh_pallas_verified(
        o, d, scene.triangles, scene.bvh, tables=scene.ptables
    )["t"]
)
np.asarray(f(ob, db)[:8])
best = np.inf
for _ in range(3):
    t1 = time.perf_counter()
    np.asarray(f(ob, db)[:8])
    best = min(best, time.perf_counter() - t1)
print(f"verified forest 64k rays: {best*1e3:.1f} ms "
      f"({R/best/1e6:.2f} Mrays/s)", flush=True)
