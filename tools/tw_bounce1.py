"""Can compaction-time coherence sorting earn tile-wavefront traversal
for BOUNCE-1 rays? (VERDICT r4 #4; docs/PERF.md r5.)

Bounce-1 rays are genuinely incoherent under the production activity-only
compaction (stagemt_ab2 measured 31.8% staging suspects). But the RNG is
schedule-invariant, so the bucket compactor may order live lanes ANY way
for free (images bit-identical) — this probe measures whether a secondary
sort key clusters bounce-1 rays enough for the TW tile vote:

  act        activity only (production today)
  oct        + direction octant (the r3 SORT_OCTANT key, measured no-op
             for FETCH coherence; TW needs WAY more)
  grp        + bounce-0 winner leaf group (hit-surface locality)
  grp+oct    + both (group major, octant minor)

For each ordering: TW suspect rate on the live front slice at UL=6/8 +
per-lane baseline, then verified-path timings per-lane vs TW.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/tw_bounce1.py
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from raytracing_c_tpu.io.loader import load_scene
from raytracing_c_tpu.ops import traverse
from raytracing_c_tpu.ops import traverse_pallas as tp
from raytracing_c_tpu.render import camera as cam
from raytracing_c_tpu.render import integrator
from raytracing_c_tpu.render.renderer import _pixel_tables
from raytracing_c_tpu.utils.vec3 import Vec3

ITERS = 8
SPP = 16
NPX = 16 * 1024
R = NPX * SPP

print("backend:", jax.default_backend(), flush=True)
scene = load_scene(
    "/root/reference/models/helmet.glb", background_path=None,
    warn=lambda *a: None,
)
tris, bvh, PT = scene.triangles, scene.bvh, scene.ptables

xs_all, ys_all, _ = _pixel_tables(1920, 1080, pad=1)
n_img = 1920 * 1080
xs_all, ys_all = np.asarray(xs_all[:n_img]), np.asarray(ys_all[:n_img])
center = np.argmin((xs_all - 960.0) ** 2 + (ys_all - 540.0) ** 2)
b0 = max(0, min(int(center) - NPX // 2, n_img - NPX))
px = jnp.repeat(jnp.asarray(xs_all[b0:b0 + NPX]), SPP)
py = jnp.repeat(jnp.asarray(ys_all[b0:b0 + NPX]), SPP)
key = jax.random.PRNGKey(0)
u2 = jax.random.uniform(key, (2, R), jnp.float32)
o, d = cam.generate_rays(scene.camera, 1920, 1080, px, py, u2[0], u2[1])

# bounce 0: winner groups + the advanced state
h0 = jax.jit(
    lambda o, d: tp.intersect_bvh_pallas(
        o, d, tris, bvh, jnp.ones((R,), bool), kp=4, tables=PT
    )
)(o, d)
g0 = np.asarray(jnp.where(h0["tri"] >= 0, h0["tri"] >> 6, -1))

st = {
    "origin": o, "direction": d,
    "throughput": Vec3.full((R,), 1.0), "radiance": Vec3.zeros((R,)),
    "active": jnp.ones((R,), bool), "rays": jnp.float32(0.0),
}
u4 = jax.random.uniform(jax.random.fold_in(key, 0), (4, R), jnp.float32)
st = jax.jit(
    lambda st: integrator.bounce_step(scene, st, u4, method="pallas")
)(st)

act = np.asarray(st["active"])
ox, oy, oz = (np.asarray(getattr(st["origin"], c)) for c in "xyz")
dx, dy, dz = (np.asarray(getattr(st["direction"], c)) for c in "xyz")
octant = (dx < 0) * 4 + (dy < 0) * 2 + (dz < 0)
live = int(act.sum())
width = max((live + 511) // 512 * 512, 512)
print(f"bounce-1 live {live}/{R} -> front slice {width}", flush=True)

ORDERINGS = {
    "act": (~act,),
    "oct": (octant, ~act),
    "grp": (g0, ~act),
    "grp+oct": (octant, g0, ~act),
}


def timed(name, fn, o_, d_, a_):
    def run(o2, d2, a2):
        def body(i, carry):
            t, ox2 = carry
            oo = Vec3(ox2 + jnp.minimum(t, 1.0) * 0.0, o2.y, o2.z)
            return fn(oo, d2, a2), ox2

        t, _ = jax.lax.fori_loop(
            0, ITERS, body, (jnp.zeros((width,), jnp.float32), o2.x)
        )
        return t

    f = jax.jit(run)
    np.asarray(f(o_, d_, a_)[:8])
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f(o_, d_, a_)[:8])
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{name}: {best*1e3:8.2f} ms/{width//1024}k-slice", flush=True)


for name, keys_ in ORDERINGS.items():
    # np.lexsort: last key is primary -> activity always primary
    order = np.lexsort(keys_)
    oo = Vec3(*(jnp.asarray(v[order][:width]) for v in (ox, oy, oz)))
    dd = Vec3(*(jnp.asarray(v[order][:width]) for v in (dx, dy, dz)))
    aa = jnp.asarray(act[order][:width])
    sus = {}
    for mode, ul in (("pl", 6), ("tw6", 6), ("tw8", 8)):
        tp.TW_UL = ul
        h = jax.jit(
            lambda o2, d2, a2, m=mode: tp.intersect_bvh_pallas(
                o2, d2, tris, bvh, a2, kp=4, tables=PT,
                tile_wavefront=m != "pl",
            )
        )(oo, dd, aa)
        s = np.asarray(h["dropped_min"] < h["t"]) & np.asarray(aa)
        sus[mode] = s.sum() / max(live, 1)
    print(
        f"{name:>8}: suspects per-lane {sus['pl']*100:.2f}% | "
        f"tw UL=6 {sus['tw6']*100:.2f}% | tw UL=8 {sus['tw8']*100:.2f}%",
        flush=True,
    )
    tp.TW_UL = 6
    if name in ("act", "grp+oct", "grp"):
        for mode in ("per-lane", "tw"):
            tp.TW = mode == "tw"
            timed(
                f"{name} verified {mode}",
                lambda o2, d2, a2: traverse.intersect_bvh_pallas_verified(
                    o2, d2, tris, bvh, a2, tables=PT,
                    tile_wavefront=tp.TW,
                )["t"],
                oo, dd, aa,
            )
        tp.TW = False
tp.TW = False
tp.TW_UL = 6
