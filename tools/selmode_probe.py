"""Suspect-rate cost of the cheap per-parent selection (SELMODE "parent").

Per-parent selection cuts the tier-0 pop chain ~8x (see
traverse_pallas.SELMODE) but may rank a worse candidate set; the price
shows up ONLY as a higher suspect rate (dropped_min < t), which the
verified path repairs exactly. This probe measures that rate on CPU
(interpret mode) for helmet camera rays and for an incoherent bounce-1
style distribution, at tier-0 settings (ksel=8, kp=4), plus bit-equality
of the VERIFIED result between modes.

Run: python tools/selmode_probe.py  (CPU, ~2 min)
"""

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from raytracing_c_tpu.io.loader import load_scene
from raytracing_c_tpu.ops import traverse, traverse_pallas as tp
from raytracing_c_tpu.render import camera as cam
from raytracing_c_tpu.utils.vec3 import Vec3

R = 8192

scene = load_scene(
    "/root/reference/models/helmet.glb", background_path=None,
    warn=lambda *a: None,
)
tris, bvh, PT = scene.triangles, scene.bvh, scene.ptables

ids = np.arange(R // 4, dtype=np.int32)
px = jnp.repeat(jnp.asarray(832 + ids % 64), 4)
py = jnp.repeat(jnp.asarray(476 + (ids // 64) % 64), 4)
key = jax.random.PRNGKey(0)
jit_u = jax.random.uniform(key, (2, R), jnp.float32)
o, d = cam.generate_rays(scene.camera, 1920, 1080, px, py, jit_u[0], jit_u[1])
act = jnp.ones((R,), bool)


def tier0(o, d, act, selmode):
    return tp.intersect_bvh_pallas(
        o, d, tris, bvh, act, kp=4, ksel=8, tables=PT, selmode=selmode,
    )


def report(label, o, d, act):
    for mode in ("extract", "parent"):
        h = tier0(o, d, act, mode)
        sus = int(jnp.sum((h["dropped_min"] < h["t"]) & act))
        n = int(jnp.sum(act))
        print(f"{label:>8} {mode:>8}: suspects {sus}/{n} = {100*sus/n:.3f}%")
    return h


h = report("camera", o, d, act)

# incoherent continuation rays from the camera hits
hit = jnp.isfinite(h["t"])
point = o + d * jnp.where(hit, h["t"], 1.0)
u = jax.random.uniform(jax.random.PRNGKey(7), (3, R), minval=-1.0, maxval=1.0)
nd = Vec3(u[0], u[1], u[2]).normalized()
report("bounce1", point + nd * 1e-4, nd, hit)

# verified-path equality between modes (exactness is mode-invariant)
va = traverse.intersect_bvh_pallas_verified(
    o, d, tris, bvh, act, tables=PT)
tp_sel = tp.SELMODE
tp.SELMODE = "parent"
try:
    vb = traverse.intersect_bvh_pallas_verified(
        o, d, tris, bvh, act, tables=PT)
finally:
    tp.SELMODE = tp_sel
for k in ("t", "u", "v", "tri"):
    same = bool(jnp.all(va[k] == vb[k]))
    print(f"verified[{k}] bit-equal across modes: {same}")
    assert same, k
print("OK")
