"""Where do the verification suspects come from, bounce by bounce?

The profile (tools/profile_batch.py, round 3) shows the repair tiers cost
~25-31 ms of a 74 ms batch — more than the tier-0 kernel itself. A ray is
suspect iff some unselected candidate's AABB entry distance beats its found
hit (dropped_min < t). This probe replays a real helmet bounce sequence and
reports, per bounce:

  live        live-lane count entering the bounce
  hitN/missN  suspects among rays that found a hit / found nothing
  kp=K        tier-0 suspect count at leaf-group fetch width K
  wide8/16    suspects SURVIVING a ksel=16 pass with kp=8 / kp=16
              (what tier-2 would see)

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/suspect_probe.py
"""

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from raytracing_c_tpu.io.loader import load_scene
from raytracing_c_tpu.ops import traverse_pallas as tp
from raytracing_c_tpu.render import camera as cam
from raytracing_c_tpu.render import integrator
from raytracing_c_tpu.utils.vec3 import Vec3

R = 64 * 1024
BOUNCES = 8

scene = load_scene(
    "/root/reference/models/helmet.glb", background_path=None,
    warn=lambda *a: None,
)
tris, bvh, PT = scene.triangles, scene.bvh, scene.ptables

# geometry-heavy center tile (same region as tools/profile_batch.py)
ids = np.arange(R // 4, dtype=np.int32)
px = jnp.repeat(jnp.asarray(832 + ids % 128), 4)
py = jnp.repeat(jnp.asarray(476 + (ids // 128) % 128), 4)
key = jax.random.PRNGKey(0)
jit_u = jax.random.uniform(key, (2, R), jnp.float32)
o, d = cam.generate_rays(scene.camera, 1920, 1080, px, py, jit_u[0], jit_u[1])


@jax.jit
def probe_bounce(o, d, act):
    out = {}
    for kp in (1, 2, 3, 4, 8):
        h = tp.intersect_bvh_pallas(o, d, tris, bvh, act, kp=kp, tables=PT)
        sus = (h["dropped_min"] < h["t"]) & act
        out[f"kp={kp}"] = jnp.sum(sus)
        if kp == 2:
            is_hit = jnp.isfinite(h["t"]) & act
            out["hit_sus"] = jnp.sum(sus & is_hit)
            out["miss_sus"] = jnp.sum(sus & ~is_hit)
    for wkp in (8, 16):
        h = tp.intersect_bvh_pallas(
            o, d, tris, bvh, act, kp=wkp, ksel=16, tables=PT
        )
        sus = (h["dropped_min"] < h["t"]) & act
        out[f"wide{wkp}"] = jnp.sum(sus)
    out["live"] = jnp.sum(act)
    return out


@jax.jit
def advance(st, i):
    u6 = jax.random.uniform(jax.random.fold_in(key, i), (6, R), jnp.float32)
    return integrator.bounce_step(scene, st, u6[:4], method="pallas")


st = {
    "origin": o, "direction": d,
    "throughput": Vec3.full((R,), 1.0), "radiance": Vec3.zeros((R,)),
    "active": jnp.ones((R,), bool), "rays": jnp.float32(0.0),
}
print(f"{'bounce':>6} {'live':>7} {'hit_sus':>8} {'miss_sus':>8} "
      + " ".join(f"{k:>7}" for k in ("kp=1", "kp=2", "kp=3", "kp=4", "kp=8"))
      + f" {'wide8':>7} {'wide16':>7}")
for b in range(BOUNCES):
    m = jax.device_get(probe_bounce(st["origin"], st["direction"],
                                    st["active"]))
    print(f"{b:>6} {int(m['live']):>7} {int(m['hit_sus']):>8} "
          f"{int(m['miss_sus']):>8} "
          + " ".join(f"{int(m[f'kp={k}']):>7}" for k in (1, 2, 3, 4, 8))
          + f" {int(m['wide8']):>7} {int(m['wide16']):>7}")
    st = advance(st, b)
