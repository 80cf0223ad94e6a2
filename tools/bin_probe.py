"""Subtree-binning census: would binning rays by nearest level-1/level-2
BVH subtree pay off?

The one-hot-matmul fetch cost of the fused traversal kernel scales with
TABLE WIDTH (each fetch pays G x rows MACs), so restricting a ray tile to
ONE subtree's tables divides the dominant MXU term by the subtree count —
IF few rays then need cross-subtree repair. A binned ray traverses only
the subtree whose root box it enters NEAREST; exactness comes from the
usual certificate (other entered subtrees' entry distances feed
dropped_min, suspects escalate to the monolithic wide pass). This probe
replays a real helmet bounce sequence and reports, per bounce and per
binning level L:

  live      live lanes entering the bounce
  sky       rays entering NO level-L box (skip the kernel entirely)
  repair    rays whose exact hit does NOT certify under binning:
            min over non-binned entered subtrees' entry < exact t
            (includes miss-in-bin rays that entered another subtree)
  mean_ent  mean number of level-L subtrees entered closer than the exact
            hit (the irreducible visit count a perfect scheduler pays)

plus the per-subtree leaf-group histogram (table width per bin).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bin_probe.py
"""

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from raytracing_c_tpu import BVH_WIDTH as W
from raytracing_c_tpu import EPSILON
from raytracing_c_tpu.io.loader import load_scene
from raytracing_c_tpu.ops import intersect, traverse
from raytracing_c_tpu.render import camera as cam
from raytracing_c_tpu.render import integrator
from raytracing_c_tpu.utils.vec3 import Vec3

R = 64 * 1024
BOUNCES = 6
INF = float("inf")

scene = load_scene(
    "/root/reference/models/helmet.glb", background_path=None,
    warn=lambda *a: None,
)
nodes = np.asarray(scene.bvh.nodes)
depth = scene.bvh.depth

# per-subtree leaf-group counts (nonempty level-(depth-1) nodes per
# level-1 / level-2 ancestor)
off = lambda l: (W**l - 1) // (W - 1)  # noqa: E731
leafs = nodes[off(depth - 1): off(depth - 1) + W ** (depth - 1), : 6 * W]
ne = np.abs(leafs).max(axis=1) > 0
for lvl in (1, 2):
    per = ne.reshape(W**lvl, -1).sum(axis=1)
    print(f"L{lvl} leaf groups/subtree: {list(per)}")

# geometry-heavy center tile (same region as tools/profile_batch.py)
ids = np.arange(R // 4, dtype=np.int32)
px = jnp.repeat(jnp.asarray(832 + ids % 128), 4)
py = jnp.repeat(jnp.asarray(476 + (ids // 128) % 128), 4)
key = jax.random.PRNGKey(0)
jit_u = jax.random.uniform(key, (2, R), jnp.float32)
o, d = cam.generate_rays(scene.camera, 1920, 1080, px, py, jit_u[0], jit_u[1])


def _boxes(rows):
    """(n, 48+) node rows -> (bmin, bmax) Vec3 of (n*8, 1) planes."""
    t = rows[:, : 6 * W].reshape(-1, 6, W)  # (n, 6, 8)
    t = t.transpose(0, 2, 1).reshape(-1, 6)  # (n*8, 6)
    mk = lambda c: jnp.asarray(t[:, c:c + 1])  # noqa: E731
    return (Vec3(mk(0), mk(1), mk(2)), Vec3(mk(3), mk(4), mk(5)))


BOX_L1 = _boxes(nodes[0:1])  # 8 level-1 boxes
BOX_L2 = _boxes(nodes[off(1): off(1) + W])  # 64 level-2 boxes


@jax.jit
def probe(o, d, act):
    inv = Vec3(1.0 / d.x, 1.0 / d.y, 1.0 / d.z)
    exact = traverse.intersect_scene(scene, o, d, act, method="pallas")
    t_ex = exact["t"]
    out = {"live": jnp.sum(act)}
    for name, (bmin, bmax) in (("L1", BOX_L1), ("L2", BOX_L2)):
        e = intersect.aabb_slab(
            o, inv, bmin, bmax, EPSILON, jnp.full(o.shape, INF)
        )  # (n_sub, R)
        e = jnp.where(act[None, :], e, INF)
        emin = jnp.min(e, axis=0)
        sky = act & ~jnp.isfinite(emin)
        binned = jnp.argmin(e, axis=0)  # nearest-entry subtree
        e_others = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, e.shape, 0) == binned[None, :],
            INF, e,
        )
        repair = act & ~sky & (jnp.min(e_others, axis=0) < t_ex)
        n_ent = jnp.sum((e < t_ex[None, :]).astype(jnp.int32), axis=0)
        out[name] = {
            "sky": jnp.sum(sky),
            "repair": jnp.sum(repair),
            "ent": jnp.sum(jnp.where(act, n_ent, 0)),
        }
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
hdr = f"{'bounce':>6} {'live':>7}"
for n in ("L1", "L2"):
    hdr += f" {n + '_sky':>7} {n + '_rep':>7} {n + '_rep%':>7} {n + '_ent':>7}"
print(hdr)
for b in range(BOUNCES):
    m = jax.device_get(probe(st["origin"], st["direction"], st["active"]))
    live = max(int(m["live"]), 1)
    row = f"{b:>6} {int(m['live']):>7}"
    for n in ("L1", "L2"):
        rep = int(m[n]["repair"])
        row += (f" {int(m[n]['sky']):>7} {rep:>7} {100.0 * rep / live:>6.2f}%"
                f" {m[n]['ent'] / live:>7.2f}")
    print(row, flush=True)
    st = advance(st, b)
