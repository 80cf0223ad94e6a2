"""On-chip A/B of the exact split-table fetch formats (docs/PERF.md
round-3 third wave): bf16x3 vs int8x4, against the recorded
Precision.HIGHEST numbers (tier-0 20.1 ms / 256k at kp=4).

Two parts:
1. EXACTNESS ON HARDWARE: fetch every column of the helmet leaf + attr +
   node tables through the real Mosaic-lowered `_fetch_split` kernel and
   bit-compare with the stored f32 originals. (Interpret mode can't see
   hardware matmul rounding — the round-3 precision bug was CPU-invisible.)
2. SPEED: tier-0 kernel (kp=4) + full verified path per mode, camera and
   bounce-1 batches, serialized-in-jit per docs/PERF.md methodology; plus
   a tile sweep of the wide (ksel=16/kp=16) escalation pass, whose
   tile=256 cap was sized for the 6-pass HIGHEST scratch.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/split_ab.py
"""

import functools
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracing_c_tpu.io.loader import load_scene
from raytracing_c_tpu.ops import traverse
from raytracing_c_tpu.ops import traverse_pallas as tp
from raytracing_c_tpu.render import camera as cam
from raytracing_c_tpu.render import integrator
from raytracing_c_tpu.utils.vec3 import Vec3

ITERS = 8
R = 256 * 1024

print("backend:", jax.default_backend(), flush=True)
scene = load_scene(
    "/root/reference/models/helmet.glb", background_path=None,
    warn=lambda *a: None,
)
tris, bvh = scene.triangles, scene.bvh


def build_mode(mode):
    old = tp.SPLIT_MODE
    tp.SPLIT_MODE = mode
    try:
        return tp.build_scene_tables(
            np.asarray(bvh.nodes), np.asarray(tris.leaf_rows), bvh.depth,
            np.asarray(tris.attr_rows),
        )
    finally:
        tp.SPLIT_MODE = old


def _echo_kernel(split_ref, ids_ref, out_ref):
    ids = ids_ref[0:1, :].astype(jnp.int32)
    out_ref[:] = tp._fetch_split(split_ref, ids, False)


def fetch_all(split, n_rows, ids):
    """Fetch columns `ids` of a split table through the REAL kernel."""
    r = len(ids)
    r_pad = ((r + 127) // 128) * 128
    idsf = np.zeros((8, r_pad), np.float32)
    idsf[0, :r] = ids
    out = pl.pallas_call(
        _echo_kernel,
        in_specs=[
            pl.BlockSpec(split.shape, lambda: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, r_pad), lambda: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_rows, r_pad), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rows, r_pad), jnp.float32),
        interpret=False,
    )(split, jnp.asarray(idsf))
    return np.asarray(out)[:, :r]


def check_mode(mode, pt):
    """Bit-compare an on-chip _fetch_split of every column against the
    exact host-side reconstruction of the same split planes (split ==
    original f32 is covered by test_split_table_reconstruction_exact)."""
    ok = True
    for name, split in (
        ("leaf", pt.leaf),
        ("attr", pt.attr),
        *[(f"level{i+1}", pt.levels[i])
          for i in range(1, len(pt.levels))],
    ):
        k = 4 if split.dtype == jnp.int8 else 3
        n_rows = split.shape[0] // k
        g = split.shape[1]
        ids = np.arange(g, dtype=np.int32)
        got = fetch_all(split, n_rows, ids)
        # reconstruct expected from the split itself (host, exact)
        if split.dtype == jnp.int8:
            p = np.asarray(split).astype(np.int32)
            want = (
                (p[:n_rows] & 0xFF) | ((p[n_rows:2*n_rows] & 0xFF) << 8)
                | ((p[2*n_rows:3*n_rows] & 0xFF) << 16)
                | (p[3*n_rows:] << 24)
            ).view(np.float32)
        else:
            p = np.asarray(split).astype(np.float32)
            want = p[:n_rows] + p[n_rows:2*n_rows] + p[2*n_rows:]
        eq = np.array_equal(got.view(np.int32), want.view(np.int32))
        print(f"[{mode}] {name}: on-chip fetch bit-exact = {eq}", flush=True)
        ok &= eq
    return ok


def serial_loop(fn):
    def run(o, d, act):
        def body(i, carry):
            t, ox = carry
            # min() keeps the carry finite: miss lanes return t = INF and
            # INF * 0.0 = NaN would poison iterations 2..N
            oo = Vec3(ox + jnp.minimum(t, 1.0) * 0.0, o.y, o.z)
            return fn(oo, d, act), ox

        t, _ = jax.lax.fori_loop(
            0, ITERS, body, (jnp.zeros((R,), jnp.float32), o.x)
        )
        return t

    return run


def timed(name, fn, o, d, act):
    f = jax.jit(serial_loop(fn))
    np.asarray(f(o, d, act)[:8])
    best = np.inf
    for _ in range(2):
        t0 = time.perf_counter()
        np.asarray(f(o, d, act)[:8])
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{name}: {best*1e3:8.2f} ms  ({R / best / 1e6:7.1f} Mrays/s)",
          flush=True)
    return best


ids = np.arange(R // 4, dtype=np.int32)
px = jnp.repeat(jnp.asarray(832 + ids % 128), 4)
py = jnp.repeat(jnp.asarray(476 + (ids // 128) % 128), 4)
key = jax.random.PRNGKey(0)
u2 = jax.random.uniform(key, (2, R), jnp.float32)
o_cam, d_cam = cam.generate_rays(scene.camera, 1920, 1080, px, py,
                                 u2[0], u2[1])
act_cam = jnp.ones((R,), bool)


@jax.jit
def one_bounce(o, d):
    st = {
        "origin": o, "direction": d,
        "throughput": Vec3.full((R,), 1.0), "radiance": Vec3.zeros((R,)),
        "active": jnp.ones((R,), bool), "rays": jnp.float32(0.0),
    }
    u6 = jax.random.uniform(jax.random.fold_in(key, 1), (6, R), jnp.float32)
    st = integrator.bounce_step(scene, st, u6[:4], method="pallas")
    return st["origin"], st["direction"], st["active"]


o_b1, d_b1, act_b1 = one_bounce(o_cam, d_cam)
print("bounce-1 live:", int(jnp.sum(act_b1)), flush=True)

for mode in ("bf16x3", "int8x4"):
    try:
        pt = build_mode(mode)
        check_mode(mode, pt)
    except Exception as e:  # int8 may not lower on this chip
        print(f"[{mode}] FAILED: {type(e).__name__}: {e}", flush=True)
        continue
    for label, (o, d, act) in (
        ("camera", (o_cam, d_cam, act_cam)),
        ("bounce1", (o_b1, d_b1, act_b1)),
    ):
        timed(
            f"[{mode}] {label} tier0 kp=4",
            lambda o, d, a, pt=pt: tp.intersect_bvh_pallas(
                o, d, tris, bvh, a, kp=4, tables=pt
            )["t"],
            o, d, act,
        )
        timed(
            f"[{mode}] {label} verified kp=4",
            lambda o, d, a, pt=pt: traverse.intersect_bvh_pallas_verified(
                o, d, tris, bvh, a, tables=pt
            )["t"],
            o, d, act,
        )

        def _fused(o, d, a, pt=pt):
            h = traverse.intersect_bvh_pallas_verified(
                o, d, tris, bvh, a, tables=pt, fuse_attr=True
            )
            # keep the attr planes live (sum defeats DCE) — models the
            # production consumer, which reads them every bounce
            return h["t"] + h["attrs"][0]

        timed(f"[{mode}] {label} verified+fused-attr", _fused, o, d, act)
        timed(
            f"[{mode}] {label} attr-kernel standalone",
            lambda o, d, a, pt=pt: (
                lambda h: tp.fetch_attrs(pt, h["tri"], h["u"], h["v"])[
                    "uv_u"
                ] + h["t"]
            )(
                traverse.intersect_bvh_pallas_verified(
                    o, d, tris, bvh, a, tables=pt
                )
            ),
            o, d, act,
        )
    # wide-pass tile sweep (the escalation's ksel=16/kp=16 program)
    for tile in (256, 512, 1024):
        try:
            timed(
                f"[{mode}] camera WIDE ksel16/kp16 tile={tile}",
                lambda o, d, a, pt=pt, tile=tile: tp.intersect_bvh_pallas(
                    o, d, tris, bvh, a, kp=16, ksel=16, tables=pt,
                    tile=tile,
                )["t"],
                o_cam, d_cam, act_cam,
            )
        except Exception as e:
            print(f"[{mode}] WIDE tile={tile} FAILED: {type(e).__name__}",
                  flush=True)
    # tier-0 ray-tile sweep (R_TILE default is 1024; bigger tiles mean
    # fewer grid steps if the per-tile working set still fits VMEM)
    for tile in (1024, 2048):
        try:
            timed(
                f"[{mode}] camera tier0 kp=4 tile={tile}",
                lambda o, d, a, pt=pt, tile=tile: tp.intersect_bvh_pallas(
                    o, d, tris, bvh, a, kp=4, tables=pt, tile=tile,
                )["t"],
                o_cam, d_cam, act_cam,
            )
        except Exception as e:
            print(f"[{mode}] tier0 tile={tile} FAILED: {type(e).__name__}",
                  flush=True)
