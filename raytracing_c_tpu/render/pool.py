"""Compacting wavefront pool renderer.

The fused renderer (renderer.render_batch) runs every bounce at full batch
width: after a few bounces most rays are dead but still occupy dense lanes.
This module keeps the live rays in a POOL that shrinks between bounces:

- ray state is packed into (W, 16) rows; compaction is then a single ROW
  gather by the sorted indices of the surviving rays (the TPU fast path —
  and sorted indices stream near-sequentially), never a scatter
- the host drives one jitted `pool_bounce` per bounce, reads back the live
  count (one small sync), and halves the pool width (power-of-two buckets,
  so each width compiles once) whenever occupancy allows
- dead rays deposit their radiance into a per-sample accumulator inside the
  bounce program (masked scatter-add by sample id)

Per-bounce semantics are bit-shared with the fused path: both call
integrator.bounce_step. This is the wavefront architecture SURVEY §7 calls
"compaction as a later optimization" over the masked baseline.

MEASURED CAVEAT (docs/PERF.md): the host-driven loop reads back the live
count every bounce. Over the axon tunnel that sync costs ~150 ms, so at
1080p the pool measured 3x SLOWER than the fused engine (140 s vs 46 s)
despite doing less device work. On a locally-attached TPU (microsecond
sync) the trade flips; rounds 2+ should pipeline batches to hide the sync.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from raytracing_c_tpu.render import camera as camera_mod
from raytracing_c_tpu.render import integrator
from raytracing_c_tpu.utils.vec3 import Vec3

# state row columns
_C_O = 0  # origin xyz
_C_D = 3  # direction xyz
_C_T = 6  # throughput rgb
_C_R = 9  # radiance rgb
_C_ID = 12  # sample id as f32 (-1 = dead/padding)
_COLS = 16

MIN_WIDTH = 8192


def _pack(o, d, thr, rad, sid):
    cols = [
        o.x, o.y, o.z, d.x, d.y, d.z,
        thr.x, thr.y, thr.z, rad.x, rad.y, rad.z,
        sid.astype(jnp.float32),
        jnp.zeros_like(o.x), jnp.zeros_like(o.x), jnp.zeros_like(o.x),
    ]
    return jnp.stack(cols, axis=0).T  # (W, 16)


def _unpack(rows):
    t = rows.T  # (16, W)
    return (
        Vec3(t[_C_O], t[_C_O + 1], t[_C_O + 2]),
        Vec3(t[_C_D], t[_C_D + 1], t[_C_D + 2]),
        Vec3(t[_C_T], t[_C_T + 1], t[_C_T + 2]),
        Vec3(t[_C_R], t[_C_R + 1], t[_C_R + 2]),
        t[_C_ID].astype(jnp.int32),
    )


@functools.partial(
    jax.jit, static_argnames=("width", "height", "spp")
)
def pool_raygen(scene, px, py, key, *, width, height, spp):
    """Camera rays for P pixels x spp samples -> (P*spp, 16) state rows."""
    p = px.shape[0]
    r = p * spp
    # same key split as renderer.render_batch so primary rays (and thus any
    # deterministic render) are identical between the two engines
    k_jit, _ = jax.random.split(key)
    jitter = jax.random.uniform(k_jit, (2, r), jnp.float32)
    rpx = jnp.repeat(px, spp)
    rpy = jnp.repeat(py, spp)
    o, d = camera_mod.generate_rays(
        scene.camera, width, height, rpx, rpy, jitter[0], jitter[1]
    )
    sid = jnp.arange(r, dtype=jnp.int32)
    return _pack(o, d, Vec3.full((r,), 1.0), Vec3.zeros((r,)), sid)


@functools.partial(jax.jit, static_argnames=("method", "texture_mode"))
def pool_bounce(scene, rows, acc_r, acc_g, acc_b, key,
                method: str = "topk", texture_mode: str = "bilinear"):
    """One bounce at the pool's current width.

    Returns (rows', acc', alive_count). Rays that die this bounce deposit
    their radiance into the accumulator planes and get sample id -1.
    """
    o, d, thr, rad, sid = _unpack(rows)
    active = sid >= 0
    w = rows.shape[0]

    st = {
        "origin": o,
        "direction": d,
        "throughput": thr,
        "radiance": rad,
        "active": active,
        "rays": jnp.float32(0.0),
    }
    rand4 = jax.random.uniform(key, (4, w), jnp.float32)
    st = integrator.bounce_step(scene, st, rand4, method, texture_mode)

    died = active & ~st["active"]
    ids = jnp.where(died, sid, 0)
    zero = jnp.float32(0.0)
    acc_r = acc_r.at[ids].add(jnp.where(died, st["radiance"].x, zero))
    acc_g = acc_g.at[ids].add(jnp.where(died, st["radiance"].y, zero))
    acc_b = acc_b.at[ids].add(jnp.where(died, st["radiance"].z, zero))

    sid_out = jnp.where(st["active"], sid, -1)
    rows_out = _pack(
        st["origin"], st["direction"], st["throughput"], st["radiance"],
        sid_out,
    )
    return rows_out, acc_r, acc_g, acc_b, jnp.sum(st["active"])


@functools.partial(jax.jit, static_argnames=("new_width",))
def pool_shrink(rows, *, new_width: int):
    """Compact live rays to the front and halve the pool width. The caller
    guarantees alive <= new_width."""
    sid = rows[:, _C_ID]
    active = sid >= 0.0
    alive = jnp.sum(active)
    idx = jnp.nonzero(active, size=new_width, fill_value=0)[0]
    take = jnp.arange(new_width) < alive
    gathered = rows[idx]  # row gather, sorted indices
    dead = jnp.zeros((_COLS,), rows.dtype).at[_C_ID].set(-1.0)
    return jnp.where(take[:, None], gathered, dead[None, :])


@jax.jit
def pool_flush(rows, acc_r, acc_g, acc_b):
    """Deposit the radiance of rays that exhausted the bounce budget
    (cast_ray's `return emission`, raytracer.c:557)."""
    _, _, _, rad, sid = _unpack(rows)
    active = sid >= 0
    ids = jnp.where(active, sid, 0)
    zero = jnp.float32(0.0)
    acc_r = acc_r.at[ids].add(jnp.where(active, rad.x, zero))
    acc_g = acc_g.at[ids].add(jnp.where(active, rad.y, zero))
    acc_b = acc_b.at[ids].add(jnp.where(active, rad.z, zero))
    return acc_r, acc_g, acc_b


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def render_batch_pool(
    scene, px, py, key, *, width: int, height: int, spp: int,
    max_bounces: int, method: str = "topk", texture_mode: str = "bilinear",
):
    """Pool-based replacement for renderer.render_batch (same contract:
    returns (rgb (P, 3), rays_traced)). Host-driven bounce loop with
    power-of-two pool shrinking."""
    p = px.shape[0]
    r = p * spp

    rows = pool_raygen(scene, px, py, key, width=width, height=height, spp=spp)
    acc_r = jnp.zeros((r,), jnp.float32)
    acc_g = jnp.zeros((r,), jnp.float32)
    acc_b = jnp.zeros((r,), jnp.float32)

    traced = 0
    alive = r
    w = rows.shape[0]
    for b in range(max_bounces):
        traced += alive
        rows, acc_r, acc_g, acc_b, alive_dev = pool_bounce(
            scene, rows, acc_r, acc_g, acc_b, jax.random.fold_in(key, b + 1),
            method=method, texture_mode=texture_mode,
        )
        alive = int(alive_dev)
        if alive == 0:
            break
        if b < max_bounces - 1:
            w2 = max(_next_pow2(alive), MIN_WIDTH)
            if w2 < w:
                rows = pool_shrink(rows, new_width=w2)
                w = w2

    if alive > 0:
        acc_r, acc_g, acc_b = pool_flush(rows, acc_r, acc_g, acc_b)

    rgb = jnp.stack(
        [
            acc_r.reshape(p, spp).mean(axis=1),
            acc_g.reshape(p, spp).mean(axis=1),
            acc_b.reshape(p, spp).mean(axis=1),
        ],
        axis=-1,
    )
    return rgb, jnp.float32(traced)
