"""Compacting wavefront pool renderer — RECORDED NEGATIVE (demoted r4).

Kept under tools/ as a measurement artifact, not a product engine: the
host-driven per-bounce sync loses to the fused on-device bucket compaction
(integrator.trace_bucketed) on BOTH counts that were tried — the plain
loop measured 3x slower (140 s vs 46 s at 1080p) and the pipelined
two-task variant still 1.7x slower (77 s) — see docs/PERF.md. The
on-device ladder gets the same occupancy win with zero host round-trips,
so this architecture has no remaining niche on tunnel-attached OR local
chips. Import render_batch_pool from a probe script to re-measure.

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


class PoolTask:
    """One batch's pool render as an explicitly-steppable state machine, so
    a host scheduler can interleave several batches: while THIS task blocks
    on its live-count readback, the OTHER tasks' bounce programs keep the
    device busy — hiding the ~150 ms tunnel sync that made the sequential
    pool lose (docs/PERF.md)."""

    def __init__(self, scene, px, py, key, *, width, height, spp,
                 max_bounces, method="topk", texture_mode="bilinear"):
        self.scene = scene
        self.key = key
        self.max_bounces = max_bounces
        self.method = method
        self.texture_mode = texture_mode

        p = px.shape[0]
        self.p = p
        self.r = p * spp
        self.spp = spp
        self.rows = pool_raygen(
            scene, px, py, key, width=width, height=height, spp=spp
        )
        self.acc = [jnp.zeros((self.r,), jnp.float32) for _ in range(3)]
        self.traced = 0
        self.alive = self.r
        self.alive_pending = None
        self.bounce = 0
        self.done = False

    def sync(self):
        """Resolve the pending live count (blocking); shrink or finish."""
        if self.alive_pending is None:
            return
        self.alive = int(self.alive_pending)
        self.alive_pending = None
        if self.alive == 0 or self.bounce >= self.max_bounces:
            self.done = True
            return
        w2 = max(_next_pow2(self.alive), MIN_WIDTH)
        if w2 < self.rows.shape[0]:
            self.rows = pool_shrink(self.rows, new_width=w2)

    def step(self):
        """Dispatch ONE bounce (non-blocking)."""
        assert not self.done and self.alive_pending is None
        self.traced += self.alive
        self.rows, self.acc[0], self.acc[1], self.acc[2], self.alive_pending = (
            pool_bounce(
                self.scene, self.rows, *self.acc,
                jax.random.fold_in(self.key, self.bounce + 1),
                method=self.method, texture_mode=self.texture_mode,
            )
        )
        self.bounce += 1

    def finalize(self):
        if self.alive > 0:
            self.acc = list(pool_flush(self.rows, *self.acc))
        rgb = jnp.stack(
            [a.reshape(self.p, self.spp).mean(axis=1) for a in self.acc],
            axis=-1,
        )
        return rgb, jnp.float32(self.traced)


def run_pool_tasks(make_task, n_tasks: int, on_result, depth: int = 2):
    """Interleave up to `depth` PoolTasks: each blocking sync overlaps the
    other tasks' dispatched compute."""
    active: list = []
    next_task = 0
    while active or next_task < n_tasks:
        while len(active) < depth and next_task < n_tasks:
            active.append((next_task, make_task(next_task)))
            next_task += 1
        for slot in list(active):
            b, task = slot
            if task.alive_pending is None and not task.done:
                task.step()
        for slot in list(active):
            b, task = slot
            task.sync()
            if task.done:
                on_result(b, *task.finalize())
                active.remove(slot)


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
