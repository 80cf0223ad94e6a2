"""Feasibility probe for SPP-shared traversal fetches (round 4).

Bounce 0 is ~72% of all ray-bounces (occupancy census) and its lanes are
pixel-grouped: 16 consecutive lanes = 16 spp of ONE pixel. The 16 rays of
a pixel traverse nearly the same tree path, so the kernel could rank and
fetch ONCE PER PIXEL (R/16 lanes) and spread fetched blocks back to the
16 ray lanes — cutting the dominant one-hot MXU fetch terms up to 16x;
rays whose private best group falls outside the pixel's shared set become
certificate suspects and repair exactly.

Mosaic does NOT support lane-axis reshapes ((C,R)->(C,R/16,16) fails
"unsupported shape cast"), so everything must build from the primitives
it does have. This probe establishes, ON CHIP and value-checked against
numpy references, which of those work and what they cost per op:

  vote16 : per-16-lane-group min of (8, R) f32 at full width — roll
           butterfly (window-min down-sweep, leader select, spread-back)
  stride : x[:, ::16] lane compression (rows, R)->(rows, R/16)
  rep16  : pltpu.repeat(x, 16, axis=1) on (rows, R/16) — checked against
           ELEMENT-repeat semantics (x[l//16]); if it tile-repeats
           instead, the check reports it
  nfetch : int8 one-hot fetch at R/16 lanes (the shared fetch itself)
  fetchR : the same fetch at full width (today's cost, the yardstick)

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/sppshare_probe.py
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

R = 256 * 1024
TILE = 2048  # 128 pixels/tile: narrow ops stay at the 128-lane minimum
G = 256
SPP = 16
P = TILE // SPP
ITERS = 8
REPS = 4
BIG = float(np.float32(3.0e38))


def _iota(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _group_min(x):
    """Per-16-lane-group min at full width via roll butterfly: down-sweep
    window min, keep group leaders (lane%16==0), spread leaders back.
    pltpu.roll requires non-negative shifts: roll by N-s == roll by -s."""
    n = x.shape[-1]
    y = x
    for s in (1, 2, 4, 8):
        y = jnp.minimum(y, pltpu.roll(y, n - s, 1))  # y[l] <- y[l+s]
    lane = _iota(x.shape, 1)
    z = jnp.where(lane % SPP == 0, y, BIG)
    for s in (1, 2, 4, 8):
        z = jnp.minimum(z, pltpu.roll(z, s, 1))  # z[l] <- z[l-s]
    return z


def _kernel(mode, rays_ref, table_ref, out_ref):
    r = rays_ref.shape[1]
    seed = rays_ref[0:8, :]
    acc = jnp.zeros((8, r), jnp.float32)

    for rep in range(REPS):
        x = seed + float(rep)
        if mode == "vote16":
            acc = acc + _group_min(x)
        elif mode == "stride":
            nar = x[:, ::SPP]  # (8, P) strided lane read — supported?
            acc = acc + jnp.pad(nar, ((0, 0), (0, r - r // SPP)))
        elif mode == "rep16":
            nar = x[:, :P]  # contiguous prefix: isolates repeat semantics
            acc = acc + pltpu.repeat(nar, SPP, 1)  # element or tile?
        elif mode in ("nfetch", "fetchR"):
            w = r // SPP if mode == "nfetch" else r
            ids = (x[0:1, :w] * 1e3).astype(jnp.int32) & (G - 1)
            oh = (_iota((G, w), 0) == ids).astype(jnp.int8)
            out = jax.lax.dot_general(
                table_ref[:], oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # (224, w)
            # consume EVERY output row (an out[:8] slice lets Mosaic
            # shrink the dot to M=8 — the round-2 mxu_probe trap, hit
            # again by this probe's first version AND overlap_probe)
            fold = out[0:8]
            for c in range(1, 28):
                fold = fold ^ out[8 * c : 8 * c + 8]
            f = fold.astype(jnp.float32)
            if mode == "nfetch":
                f = jnp.pad(f, ((0, 0), (0, r - w)))
            acc = acc + f
        else:
            raise ValueError(mode)

    out_ref[:] = acc * 1e-9


def run(mode, table, rays):
    call = pl.pallas_call(
        functools.partial(_kernel, mode),
        grid=(R // TILE,),
        in_specs=[
            pl.BlockSpec((8, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(table.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, R), jnp.float32),
    )

    @jax.jit
    def once(rays, table):
        return call(rays, table)

    @jax.jit
    def timed(rays, table):
        return jax.lax.fori_loop(0, ITERS, lambda _, c: call(c, table), rays)

    got = np.asarray(once(rays, table))  # value check + compile
    np.asarray(timed(rays, table))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(timed(rays, table))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{mode:7s}: {best / REPS * 1e3:7.3f} ms/256k/op", flush=True)
    return got, best / REPS


def _ref(mode, rays_np, table_np):
    """numpy reference of one `once` call for value checking."""
    acc = np.zeros((8, R), np.float32)
    for rep in range(REPS):
        x = rays_np[:8] + np.float32(rep)
        xt = x.reshape(8, R // TILE, TILE)
        if mode == "vote16":
            g = xt.reshape(8, -1, SPP).min(axis=2, keepdims=True)
            acc += np.broadcast_to(g, (8, R // SPP, SPP)).reshape(8, R)
        elif mode == "stride":
            nar = xt[:, :, ::SPP]  # (8, T, P)
            pad = np.zeros((8, R // TILE, TILE - P), np.float32)
            acc += np.concatenate([nar, pad], -1).reshape(8, R)
        elif mode == "rep16":
            nar = xt[:, :, :P]
            rep16 = np.repeat(nar, SPP, axis=2)  # ELEMENT-repeat reference
            acc += rep16.reshape(8, R)
        elif mode in ("nfetch", "fetchR"):
            w = TILE // SPP if mode == "nfetch" else TILE
            ids = (xt[0, :, :w] * 1e3).astype(np.int64) & (G - 1)
            cols = table_np.astype(np.int64)[:, ids]  # (224, T, w)
            fold = cols[0:8].astype(np.int32)
            for c in range(1, 28):
                fold = fold ^ cols[8 * c : 8 * c + 8].astype(np.int32)
            f = fold.astype(np.float32)
            if mode == "nfetch":
                f = np.concatenate(
                    [f, np.zeros((8, R // TILE, TILE - w), np.float32)], -1
                )
            acc += f.reshape(8, R)
    return acc * np.float32(1e-9)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(1)
    table_np = rng.integers(-128, 128, (224, G)).astype(np.int8)
    table = jnp.asarray(table_np)
    rays_np = rng.random((8, R), np.float32)
    rays = jnp.asarray(rays_np)
    times = {}
    for mode in ("vote16", "stride", "rep16", "nfetch", "fetchR"):
        try:
            got, t = run(mode, table, rays)
            times[mode] = t
            want = _ref(mode, rays_np, table_np)
            ok = np.allclose(got, want, rtol=1e-5, atol=1e-9)
            print(f"  value check: {'OK' if ok else 'MISMATCH'}"
                  + ("" if ok else f" (max diff {np.abs(got - want).max()})"),
                  flush=True)
        except Exception as e:
            print(f"{mode}: FAILED ({type(e).__name__}: {str(e)[:200]})",
                  flush=True)
    if "nfetch" in times and "fetchR" in times:
        print(f"shared-fetch speedup: {times['fetchR'] / times['nfetch']:.1f}x"
              f" (+ vote {times.get('vote16', 0) * 1e3:.3f} ms"
              f" + spread {times.get('rep16', 0) * 1e3:.3f} ms)", flush=True)


if __name__ == "__main__":
    main()
