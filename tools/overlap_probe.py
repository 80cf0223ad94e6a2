"""MXU/VPU overlap census for the traversal kernel (Mosaic scheduling).

Tier-0 traversal measures 9.4 ms/256k vs a cost model of ~4-6 ms MXU
(one-hot int8 fetches) + ~3-5 ms VPU (slab/MT/extract) — serialized by the
fetch -> slab -> extract -> fetch dependency chain. TPU cores are VLIW:
MXU pushes and VPU ops CAN share issue slots if the scheduler has
independent work. This probe measures whether Mosaic exploits that:

  mxu   : K reps of an int8 one-hot row fetch (224 x G table, R lanes)
  vpu   : K reps of a dependent slab-like VPU chain on (56, R) f32
  both  : the mxu and vpu reps interleaved, mutually INDEPENDENT
          (the overlap upper bound for a two-half-tile kernel restructure)
  chain : vpu rep i consumes mxu rep i's output (today's dependency shape)

Verdict rule: both ~= max(mxu, vpu) -> restructuring the kernel into two
interleaved half-tiles hides the smaller unit; both ~= mxu + vpu -> Mosaic
serializes the units and the restructure cannot pay.

Methodology per CLAUDE.md: fori_loop inside jit (the pallas_call is the
loop body; its output feeds the next iteration's rays input so nothing
hoists), finite carry, np.asarray fence, best of 3.
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
TILE = 1024
G = 256
NROWS_I8 = 224  # 56 f32 rows x 4 int8 planes (the node-fetch shape)
K = 8  # fetch/chain reps per kernel invocation
VOPS = 16  # fused mul-add/min/max pairs per vpu rep
ITERS = 8


def _iota(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _kernel(mode, rays_ref, table_ref, out_ref):
    r = rays_ref.shape[1]
    seed = rays_ref[0:1, :]  # (1, R) f32, carry-dependent
    ids0 = (seed * 1e3).astype(jnp.int32) & (G - 1)  # (1, R)

    acc_m = jnp.zeros((8, r), jnp.int32)
    x = rays_ref[1:2, :] + 1.0
    y = rays_ref[2:3, :] + 2.0

    def mxu_rep(i, acc):
        ids = (ids0 + i) & (G - 1)
        oh = (_iota((G, r), 0) == ids).astype(jnp.int8)
        out = jax.lax.dot_general(
            table_ref[:], oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (224, R)
        # cheap fold so every rep's result is consumed (8 rows of xors)
        return acc ^ out[:8]

    def vpu_rep(x, y, extra=None):
        if extra is not None:  # chain mode: depend on the mxu result
            x = x + extra[0:1].astype(jnp.float32) * 1e-9
        for _ in range(VOPS):
            x = x * 1.000001 + 0.3
            y = jnp.minimum(jnp.maximum(y, x), 3.0) * 0.999
            x = jnp.minimum(x, 2.0)
        return x, y

    if mode == "mxu":
        for i in range(K):
            acc_m = mxu_rep(i, acc_m)
    elif mode == "vpu":
        for _ in range(K):
            x, y = vpu_rep(x, y)
    elif mode == "both":
        for i in range(K):
            acc_m = mxu_rep(i, acc_m)
            x, y = vpu_rep(x, y)
    elif mode == "chain":
        for i in range(K):
            acc_m = mxu_rep(i, acc_m)
            x, y = vpu_rep(x, y, extra=acc_m)
    else:
        raise ValueError(mode)

    z = (acc_m[0:1].astype(jnp.float32) * 1e-9 + x + y) * 1e-3
    out_ref[:] = jnp.broadcast_to(jnp.minimum(z, 1.0), (8, r))


def run(mode, table):
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
    def timed(rays, table):
        return jax.lax.fori_loop(
            0, ITERS, lambda _, c: call(c, table), rays
        )

    rng = np.random.default_rng(0)
    rays = jnp.asarray(rng.random((8, R), np.float32))
    np.asarray(timed(rays, table))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(timed(rays, table))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{mode:6s}: {best * 1e3:7.3f} ms/256k", flush=True)
    return best


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(1)
    table = jnp.asarray(
        rng.integers(-128, 128, (NROWS_I8, G)).astype(np.int8)
    )
    t_m = run("mxu", table)
    t_v = run("vpu", table)
    t_b = run("both", table)
    t_c = run("chain", table)
    print(
        f"serial sum = {(t_m + t_v) * 1e3:.3f} ms; overlap saves "
        f"{(t_m + t_v - t_b) / max(t_m + t_v, 1e-9) * 100:.0f}% (both) / "
        f"{(t_m + t_v - t_c) / max(t_m + t_v, 1e-9) * 100:.0f}% (chain)",
        flush=True,
    )


if __name__ == "__main__":
    main()
