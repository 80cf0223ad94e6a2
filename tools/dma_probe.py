"""In-kernel DMA row-gather rate probe (megakernel feasibility).

The texel taps are XLA row gathers: issue-bound at ~17 ns/row,
pattern-insensitive, ~4.45 ms per 256k (128-lane u32) rows, and they
cannot overlap with the traversal kernel's MXU work because XLA runs ops
sequentially. A whole-bounce Pallas megakernel COULD overlap them — but
only if a kernel can issue per-row HBM DMAs at a rate competitive with
the XLA gather engine. This probe measures that rate: one DMA per row
from an HBM-resident (N, 128) u32 table into the output block, indices
scalar-prefetched, Q descriptors in flight.

Verdict rule: ms/256k rows <= ~6 -> in-kernel taps are viable and the
megakernel can hide them under MXU work; >> 6 -> the XLA gather engine
keeps the taps and the megakernel idea dies (the taps stay a serial
4 ms/bounce floor).
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
N_ROWS = 162_000
ITERS = 8


def _kernel(q, sidx_ref, hbm_ref, out_ref, sems):
    def copy(j):
        row = sidx_ref[j]
        return pltpu.make_async_copy(
            hbm_ref.at[pl.ds(row, 1), :],
            out_ref.at[pl.ds(j, 1), :],
            sems.at[j % q],
        )

    def pro(j, c):
        copy(j).start()
        return c

    jax.lax.fori_loop(0, q, pro, 0)

    def body(j, c):
        copy(j - q).wait()
        copy(j).start()
        return c

    jax.lax.fori_loop(q, TILE, body, 0)

    def epi(j, c):
        copy(j).wait()
        return c

    jax.lax.fori_loop(TILE - q, TILE, epi, 0)


def run(q, table, idx):
    call = pl.pallas_call(
        functools.partial(_kernel, q),
        grid=(R // TILE,),
        in_specs=[
            # per-tile index block in SMEM (the full array would blow the
            # 1 MB SMEM as a scalar-prefetch operand); the scalar core
            # reads each row id directly from it to form DMA descriptors
            pl.BlockSpec((TILE,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((TILE, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((q,))],
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.uint32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )

    @jax.jit
    def timed(idx, table):
        def body(_, c):
            j = jnp.clip(idx + c.astype(jnp.int32), 0, N_ROWS - 1)
            page = call(j, table)
            s = (page[:, :1] & jnp.uint32(1)).astype(jnp.float32).sum() * 1e-9
            return jnp.minimum(s, 1.0)

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    np.asarray(timed(idx, table))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(timed(idx, table))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"dma q={q:<3d}: {best * 1e3:7.3f} ms/256k "
          f"({best / R * 1e9:.1f} ns/row)", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    table = jnp.asarray(
        rng.integers(0, 2**32, (N_ROWS, 128), np.uint64).astype(np.uint32)
    )
    idx = jnp.asarray(rng.integers(0, N_ROWS, R).astype(np.int32))
    for q in (4, 8, 16, 32):
        run(q, table, idx)


if __name__ == "__main__":
    main()
