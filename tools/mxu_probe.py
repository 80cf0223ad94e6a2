"""MXU rate probe for the Pallas traversal kernel design.

The kernel turns the per-ray BVH row fetches (HBM-latency-bound row gathers,
docs/PERF.md) into one-hot matmuls on the MXU with tables VMEM-resident.
This probe measures, on the real chip, the rates that set the design's cost
model. Every loop body consumes and produces the FULL carried array so XLA
cannot slice away the work (an earlier version carried a [:1,:1] slice and
measured impossible 5000 T/s rates — the compiler had sliced through the
dot).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/mxu_probe.py
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("backend:", jax.default_backend())
key = jax.random.PRNGKey(0)

ITERS = 32  # fori_loop trips inside one jit (amortizes tunnel dispatch)


def bench(name, fn, *args, work=1):
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(f(*args))
    dt = (time.perf_counter() - t0) / ITERS
    rate = work / ITERS / dt / 1e12
    print(f"{name}: {dt*1e6:.1f} us/iter  ({rate:.2f} T/s)")
    return dt


# --- 1. raw matmul rates ---------------------------------------------------
# table^T @ one_hot^T: (W, G) @ (G, kR). Helmet leaf stage: W=576, G=512,
# kR = k3 * R_tile.
for W, G, N in [(576, 512, 2048), (576, 512, 4096), (128, 512, 2048)]:
    for dt_ in (jnp.float32, jnp.bfloat16):
        a = jax.random.normal(key, (W, G), dt_)
        b = jax.random.normal(key, (G, N), dt_)

        def mm(a, b):
            def body(i, acc):
                # full-carry dependence: the next matmul consumes the whole
                # previous result, so nothing can be sliced away or hoisted
                return jnp.tanh(
                    jnp.dot(a, b, preferred_element_type=jnp.float32)
                    * 1e-4
                    + acc * 0.5
                )

            return jax.lax.fori_loop(
                0, ITERS, body, jnp.zeros((W, N), jnp.float32)
            )

        bench(
            f"matmul ({W},{G})@({G},{N}) {dt_.__name__}",
            mm, a, b, work=ITERS * W * G * N,
        )

# --- 2. XLA-level fused one-hot gather --------------------------------------
# gather k3=2 group rows per ray from a (G, W) table, rays minor
G, W, R, K = 512, 576, 1024, 2
table_t = jax.random.normal(key, (W, G), jnp.float32)  # (W, G)
ids0 = jax.random.randint(key, (1, K * R), 0, G, jnp.int32)


def onehot_gather(table_t, ids0):
    def body(i, carry):
        acc, ids = carry
        oh = (
            jax.lax.broadcasted_iota(jnp.int32, (G, K * R), 0)
            == ids
        ).astype(table_t.dtype)
        g = jnp.dot(table_t, oh, preferred_element_type=jnp.float32)
        acc = acc * 0.5 + g
        # derive next ids from the full result (full-carry dependence)
        ids = (ids + acc[:1, :].astype(jnp.int32)) % G
        return acc, ids

    acc, _ = jax.lax.fori_loop(
        0, ITERS, body, (jnp.zeros((W, K * R), jnp.float32), ids0)
    )
    return acc


bench(
    f"XLA one-hot gather {K}x{R} rows from ({G},{W}) f32",
    onehot_gather, table_t, ids0,
    work=ITERS * W * G * K * R,
)

# row-gather baseline for the same fetch (the current production path)
table = jnp.asarray(np.asarray(table_t).T)  # (G, W)


def row_gather(table, ids0):
    def body(i, carry):
        acc, ids = carry
        g = jnp.transpose(table[ids[0]])  # (W, KR)
        acc = acc * 0.5 + g
        ids = (ids + acc[:1, :].astype(jnp.int32)) % G
        return acc, ids

    acc, _ = jax.lax.fori_loop(
        0, ITERS, body, (jnp.zeros((W, K * R), jnp.float32), ids0)
    )
    return acc


bench(
    f"XLA row-gather {K}x{R} rows from ({G},{W}) f32", row_gather, table, ids0,
    work=ITERS * W * G * K * R,
)


# --- 3. pallas one-hot gather kernel ----------------------------------------
def _gather_kernel(ids_ref, table_ref, out_ref):
    def body(i, carry):
        acc, ids = carry
        oh = (
            jax.lax.broadcasted_iota(jnp.int32, (G, K * R), 0)
            == ids
        ).astype(jnp.float32)
        g = jnp.dot(table_ref[:], oh, preferred_element_type=jnp.float32)
        acc = acc * 0.5 + g
        ids = (ids + acc[:1, :].astype(jnp.int32)) % G
        return acc, ids

    acc, _ = jax.lax.fori_loop(
        0, ITERS, body,
        (jnp.zeros((W, K * R), jnp.float32), ids_ref[:]),
    )
    out_ref[:] = acc


def pallas_gather(table_t, ids0):
    return pl.pallas_call(
        _gather_kernel,
        out_shape=jax.ShapeDtypeStruct((W, K * R), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(ids0, table_t)


bench(
    f"pallas one-hot gather {K}x{R} rows from ({G},{W}) f32",
    pallas_gather, table_t, ids0,
    work=ITERS * W * G * K * R,
)

# --- 4. top-k selection cost over (64, R) keys, rays minor -------------------
D, RR = 64, 2048
BIG = 3e38  # python float: jnp constants capture as consts inside pallas


def bitonic64(keys):
    """Full bitonic sort of axis 0 (64) via reshape min/max stages."""
    for stage in range(6):  # block sizes 2..64
        blk = 2 << stage
        for sub in range(stage, -1, -1):
            s = 1 << sub
            k = keys.reshape(D // (2 * s), 2, s, -1)
            lo, hi = jnp.minimum(k[:, 0], k[:, 1]), jnp.maximum(k[:, 0], k[:, 1])
            idx = jax.lax.broadcasted_iota(
                jnp.int32, (D // (2 * s), 1, 1), 0
            ) * s
            up = (idx // (blk // 2)) % 2 == 0
            a = jnp.where(up, lo, hi)
            b = jnp.where(up, hi, lo)
            keys = jnp.stack([a, b], axis=1).reshape(D, -1)
    return keys


def extract8(keys):
    """Top-8 by iterative min-extraction (keys unique via id bits)."""
    outs = []
    for _ in range(8):
        m = jnp.min(keys, axis=0)
        outs.append(m)
        keys = jnp.where(keys == m[None, :], BIG, keys)
    outs.append(jnp.min(keys, axis=0))  # dropped_min
    return jnp.stack(outs, axis=0), keys


def sort_bench(x):
    def body(i, acc):
        return bitonic64(acc * 0.999)

    return jax.lax.fori_loop(0, ITERS, body, x)


def extract_bench(x):
    def body(i, acc):
        top, rest = extract8(acc)
        return rest * 0.999 + top[:1, :] * 1e-9

    return jax.lax.fori_loop(0, ITERS, body, x)


x = jax.random.normal(key, (D, RR), jnp.float32)
bench("bitonic64 full sort (64,2048) f32", sort_bench, x,
      work=ITERS * 21 * D * RR)
bench("extract top-8 of (64,2048) f32", extract_bench, x,
      work=ITERS * 9 * D * RR)


# pallas twin of the extraction (Mosaic codegen can differ from XLA:CPU path)
def _extract_kernel(x_ref, out_ref):
    def body(i, acc):
        top, rest = extract8(acc)
        return rest * 0.999 + top[:1, :] * 1e-9

    out_ref[:] = jax.lax.fori_loop(0, ITERS, body, x_ref[:])


def pallas_extract(x):
    return pl.pallas_call(
        _extract_kernel,
        out_shape=jax.ShapeDtypeStruct((D, RR), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


bench("pallas extract top-8 of (64,2048) f32", pallas_extract, x,
      work=ITERS * 9 * D * RR)

# --- 5. Moller-Trumbore VPU cost at kernel shapes ----------------------------
# 128 candidate tris per ray after the leaf gather: (128, R) planes x 9 comps
COMP = jax.random.normal(key, (9, 128, RR), jnp.float32)


def mt_bench(comp):
    o = comp[0] * 0.1

    def body(i, acc):
        v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z = (
            comp[j] + acc * 1e-9 for j in range(9)
        )
        # ~the MT op mix: 2 crosses, 3 dots, 1 div, compares
        px = e1y * e2z - e1z * e2y
        py = e1z * e2x - e1x * e2z
        pz = e1x * e2y - e1y * e2x
        det = v0x * px + v0y * py + v0z * pz
        inv = 1.0 / det
        u = inv * (o * px + v0y * py + v0z * pz)
        v = inv * (o * py + v0x * px + v0z * pz)
        t = inv * (o * pz + v0x * px + v0y * py)
        ok = (u >= -1e-3) & (u <= 1.001) & (v >= -1e-3) & (t >= 1e-3)
        return jnp.where(ok, t, BIG)

    return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((128, RR), jnp.float32))


bench("MT-mix (128,2048) f32 (~40 flops)", mt_bench, COMP,
      work=ITERS * 40 * 128 * RR)
