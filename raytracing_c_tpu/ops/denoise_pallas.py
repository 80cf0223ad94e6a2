"""Pallas TPU kernel for the firefly median denoiser.

The same algorithm as ops/denoise.py (reference denoiser.c:47-127), fused
into ONE VMEM-resident kernel: each grid step owns a row-block of the image,
builds the 3x3 neighborhood from three row-shifted input views plus
in-register lane rolls, ranks the 9 samples with an odd-even transposition
sort network (no data-dependent control flow), and blends luminance
outliers toward the median.

The jnp implementation materializes the (H, W, 9) neighborhood stack and an
argsorted index tensor in HBM; here the neighborhood never leaves VMEM —
one read of three shifted row views per channel, one write per output block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracing_c_tpu.ops.denoise import (
    DENOISING_THRESHOLD,
    NEIGHBOURHOOD_WEIGHT,
)
from raytracing_c_tpu.utils import color

_BLOCK_ROWS = 8


def _denoise_kernel(*refs, width):
    """refs: 9 inputs (up/mid/down row views x r/g/b) + 3 outputs."""
    (ur, ug, ub, mr, mg, mb, dr, dg, db, or_ref, og_ref, ob_ref) = refs

    rows = {
        -1: (ur[:], ug[:], ub[:]),
        0: (mr[:], mg[:], mb[:]),
        1: (dr[:], dg[:], db[:]),
    }
    lane = jax.lax.broadcasted_iota(jnp.int32, rows[0][0].shape, 1)

    def shift_x(a, dx):
        # horizontal neighbor with edge clamp (denoiser.c:17-20);
        # pltpu.roll requires a non-negative rotation
        rolled = pltpu.roll(a, (-dx) % width, 1)
        if dx < 0:
            return jnp.where(lane == 0, a, rolled)
        return jnp.where(lane == width - 1, a, rolled)

    samples = []  # 9 x [lum, r, g, b], each (BLOCK, W)
    for dy in (-1, 0, 1):
        row_r, row_g, row_b = rows[dy]
        for dx in (-1, 0, 1):
            sr = shift_x(row_r, dx) if dx else row_r
            sg = shift_x(row_g, dx) if dx else row_g
            sb = shift_x(row_b, dx) if dx else row_b
            lum = (
                sr * color.LUMA[0] + sg * color.LUMA[1] + sb * color.LUMA[2]
            )
            samples.append([lum, sr, sg, sb])

    orig = list(samples[4])  # center sample (dy=0, dx=0)

    # odd-even transposition sort network keyed by luminance; the payload
    # channels swap with the key (in-register variadic sort)
    def cswap(i, j):
        a, b = samples[i], samples[j]
        swap = a[0] > b[0]
        for c in range(4):
            ai = jnp.where(swap, b[c], a[c])
            bj = jnp.where(swap, a[c], b[c])
            samples[i][c] = ai
            samples[j][c] = bj

    for rnd in range(9):
        for i in range(rnd % 2, 8, 2):
            cswap(i, i + 1)

    median = samples[4]
    total = samples[0][0]
    for s in samples[1:]:
        total = total + s[0]
    mean = (total - samples[0][0] - samples[8][0]) / 7.0

    noisiness = jnp.abs(median[0] - mean)
    orig_lum = orig[0]
    diff = jnp.abs(median[0] - orig_lum) - noisiness * NEIGHBOURHOOD_WEIGHT
    t = jnp.clip(diff, 0.0, DENOISING_THRESHOLD) / DENOISING_THRESHOLD

    or_ref[:] = orig[1] * (1.0 - t) + median[1] * t
    og_ref[:] = orig[2] * (1.0 - t) + median[2] * t
    ob_ref[:] = orig[3] * (1.0 - t) + median[3] * t


@functools.partial(jax.jit, static_argnames=("interpret",))
def denoise_u8_pallas(img, interpret: bool = False):
    """img: (H, W, 3) u8 -> (H, W, 3) u8. Pallas TPU fast path; semantics
    identical to ops.denoise.denoise_u8 (tests assert equality)."""
    h, w, _ = img.shape
    f = img.astype(jnp.float32) * (1.0 / 255.999)
    pad_rows = (-h) % _BLOCK_ROWS
    hp = h + pad_rows

    # three edge-clamped row views per channel: rows y-1, y, y+1
    views = []
    for dy in (-1, 0, 1):
        idx = jnp.clip(jnp.arange(hp) + dy, 0, h - 1)
        for c in range(3):
            views.append(f[idx, :, c])

    # reorder to (up rgb..., mid rgb..., down rgb...) — already in that order
    n_blocks = hp // _BLOCK_ROWS
    block = pl.BlockSpec(
        (_BLOCK_ROWS, w), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pl.GridSpec(
        grid=(n_blocks,), in_specs=[block] * 9, out_specs=[block] * 3
    )
    out_shape = [jax.ShapeDtypeStruct((hp, w), jnp.float32)] * 3

    orc, ogc, obc = pl.pallas_call(
        functools.partial(_denoise_kernel, width=w),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(*views)

    out = jnp.stack([orc[:h], ogc[:h], obc[:h]], axis=-1)
    return (out * 255.999).astype(jnp.uint8)
