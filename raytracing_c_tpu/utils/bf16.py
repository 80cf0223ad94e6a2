"""Conservative bfloat16 rounding for bounding volumes.

Storing AABBs in bf16 halves the traversal's node-fetch bytes, but naive
rounding could shrink a box and cause a FALSE MISS (wrong image). Rounding
the minima toward -inf and the maxima toward +inf only ever grows boxes:
misses stay impossible, at worst a few extra leaf tests — the standard
quantized-BVH trick (cf. PAPERS.md "Minimizing Ray Tracing Memory Traffic
through Quantized Structures").
"""

from __future__ import annotations

import numpy as np
import ml_dtypes

BF16 = ml_dtypes.bfloat16


def _step_ulp(bits: np.ndarray, toward_neg: np.ndarray) -> np.ndarray:
    """One bf16 ulp step in sign-magnitude space."""
    sign = (bits & 0x8000) != 0
    mag = (bits & 0x7FFF).astype(np.int32)
    # toward -inf: positives shrink magnitude, negatives grow it
    delta = np.where(sign, 1, -1)
    delta = np.where(toward_neg, delta, -delta)
    new_mag = mag + delta
    # crossing zero flips sign: +0 stepping down -> smallest negative
    crossed = new_mag < 0
    new_sign = np.where(crossed, ~sign, sign)
    new_mag = np.where(crossed, 1, new_mag)
    new_mag = np.minimum(new_mag, 0x7F80)  # clamp at +/-inf
    return (
        np.where(new_sign, 0x8000, 0).astype(np.uint16)
        | new_mag.astype(np.uint16)
    )


def _round_directed(x: np.ndarray, toward_neg: bool) -> np.ndarray:
    x = np.asarray(x, np.float32)
    bf = x.astype(BF16)
    back = bf.astype(np.float32)
    need = (back > x) if toward_neg else (back < x)
    bits = bf.view(np.uint16)
    stepped = _step_ulp(bits, np.full(x.shape, toward_neg))
    out_bits = np.where(need, stepped, bits)
    return out_bits.view(BF16)


def round_down(x: np.ndarray) -> np.ndarray:
    """bf16 value <= x (toward -inf)."""
    return _round_directed(x, True)


def round_up(x: np.ndarray) -> np.ndarray:
    """bf16 value >= x (toward +inf)."""
    return _round_directed(x, False)
