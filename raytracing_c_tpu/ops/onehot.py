"""Exact one-hot MXU row fetch — the shared XLA-side idiom.

A per-ray row fetch from a small table can run as a matmul against a
one-hot of the row id: output lands batch-minor (no per-lane gather, no
(R, W) -> (W, R) relayout), and with full-f32 precision the
reconstruction is BIT-exact (1.0*x and +0 are exact). The precision
matters: the TPU's platform-DEFAULT matmul is bf16-grade and both
perturbs f32 values and ROUNDS integer ids > 256 — the round-3 hardware
bug documented at traverse_pallas.LEAF_PRECISION. Every exactness-
critical one-hot fetch outside the Pallas kernels must go through this
helper so the precision invariant lives in ONE place (in-kernel fetches
use the cheaper 3-plane split tables, traverse_pallas._fetch_split).

Users: disney.shade (material rows), texture._tex_params (texture
parameters), traverse_pallas._interp_attrs (gmap row).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fetch_rows_exact(table, ids, precision=jax.lax.Precision.HIGHEST):
    """table (W, K) x onehot(ids (R,)) -> (W, R) f32, bit-exact.

    Cost: W * K * R MACs * 6 passes (HIGHEST) — use for SMALL tables
    (K <= a few hundred); the one-hot build alone is K * R compares.
    Do not lower `precision` without an on-chip probe proving the
    platform default became exact (traverse_pallas.LEAF_PRECISION)."""
    k = table.shape[1]
    oh = (
        jax.lax.broadcasted_iota(jnp.int32, (k, ids.shape[0]), 0)
        == ids[None, :]
    ).astype(jnp.float32)
    return jax.lax.dot_general(
        table.astype(jnp.float32), oh, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )
