"""Conservative bf16 rounding properties."""

import numpy as np

from raytracing_c_tpu.utils import bf16


def test_directed_rounding_bounds(rng):
    x = np.concatenate(
        [
            rng.normal(0, 100, 20000).astype(np.float32),
            rng.normal(0, 1e-3, 1000).astype(np.float32),
            np.array([0.0, -0.0, 1.0, -1.0, 1e-30, -1e-30, 3.14159], np.float32),
        ]
    )
    lo = bf16.round_down(x).astype(np.float32)
    hi = bf16.round_up(x).astype(np.float32)
    assert (lo <= x).all()
    assert (hi >= x).all()
    # within ~2 bf16 ulps (relative 2^-7 per ulp)
    span = hi - lo
    assert (span <= np.maximum(np.abs(x) * 2**-5, 1e-35)).all()


def test_exact_values_unchanged():
    x = np.array([0.0, 1.0, -2.0, 0.5, 1024.0], np.float32)  # bf16-exact
    assert (bf16.round_down(x).astype(np.float32) == x).all()
    assert (bf16.round_up(x).astype(np.float32) == x).all()
