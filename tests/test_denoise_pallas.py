"""Pallas denoiser kernel must match the jnp reference implementation
bit-for-bit (same algorithm, same f32 math)."""

import numpy as np
import jax.numpy as jnp

from raytracing_c_tpu.ops.denoise import denoise_u8
from raytracing_c_tpu.ops.denoise_pallas import denoise_u8_pallas


def test_matches_jnp_reference(rng):
    img = rng.integers(0, 256, (24, 256, 3), dtype=np.uint8)
    img[5, 100] = [255, 255, 255]
    img[17, 31] = [250, 255, 240]
    want = np.asarray(denoise_u8(jnp.asarray(img)))
    got = np.asarray(denoise_u8_pallas(jnp.asarray(img), interpret=True))
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_non_multiple_height(rng):
    img = rng.integers(0, 256, (13, 128, 3), dtype=np.uint8)
    want = np.asarray(denoise_u8(jnp.asarray(img)))
    got = np.asarray(denoise_u8_pallas(jnp.asarray(img), interpret=True))
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_flat_image_unchanged(rng):
    img = np.full((16, 128, 3), 77, np.uint8)
    got = np.asarray(denoise_u8_pallas(jnp.asarray(img), interpret=True))
    assert (got == 77).all()
