"""Color management: sRGB transfer curves, luminance, tonemaps.

Mirrors the reference semantics exactly:
- `srgb_to_linear` is the reference's *nonstandard* pure power curve with no
  linear segment (common.h:82-88). We replicate it because every texture and
  the env map pass through it, so goldens depend on it.
- `linear_to_srgb` is the correct piecewise curve (common.h:90-92).
- ACES and Reinhard tonemaps exist but are disabled in the default pipeline,
  matching the commented-out call at raytracer.c:701.
"""

from __future__ import annotations

import jax.numpy as jnp

#: Rec.709 luma weights, reference driver.c:200-202 / denoiser.c:12-14.
LUMA = (0.2126, 0.7152, 0.0722)


def srgb_to_linear(c):
    """Nonstandard pure-pow sRGB decode (reference common.h:82-88).

    Note: deliberately NOT the piecewise sRGB EOTF; the reference applies
    ((x + 0.055) / 1.055) ** 2.4 to every channel unconditionally.
    """
    c = jnp.asarray(c, jnp.float32)
    return jnp.power(jnp.maximum(c + 0.055, 0.0) / 1.055, 2.4)


def linear_to_srgb(c):
    """Piecewise linear->sRGB encode (reference common.h:90-92)."""
    c = jnp.asarray(c, jnp.float32)
    lo = 12.92 * c
    hi = 1.055 * jnp.power(jnp.maximum(c, 1e-12), 1.0 / 2.4) - 0.055
    return jnp.where(c <= 0.0031308, lo, hi)


def luminance(rgb):
    """Rec.709 luminance of an (..., 3) array (reference driver.c:200-202)."""
    rgb = jnp.asarray(rgb)
    return (
        rgb[..., 0] * LUMA[0] + rgb[..., 1] * LUMA[1] + rgb[..., 2] * LUMA[2]
    )


def aces(x):
    """ACES filmic curve (reference raytracer.c:560-567; disabled by default)."""
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    x = jnp.asarray(x, jnp.float32)
    return (x * (a * x + b)) / (x * (c * x + d) + e)


def reinhard(x):
    """Extended Reinhard with L_white=4 (reference raytracer.c:569-572)."""
    l_white = 4.0
    x = jnp.asarray(x, jnp.float32)
    return jnp.clip((x * (1.0 + x / (l_white * l_white))) / (1.0 + x), 0.0, 1.0)


def encode_u8(linear_rgb):
    """clamp -> linear_to_srgb -> *255.999 -> u8 (reference raytracer.c:700-716)."""
    c = jnp.clip(jnp.asarray(linear_rgb, jnp.float32), 0.0, 1.0)
    c = linear_to_srgb(c)
    return (c * 255.999).astype(jnp.uint8)
