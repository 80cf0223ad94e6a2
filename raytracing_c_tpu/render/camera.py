"""Pinhole camera ray generation.

Replicates the reference's raygen semantics (raytracer.c:641-698): jittered
uv in [-1, 1], aspect scaling on x, y flip, -focal_length forward, rotation
by the view matrix's upper-left 3x3, camera position = view_matrix * (0,0,0,1)
(raytracer.c:612).

Deliberate deviations (SURVEY §7 "quirks to not replicate"): x/y jitter are
independent uniforms (the reference computes rand_a and rand_b from identical
inputs, correlating jitter on the diagonal, raytracer.c:644-651), and
directions are normalized in full precision rather than with the approximate
rsqrt (raytracer.c:663).
"""

from __future__ import annotations

import jax.numpy as jnp


def generate_rays(camera, width, height, px, py, jitter):
    """Generate camera rays.

    px/py: (R,) pixel integer coordinates; jitter: (R, 2) uniforms in [0,1).
    Returns (origin, direction): (R, 3) each, direction unit-length.
    """
    width = jnp.float32(width)
    height = jnp.float32(height)
    aspect = width / height

    u = ((px.astype(jnp.float32) + jitter[:, 0] - 0.5) * 2.0 / width) - 1.0
    v = ((py.astype(jnp.float32) + jitter[:, 1] - 0.5) * 2.0 / height) - 1.0

    dx = u * aspect
    dy = -v
    dz = jnp.broadcast_to(-camera.focal_length, dx.shape)

    m = camera.view_matrix
    wx = m[0, 0] * dx + m[0, 1] * dy + m[0, 2] * dz
    wy = m[1, 0] * dx + m[1, 1] * dy + m[1, 2] * dz
    wz = m[2, 0] * dx + m[2, 1] * dy + m[2, 2] * dz
    d = jnp.stack([wx, wy, wz], axis=-1)
    d = d / jnp.sqrt((d * d).sum(-1, keepdims=True))

    origin = jnp.broadcast_to(m[:3, 3], d.shape)
    return origin, d
