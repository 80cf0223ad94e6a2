"""Environment background shading (miss rays).

Equirect mapping u = 0.5 + atan2(z, x)/2pi, v = 0.5 - asin(y)/pi with a
bilinear sample and sRGB->linear decode, matching sample_background
(driver.c:95-104); or a constant linear color.
"""

from __future__ import annotations

import jax.numpy as jnp

from raytracing_c_tpu.models.scene import BG_EQUIRECT
from raytracing_c_tpu.ops import texture
from raytracing_c_tpu.utils import color


def eval_background(scene, direction):
    """Background radiance for (R, 3) unit directions -> (R, 3) linear RGB."""
    bg = scene.background
    r = direction.shape[0]
    if bg.kind == BG_EQUIRECT and bg.tex_id >= 0:
        x, y, z = direction[:, 0], direction[:, 1], direction[:, 2]
        u = 0.5 + jnp.arctan2(z, x) * (0.5 / jnp.pi)
        v = 0.5 - jnp.arcsin(jnp.clip(y, -1.0, 1.0)) * (1.0 / jnp.pi)
        uv = jnp.stack([u, v], axis=-1)
        tid = jnp.full((r,), bg.tex_id, jnp.int32)
        rgb = texture.sample_bilinear(scene.atlas, tid, uv)
        return color.srgb_to_linear(rgb)
    return jnp.broadcast_to(bg.color, (r, 3))
