"""Small-vector math over (..., 3) jnp arrays.

The reference's 8/16-wide SIMD structs (common.h:44-128) disappear on TPU:
JAX arrays are natively wide, so every helper here is written for arbitrary
leading batch dimensions and vectorizes over the ray arena. All arithmetic is
explicit elementwise (VPU) — no tiny matmuls that would route through the MXU
at reduced precision.
"""

from __future__ import annotations

import jax.numpy as jnp


def dot(a, b):
    return (a * b).sum(axis=-1)


def cross(a, b):
    ax, ay, az = a[..., 0], a[..., 1], a[..., 2]
    bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
    return jnp.stack(
        [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=-1
    )


def length2(a):
    return dot(a, a)


def length(a):
    return jnp.sqrt(length2(a))


def normalize(a, eps: float = 0.0):
    """Full-precision normalize.

    The reference camera uses approximate `_mm256_rsqrt_ps` (raytracer.c:663);
    per SURVEY §7 we deliberately do NOT match that precision.
    """
    n2 = length2(a)
    inv = jnp.where(n2 > eps, jax_rsqrt(n2), 0.0)
    return a * inv[..., None]


def jax_rsqrt(x):
    import jax

    return jax.lax.rsqrt(x)


def reflect(v, n):
    """Reflect v about unit normal n: v - 2*dot(v,n)*n."""
    return v - 2.0 * dot(v, n)[..., None] * n


def lerp(a, b, t):
    return a * (1.0 - t) + b * t


def mat3_mul_vec(m, v):
    """(..., 3, 3) @ (..., 3) without MXU: explicit row dots."""
    return jnp.stack(
        [
            dot(m[..., 0, :], v),
            dot(m[..., 1, :], v),
            dot(m[..., 2, :], v),
        ],
        axis=-1,
    )


def basis(view, normal):
    """Build a view-aligned tangent basis around `normal`.

    Mirrors reference driver.c:155-164: tangent = normalize(cross(normal, view))
    unless normal ~ view, falling back to the +Y then +X axes.
    Returns (tangent, bitangent).
    """
    up_y = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    up_x = jnp.array([1.0, 0.0, 0.0], jnp.float32)

    use_view = jnp.abs(dot(normal, view)) < 0.9999
    use_y = jnp.abs(normal[..., 1]) < 0.9999  # dot(normal, (0,1,0))

    t_view = cross(normal, view)
    t_y = cross(normal, jnp.broadcast_to(up_y, normal.shape))
    t_x = cross(normal, jnp.broadcast_to(up_x, normal.shape))

    t = jnp.where(
        use_view[..., None], t_view, jnp.where(use_y[..., None], t_y, t_x)
    )
    t = normalize(t)
    b = cross(normal, t)
    return t, b
