"""Ray/primitive intersection kernels.

TPU-native re-design of the reference's 8-wide AVX kernels: the SIMD lane
dimension becomes an array axis, so the same math vectorizes over (rays x
primitives) batches of any shape. Semantics (epsilon tolerances, miss
encoding as +inf, no backface cull) follow the reference exactly:

- Moller-Trumbore triangles: ray_triangles_hit_8, raytracer.c:84-188
- AABB slab test:            ray_aabbs_hit_8,     raytracer.c:190-230
- analytic spheres:          ray_spheres_hit_8,   raytracer.c:34-82
"""

from __future__ import annotations

import jax.numpy as jnp

from raytracing_c_tpu import EPSILON

INF = jnp.float32(jnp.inf)


def moller_trumbore(origin, direction, v0, e1, e2, eps: float = EPSILON):
    """Batched Moller-Trumbore (reference raytracer.c:84-157).

    origin/direction: (..., 3); v0/e1/e2: (..., 3) broadcast-compatible.
    Returns (t, u, v) where t == +inf encodes a miss. Tolerances match the
    reference: barycentrics accepted within +/-eps, t >= eps, and no
    backface culling. NaNs from degenerate (all-zero padding) triangles
    resolve to misses through the ordered comparisons.
    """
    pvec = jnp.cross(direction, e2)
    det = (e1 * pvec).sum(-1)
    inv_det = 1.0 / det

    tvec = origin - v0
    qvec = jnp.cross(tvec, e1)

    u = inv_det * (tvec * pvec).sum(-1)
    v = inv_det * (direction * qvec).sum(-1)
    t = inv_det * (e2 * qvec).sum(-1)

    ok = (
        (u >= -eps)
        & (u <= 1.0 + eps)
        & (v >= -eps)
        & (u + v <= 1.0 + eps)
        & (t >= eps)
    )
    t = jnp.where(ok, t, INF)
    return t, u, v


def aabb_slab(origin, inv_dir, box_min, box_max, t_min, t_max):
    """Batched slab test (reference raytracer.c:190-230).

    origin/inv_dir: (..., 3); box_min/box_max: (..., K, 3).
    t_min is a scalar entry epsilon; t_max the current-best pruning bound
    (scalar or (...,) broadcast). Returns (..., K) entry distances with +inf
    for misses (reference encodes misses the same way; the >= compare means
    degenerate zero boxes never hit).
    """
    o = origin[..., None, :]
    inv = inv_dir[..., None, :]
    t0 = (box_min - o) * inv
    t1 = (box_max - o) * inv
    t_small = jnp.minimum(t0, t1).max(axis=-1)
    t_big = jnp.maximum(t0, t1).min(axis=-1)

    t_near = jnp.maximum(t_small, t_min)
    if isinstance(t_max, (int, float)):
        t_far = jnp.minimum(t_big, jnp.float32(t_max))
    else:
        t_far = jnp.minimum(t_big, t_max[..., None])
    # ordered < so NaN lanes (origin exactly on a degenerate slab) miss
    return jnp.where(t_near < t_far, t_near, INF)


def sphere_hit(origin, direction, center, radius, eps: float = EPSILON):
    """Batched analytic sphere intersection (reference raytracer.c:34-82).

    center: (..., S, 3), radius: (..., S). Returns t with +inf for misses.
    Matches the reference exactly: only the near root -b - sqrt(d) is taken
    (rays starting inside a sphere miss it), d <= 0 counts as a miss, and
    t <= eps is rejected.
    """
    oc = origin[..., None, :] - center
    a = (direction * direction).sum(-1)[..., None]
    b = 2.0 * (oc * direction[..., None, :]).sum(-1)
    c = (oc * oc).sum(-1) - radius * radius

    d = b * b - 4.0 * a * c
    sqrt_d = jnp.sqrt(jnp.maximum(d, 0.0))
    t = (-b - sqrt_d) / (2.0 * a)
    ok = (d > 0.0) & (t > eps)
    return jnp.where(ok, t, INF)


def intersect_bruteforce(origin, direction, triangles, eps: float = EPSILON):
    """Exhaustive intersection of each ray against every triangle — the
    reference's own `#if 0` BVH-correctness oracle (raytracer.c:497-503).

    origin/direction: (R, 3). Returns dict(t, tri, u, v) of (R,) arrays.
    """
    t, u, v = moller_trumbore(
        origin[:, None, :],
        direction[:, None, :],
        triangles.v0[None, :, :],
        triangles.e1[None, :, :],
        triangles.e2[None, :, :],
        eps,
    )  # (R, N)
    best = jnp.argmin(t, axis=1)
    r = jnp.arange(t.shape[0])
    return {
        "t": t[r, best],
        "tri": best.astype(jnp.int32),
        "u": u[r, best],
        "v": v[r, best],
    }


def intersect_spheres(origin, direction, spheres, best_t, eps: float = EPSILON):
    """Brute-force sphere pass (reference loops 8-wide blocks,
    raytracer.c:485-489). Returns (t, sphere_index) with t=+inf if none
    closer than best_t."""
    if spheres.count == 0:
        r = origin.shape[0]
        return jnp.full((r,), jnp.inf, jnp.float32), jnp.full((r,), -1, jnp.int32)
    t = sphere_hit(origin, direction, spheres.center[None], spheres.radius[None], eps)
    idx = jnp.argmin(t, axis=1)
    r = jnp.arange(t.shape[0])
    tb = t[r, idx]
    hit = tb < best_t
    return jnp.where(hit, tb, jnp.inf), jnp.where(hit, idx.astype(jnp.int32), -1)
