"""Unit tests for the intersection kernels (reference raytracer.c:34-230)."""

import numpy as np
import jax.numpy as jnp

from raytracing_c_tpu import EPSILON
from raytracing_c_tpu.ops.intersect import (
    aabb_slab,
    moller_trumbore,
    sphere_hit,
)


def _tri(v0, v1, v2):
    v0, v1, v2 = map(lambda a: jnp.asarray(a, jnp.float32), (v0, v1, v2))
    return v0, v1 - v0, v2 - v0


def test_mt_basic_hit():
    v0, e1, e2 = _tri([-1, -1, 0], [1, -1, 0], [0, 1, 0])
    o = jnp.array([0.0, -0.25, -2.0])
    d = jnp.array([0.0, 0.0, 1.0])
    t, u, v = moller_trumbore(o, d, v0, e1, e2)
    assert np.isclose(float(t), 2.0, atol=1e-5)
    w = 1.0 - float(u) - float(v)
    assert 0 <= u <= 1 and 0 <= v <= 1 and 0 <= w <= 1
    # barycentric reconstruction
    p = np.asarray(v0) * w + np.asarray(v0 + e1) * float(u) + np.asarray(v0 + e2) * float(v)
    np.testing.assert_allclose(p, [0.0, -0.25, 0.0], atol=1e-5)


def test_mt_no_backface_cull():
    # the reference has no backface culling (raytracer.c:84-157)
    v0, e1, e2 = _tri([-1, -1, 0], [1, -1, 0], [0, 1, 0])
    o = jnp.array([0.0, -0.25, 2.0])
    d = jnp.array([0.0, 0.0, -1.0])
    t, _, _ = moller_trumbore(o, d, v0, e1, e2)
    assert np.isclose(float(t), 2.0, atol=1e-5)


def test_mt_miss_and_epsilon():
    v0, e1, e2 = _tri([-1, -1, 0], [1, -1, 0], [0, 1, 0])
    d = jnp.array([0.0, 0.0, 1.0])
    # clear miss
    t, _, _ = moller_trumbore(jnp.array([5.0, 0.0, -2.0]), d, v0, e1, e2)
    assert np.isinf(float(t))
    # t < EPSILON rejected (origin on the plane)
    t, _, _ = moller_trumbore(jnp.array([0.0, -0.25, 0.0]), d, v0, e1, e2)
    assert np.isinf(float(t))
    # barycentric tolerance: a point just outside the edge within eps still hits
    t, _, _ = moller_trumbore(
        jnp.array([0.0, -1.0 - 0.5 * EPSILON, -1.0]), d, v0, e1, e2
    )
    assert np.isfinite(float(t))


def test_mt_degenerate_padding_triangle_misses():
    z = jnp.zeros(3)
    t, _, _ = moller_trumbore(jnp.array([0.0, 0.0, -2.0]), jnp.array([0.0, 0.0, 1.0]), z, z, z)
    assert np.isinf(float(t))


def test_slab_basic():
    o = jnp.array([0.0, 0.0, -5.0])
    inv = 1.0 / jnp.array([1e-30, 1e-30, 1.0])  # +z ray; near-zero handled by inf
    box_min = jnp.array([[[-1.0, -1.0, -1.0], [3.0, 3.0, 3.0]]])[0]
    box_max = jnp.array([[[1.0, 1.0, 1.0], [4.0, 4.0, 4.0]]])[0]
    d = aabb_slab(o, inv, box_min, box_max, EPSILON, jnp.inf)
    assert np.isclose(float(d[0]), 4.0, atol=1e-4)
    assert np.isinf(float(d[1]))


def test_slab_degenerate_zero_box_misses():
    # zero AABBs (empty BVH lanes) must never hit (SURVEY §3.3)
    o = jnp.array([5.0, 5.0, 5.0])
    inv = 1.0 / jnp.array([-1.0, -1.0, -1.0]) / np.sqrt(3)
    z = jnp.zeros((1, 3))
    d = aabb_slab(o, inv, z, z, EPSILON, jnp.inf)
    assert np.isinf(float(d[0]))


def test_slab_origin_inside():
    o = jnp.zeros(3)
    d = aabb_slab(
        o, 1.0 / jnp.array([1.0, 1.0, 1.0]),
        jnp.array([[-1.0, -1.0, -1.0]]), jnp.array([[1.0, 1.0, 1.0]]),
        EPSILON, jnp.inf,
    )
    # inside the box: entry clamped to the t_min epsilon
    assert np.isclose(float(d[0]), EPSILON)


def test_slab_respects_tmax_pruning():
    o = jnp.array([0.0, 0.0, -5.0])
    inv = 1.0 / jnp.array([1e-30, 1e-30, 1.0])
    d = aabb_slab(
        o, inv, jnp.array([[-1.0, -1.0, -1.0]]), jnp.array([[1.0, 1.0, 1.0]]),
        EPSILON, 2.0,
    )
    assert np.isinf(float(d[0]))  # box at t=4 beyond t_max=2 -> prune


def test_sphere_hit_semantics():
    c = jnp.array([[0.0, 0.0, 0.0]])
    r = jnp.array([1.0])
    d = jnp.array([0.0, 0.0, 1.0])
    # outside hit: near root
    t = sphere_hit(jnp.array([0.0, 0.0, -3.0]), d, c, r)
    assert np.isclose(float(t[0]), 2.0, atol=1e-5)
    # inside the sphere: reference takes only the near root -> miss
    t = sphere_hit(jnp.array([0.0, 0.0, 0.0]), d, c, r)
    assert np.isinf(float(t[0]))
    # tangent (d == 0) counts as miss
    t = sphere_hit(jnp.array([1.0, 0.0, -3.0]), d, c, r)
    assert np.isinf(float(t[0]))
