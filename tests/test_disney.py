"""Disney BRDF ubershader tests (reference driver.c:118-418)."""

import numpy as np
import jax
import jax.numpy as jnp

from raytracing_c_tpu.ops import disney


def test_cosine_hemisphere_distribution():
    key = jax.random.PRNGKey(0)
    u = jax.random.uniform(key, (4096, 2))
    d = np.asarray(disney.sample_cosine_hemisphere(u[:, 0], u[:, 1]))
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-4)
    assert (d[:, 2] >= 0).all()
    # cosine-weighted: E[cos] = 2/3
    assert np.isclose(d[:, 2].mean(), 2.0 / 3.0, atol=0.02)


def test_vndf_half_vectors_upper_hemisphere():
    key = jax.random.PRNGKey(1)
    u = jax.random.uniform(key, (1024, 2))
    v = jnp.broadcast_to(
        jnp.asarray([0.3, -0.2, 0.93], jnp.float32), (1024, 3)
    )
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    ax = jnp.full((1024,), 0.25)
    m = np.asarray(disney.sample_ggx_vndf(v, ax, ax, u[:, 0], u[:, 1]))
    np.testing.assert_allclose(np.linalg.norm(m, axis=-1), 1.0, atol=1e-4)
    assert (m[:, 2] >= 0).all()
    # visible-normal sampling: dot(V, m) >= 0
    assert (np.asarray((v * m).sum(-1)) >= -1e-5).all()


def _sample(base=(0.8, 0.8, 0.8), rough=0.5, metal=0.0, sheen=0.0,
            sheen_tint=0.0, aniso=0.0, in_z=0.8, n=512, seed=3):
    key = jax.random.PRNGKey(seed)
    u = jax.random.uniform(key, (n, 3))
    in_dir = jnp.broadcast_to(
        jnp.asarray([np.sqrt(1 - in_z**2), 0.0, in_z], jnp.float32), (n, 3)
    )
    f = jnp.full
    out, rgb, pdf = disney.sample_disney_brdf(
        jnp.broadcast_to(jnp.asarray(base, jnp.float32), (n, 3)),
        f((n,), rough), f((n,), metal), f((n,), sheen),
        f((n,), sheen_tint), f((n,), aniso * aniso),
        in_dir, u[:, 0], u[:, 1], u[:, 2],
    )
    return map(np.asarray, (out, rgb, pdf))


def test_diffuse_tint_bounded_by_albedo():
    out, rgb, pdf = _sample(rough=1.0, metal=0.0)
    ok = pdf > 0
    tint = rgb[ok] / pdf[ok][:, None]
    assert np.isfinite(tint).all()
    assert (tint >= 0).all()
    # energy sanity: a rough dielectric can't amplify much beyond albedo
    assert tint.mean() < 1.2


def test_smooth_metal_mirrors():
    out, rgb, pdf = _sample(rough=0.001, metal=1.0, in_z=0.7)
    ok = pdf > 0
    # perfect mirror about z: out ~= (-in.x, -in.y, in.z)
    in_dir = np.array([np.sqrt(1 - 0.49), 0.0, 0.7])
    expect = np.array([-in_dir[0], 0.0, in_dir[2]])
    err = np.linalg.norm(out[ok] - expect, axis=-1)
    assert np.median(err) < 0.02
    # metallic tint carries the base color ratio
    tint = rgb[ok] / pdf[ok][:, None]
    assert np.isfinite(tint).all()


def test_below_horizon_terminates():
    # viewing from below the surface -> pdf 0 -> terminate
    out, rgb, pdf = _sample(in_z=-0.5)
    assert (pdf <= 0).all()


def test_sheen_adds_energy_at_grazing():
    _, rgb0, pdf0 = _sample(rough=1.0, sheen=0.0, in_z=0.15, seed=9)
    _, rgb1, pdf1 = _sample(rough=1.0, sheen=1.0, in_z=0.15, seed=9)
    ok = (pdf0 > 0) & (pdf1 > 0)
    assert rgb1[ok].sum() > rgb0[ok].sum()


def test_normal_map_identity_when_absent():
    n = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    t = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
    b = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    tex = jnp.asarray([[0.1, 0.9, 0.8]], jnp.float32)
    out = disney.apply_normal_map(
        n, t, b, tex, jnp.asarray([1.0]), jnp.asarray([False])
    )
    np.testing.assert_allclose(np.asarray(out), [[0, 0, 1]])


def test_normal_map_flat_texture_is_identity():
    # (0.5, 0.5, 1.0) encodes "no perturbation" (with green flip symmetric)
    n = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    t = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
    b = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    tex = jnp.asarray([[0.5, 0.5, 1.0]], jnp.float32)
    out = disney.apply_normal_map(
        n, t, b, tex, jnp.asarray([1.0]), jnp.asarray([True])
    )
    np.testing.assert_allclose(np.asarray(out), [[0, 0, 1]], atol=1e-6)
