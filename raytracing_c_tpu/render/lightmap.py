"""Lightmap baking.

Capability parity with lightmap_bake (raytracer.c:722-784): for every
triangle, rasterize its UV-space bounding box with a barycentric inside test,
reconstruct world position + normal per texel, shoot cosine-weighted
hemisphere rays through the full path integrator, and write mean irradiance
to the texel.

TPU-native split: texel generation (rasterization) is host-side numpy; the
per-texel hemisphere integration is one giant batched trace on device —
texels x samples rays in a single arena instead of the reference's
triple-nested scalar loop.

Deviations (documented): the reference rejection-samples uniform sphere
directions until cos > 0 (raytracer.c:765-773); we draw Gaussian directions
and reflect the below-horizon half — the same uniform-hemisphere
distribution, stateless. The reference also stores raw float irradiance into
u8 pixels (truncating); we keep an f32 lightmap and let callers encode.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from raytracing_c_tpu import EPSILON
from raytracing_c_tpu.render import integrator
from raytracing_c_tpu.utils.vec3 import Vec3


def _rasterize_host(scene, width: int, height: int):
    """UV-space rasterization of every triangle -> texel records.

    Returns (texel_idx (T,), position (T,3), normal (T,3)) numpy arrays.
    Mirrors the bbox + barycentric inside-test of raytracer.c:727-757.
    """
    tris = scene.triangles
    n = scene.n_triangles

    def planes(v):
        return np.stack(
            [np.asarray(v.x)[:n], np.asarray(v.y)[:n], np.asarray(v.z)[:n]],
            axis=-1,
        )

    uv0 = np.stack(
        [np.asarray(tris.uv0u)[:n], np.asarray(tris.uv0v)[:n]], axis=-1
    ) * [width, height]
    uv1 = np.stack(
        [np.asarray(tris.uv1u)[:n], np.asarray(tris.uv1v)[:n]], axis=-1
    ) * [width, height]
    uv2 = np.stack(
        [np.asarray(tris.uv2u)[:n], np.asarray(tris.uv2v)[:n]], axis=-1
    ) * [width, height]
    v0 = planes(tris.v0)
    v1 = v0 + planes(tris.e1)
    v2 = v0 + planes(tris.e2)
    n0 = planes(tris.n0)
    n1 = planes(tris.n1)
    n2 = planes(tris.n2)

    out_idx, out_pos, out_nrm = [], [], []
    denom = (uv1[:, 1] - uv2[:, 1]) * (uv0[:, 0] - uv2[:, 0]) + (
        uv2[:, 0] - uv1[:, 0]
    ) * (uv0[:, 1] - uv2[:, 1])

    for i in range(n):
        if abs(denom[i]) < 1e-20:
            continue
        min_x = int(min(uv0[i, 0], uv1[i, 0], uv2[i, 0]))
        max_x = int(max(uv0[i, 0], uv1[i, 0], uv2[i, 0]))
        min_y = int(min(uv0[i, 1], uv1[i, 1], uv2[i, 1]))
        max_y = int(max(uv0[i, 1], uv1[i, 1], uv2[i, 1]))
        min_x = max(min_x, 0)
        min_y = max(min_y, 0)
        max_x = min(max_x, width - 1)
        max_y = min(max_y, height - 1)
        if max_x < min_x or max_y < min_y:
            continue

        gx, gy = np.meshgrid(
            np.arange(min_x, max_x + 1), np.arange(min_y, max_y + 1)
        )
        px = gx.ravel().astype(np.float64)
        py = gy.ravel().astype(np.float64)

        w0 = (
            (uv1[i, 1] - uv2[i, 1]) * (px - uv2[i, 0])
            + (uv2[i, 0] - uv1[i, 0]) * (py - uv2[i, 1])
        ) / denom[i]
        w1 = (
            (uv2[i, 1] - uv0[i, 1]) * (px - uv2[i, 0])
            + (uv0[i, 0] - uv2[i, 0]) * (py - uv2[i, 1])
        ) / denom[i]
        w2 = 1.0 - w0 - w1
        inside = (w0 >= -EPSILON) & (w1 >= -EPSILON) & (w2 >= -EPSILON)
        if not inside.any():
            continue

        w0, w1, w2 = w0[inside], w1[inside], w2[inside]
        pos = (
            v0[i] * w0[:, None] + v1[i] * w1[:, None] + v2[i] * w2[:, None]
        )
        nrm = (
            n0[i] * w0[:, None] + n1[i] * w1[:, None] + n2[i] * w2[:, None]
        )
        out_idx.append(
            (gx.ravel()[inside] + gy.ravel()[inside] * width).astype(np.int64)
        )
        out_pos.append(pos.astype(np.float32))
        out_nrm.append(nrm.astype(np.float32))

    if not out_idx:
        return (
            np.zeros(0, np.int64),
            np.zeros((0, 3), np.float32),
            np.zeros((0, 3), np.float32),
        )
    return (
        np.concatenate(out_idx),
        np.concatenate(out_pos),
        np.concatenate(out_nrm),
    )


def bake_lightmap(
    scene,
    width: int,
    height: int,
    samples: int = 16,
    max_bounces: int = 8,
    seed: int = 0,
    batch_texels: int = 16384,
    method: str = "auto",
):
    """Bake an f32 (H, W, 3) irradiance lightmap."""
    if method == "auto":
        method = "topk" if scene.triangles.capacity > 64 else "brute"

    idx, pos, nrm = _rasterize_host(scene, width, height)
    lightmap = np.zeros((height * width, 3), np.float32)
    key = jax.random.PRNGKey(seed)

    for lo in range(0, len(idx), batch_texels):
        hi = min(lo + batch_texels, len(idx))
        t = hi - lo
        k = jax.random.fold_in(key, lo)
        k_dir, k_mat = jax.random.split(k)

        p = pos[lo:hi]
        nn = nrm[lo:hi]
        nn = nn / np.maximum(np.linalg.norm(nn, axis=-1, keepdims=True), 1e-30)

        # uniform hemisphere about the normal, cosine-weighted estimator;
        # all device arrays batch-minor: (3, t*samples)
        g = jax.random.normal(k_dir, (3, t * samples), jnp.float32)
        d = Vec3(g[0], g[1], g[2]).normalized()
        nrm_v = Vec3(
            jnp.asarray(np.repeat(nn[:, 0], samples)),
            jnp.asarray(np.repeat(nn[:, 1], samples)),
            jnp.asarray(np.repeat(nn[:, 2], samples)),
        )
        cos = d.dot(nrm_v)
        d = Vec3.where(cos < 0, -d, d)
        cos = jnp.abs(cos)

        start = p + nn * EPSILON
        origins = Vec3(
            jnp.asarray(np.repeat(start[:, 0], samples)),
            jnp.asarray(np.repeat(start[:, 1], samples)),
            jnp.asarray(np.repeat(start[:, 2], samples)),
        )
        uni = jax.random.uniform(
            k_mat, (max_bounces, 4, t * samples), jnp.float32
        )
        radiance, _ = integrator.trace(
            scene, origins, d, uni, max_bounces, method=method
        )
        rad = radiance * cos
        out = np.stack(
            [
                np.asarray(rad.x).reshape(t, samples).mean(axis=1),
                np.asarray(rad.y).reshape(t, samples).mean(axis=1),
                np.asarray(rad.z).reshape(t, samples).mean(axis=1),
            ],
            axis=-1,
        )
        lightmap[idx[lo:hi]] = out

    return lightmap.reshape(height, width, 3)
