"""Wavefront path integrator.

The reference's per-pixel recursive bounce loop (cast_ray, raytracer.c:505-558)
re-designed as a bounce-synchronous batched loop over a flat ray arena: every
bounce intersects, shades, and advances ALL rays at once with masks — the
TPU-native shape of the algorithm (SURVEY §7).

Semantics preserved exactly:
- throughput ("accumulated_tint") x per-bounce shader tint; accumulated
  emission; shader-driven terminate (raytracer.c:506-544)
- hits whose geometric OR shading normal faces along the ray are skipped by
  re-casting from an epsilon-advanced origin — and this consumes a bounce
  (raytracer.c:516-521)
- next origin biased +/-epsilon along the geometric normal depending on which
  side the sampled direction leaves (the normal-mapping leak guard,
  raytracer.c:546-552)
- miss returns background * throughput + emission and stops
  (raytracer.c:553-555); rays that exhaust max_bounces return emission only
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from raytracing_c_tpu import EPSILON
from raytracing_c_tpu.ops import background as bg_ops
from raytracing_c_tpu.ops import disney, traverse
from raytracing_c_tpu.utils import vecmath as vm


def _gather_hit_geometry(scene, origin, direction, hit):
    """Deferred attribute interpolation: gather per-hit vertex data by the
    winning triangle index (the SIMD kernel interpolated inline,
    raytracer.c:159-183; we defer it to one dense stage per bounce)."""
    tris = scene.triangles
    tri = jnp.maximum(hit["tri"], 0)
    u = hit["u"][..., None]
    v = hit["v"][..., None]
    w = 1.0 - u - v

    normal = tris.n0[tri] * w + tris.n1[tri] * u + tris.n2[tri] * v
    uv = tris.uv0[tri] * w + tris.uv1[tri] * u + tris.uv2[tri] * v
    ng = tris.ng[tri]
    tangent = tris.tangent[tri]
    bitangent = tris.bitangent[tri]
    mat_id = tris.mat_id[tri]

    point = origin + direction * hit["t"][..., None]

    if scene.spheres.count > 0:
        sph = jnp.maximum(hit["sph"], 0)
        is_sph = hit["sph"] >= 0
        center = scene.spheres.center[sph]
        radius = scene.spheres.radius[sph]
        n_sph = (point - center) / radius[..., None]
        t_sph, b_sph = vm.basis(direction, n_sph)
        normal = jnp.where(is_sph[..., None], n_sph, normal)
        ng = jnp.where(is_sph[..., None], n_sph, ng)
        tangent = jnp.where(is_sph[..., None], t_sph, tangent)
        bitangent = jnp.where(is_sph[..., None], b_sph, bitangent)
        uv = jnp.where(is_sph[..., None], 0.0, uv)
        mat_id = jnp.where(is_sph, scene.spheres.mat_id[sph], mat_id)

    return {
        "point": point,
        "normal": normal,  # unnormalized interpolated normal
        "ng": ng,
        "tangent": tangent,
        "bitangent": bitangent,
        "uv": uv,
        "mat_id": mat_id,
    }


def trace(scene, origin, direction, uniforms, max_bounces: int,
          method: str = "topk", texture_mode: str = "bilinear"):
    """Trace a batch of rays to completion.

    origin/direction: (R, 3); uniforms: (R, max_bounces, 4) pre-drawn
    threefry uniforms (lobe select, u1, u2, spare) — the stateless
    counter-based replacement for the reference's thread-local PCG stream
    (common.h:13-28, SURVEY §2.1).

    Returns (radiance (R, 3), rays_traced scalar i64-ish f32) where
    rays_traced counts every scene intersection executed, including backface
    re-casts — the Mrays/s numerator (BASELINE.md measurement note).
    """
    r = origin.shape[0]

    state = {
        "origin": origin,
        "direction": direction,
        "throughput": jnp.ones((r, 3), jnp.float32),
        "radiance": jnp.zeros((r, 3), jnp.float32),
        "active": jnp.ones((r,), bool),
        "rays": jnp.float32(0.0),
    }

    def bounce(i, st):
        active = st["active"]
        o, d = st["origin"], st["direction"]

        hit = traverse.intersect_scene(scene, o, d, active, method=method)
        rays = st["rays"] + jnp.sum(active).astype(jnp.float32)

        is_hit = active & jnp.isfinite(hit["t"])
        geom = _gather_hit_geometry(scene, o, d, hit)

        # backface skip: geometric OR shading normal along the ray
        # (raytracer.c:516-521)
        backface = is_hit & (
            (vm.dot(geom["ng"], d) > 0.0) | (vm.dot(geom["normal"], d) > 0.0)
        )
        shaded = is_hit & ~backface

        n_unit = vm.normalize(geom["normal"])
        out = disney.shade(
            scene, d, n_unit, geom["ng"], geom["tangent"], geom["bitangent"],
            geom["uv"], geom["mat_id"], uniforms[:, i, :], texture_mode,
        )

        radiance = st["radiance"] + jnp.where(
            shaded[..., None], st["throughput"] * out["emission"], 0.0
        )

        # miss: background * throughput (raytracer.c:553-555)
        miss = active & ~is_hit
        bg = bg_ops.eval_background(scene, d)
        radiance = radiance + jnp.where(
            miss[..., None], st["throughput"] * bg, 0.0
        )

        terminate = shaded & out["terminate"]
        cont = shaded & ~out["terminate"]

        throughput = jnp.where(
            cont[..., None], st["throughput"] * out["tint"], st["throughput"]
        )

        # next ray origin: epsilon rules (raytracer.c:520, 551-552)
        bias = jnp.where(
            vm.dot(geom["ng"], out["direction"]) < 0.0, -EPSILON, EPSILON
        )
        origin_shaded = geom["point"] + geom["ng"] * bias[..., None]
        origin_back = geom["point"] + d * EPSILON
        new_origin = jnp.where(
            backface[..., None],
            origin_back,
            jnp.where(cont[..., None], origin_shaded, o),
        )
        new_dir = jnp.where(cont[..., None], out["direction"], d)

        return {
            "origin": new_origin,
            "direction": new_dir,
            "throughput": throughput,
            "radiance": radiance,
            "active": (cont | backface),
            "rays": rays,
        }

    st = jax.lax.fori_loop(0, max_bounces, bounce, state)
    return st["radiance"], st["rays"]
