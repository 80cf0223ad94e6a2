"""Wavefront path integrator (component-plane state).

The reference's per-pixel recursive bounce loop (cast_ray, raytracer.c:505-558)
re-designed as a bounce-synchronous batched loop over a flat ray arena: every
bounce intersects, shades, and advances ALL rays at once with masks — the
TPU-native shape of the algorithm (SURVEY §7). All per-ray vectors are Vec3
component planes, so state arrays stay batch-minor.

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
from raytracing_c_tpu.utils.vec3 import Vec3


def _gather_hit_geometry(scene, origin: Vec3, direction: Vec3, hit):
    """Deferred attribute interpolation: gather per-hit vertex data by the
    winning triangle index (the SIMD kernel interpolated inline,
    raytracer.c:159-183; we defer it to one dense stage per bounce).

    ONE 512-byte attribute-row gather per ray (models/scene.py ATTR_*
    layout) instead of ~25 per-lane gathers — the TPU row-gather fast path.
    """
    from raytracing_c_tpu.models.scene import (
        ATTR_BTN, ATTR_MAT, ATTR_N0, ATTR_N1, ATTR_N2, ATTR_NG, ATTR_TAN,
        ATTR_UV,
    )

    tris = scene.triangles
    tri = jnp.maximum(hit["tri"], 0)
    u = hit["u"]
    v = hit["v"]
    w = 1.0 - u - v

    a = jnp.transpose(tris.attr_rows[tri])  # (128, R), batch-minor

    def vec(c):
        return Vec3(a[c], a[c + 1], a[c + 2])

    n0, n1, n2 = vec(ATTR_N0), vec(ATTR_N1), vec(ATTR_N2)
    normal = n0 * w + n1 * u + n2 * v
    uv_u = a[ATTR_UV] * w + a[ATTR_UV + 2] * u + a[ATTR_UV + 4] * v
    uv_v = a[ATTR_UV + 1] * w + a[ATTR_UV + 3] * u + a[ATTR_UV + 5] * v
    ng = vec(ATTR_NG)
    tangent = vec(ATTR_TAN)
    bitangent = vec(ATTR_BTN)
    mat_id = a[ATTR_MAT].astype(jnp.int32)

    point = origin + direction * hit["t"]

    if scene.spheres.count > 0:
        sph = jnp.maximum(hit["sph"], 0)
        is_sph = hit["sph"] >= 0
        center = scene.spheres.center.gather(sph)
        radius = scene.spheres.radius[sph]
        n_sph = (point - center) * (1.0 / radius)
        t_sph, b_sph = disney.basis(direction, n_sph)
        normal = Vec3.where(is_sph, n_sph, normal)
        ng = Vec3.where(is_sph, n_sph, ng)
        tangent = Vec3.where(is_sph, t_sph, tangent)
        bitangent = Vec3.where(is_sph, b_sph, bitangent)
        uv_u = jnp.where(is_sph, 0.0, uv_u)
        uv_v = jnp.where(is_sph, 0.0, uv_v)
        mat_id = jnp.where(is_sph, scene.spheres.mat_id[sph], mat_id)

    return {
        "point": point,
        "normal": normal,  # unnormalized interpolated normal
        "ng": ng,
        "tangent": tangent,
        "bitangent": bitangent,
        "uv_u": uv_u,
        "uv_v": uv_v,
        "mat_id": mat_id,
    }


def bounce_step(scene, st, rand4, method: str = "topk",
                texture_mode: str = "bilinear"):
    """ONE wavefront bounce over a state dict of per-ray planes.

    st: dict(origin, direction, throughput, radiance: Vec3; active: bool;
    rays: f32 scalar). rand4: (4, R) uniforms for the material stage.
    Shared by the fused trace() loop below and the compacting pool renderer
    (render/pool.py) — both paths get identical per-bounce semantics.
    """
    active = st["active"]
    o, d = st["origin"], st["direction"]
    r = o.shape[0]

    hit = traverse.intersect_scene(scene, o, d, active, method=method)
    rays = st["rays"] + jnp.sum(active).astype(jnp.float32)

    is_hit = active & jnp.isfinite(hit["t"])
    geom = _gather_hit_geometry(scene, o, d, hit)

    # backface skip: geometric OR shading normal along the ray
    # (raytracer.c:516-521)
    backface = is_hit & (
        (geom["ng"].dot(d) > 0.0) | (geom["normal"].dot(d) > 0.0)
    )
    shaded = is_hit & ~backface

    n_unit = geom["normal"].normalized()
    out = disney.shade(
        scene, d, n_unit, geom["ng"], geom["tangent"], geom["bitangent"],
        geom["uv_u"], geom["uv_v"], geom["mat_id"], rand4, texture_mode,
    )

    zero = Vec3.zeros((r,))
    radiance = st["radiance"] + Vec3.where(
        shaded, st["throughput"] * out["emission"], zero
    )

    # miss: background * throughput (raytracer.c:553-555)
    miss = active & ~is_hit
    bg = bg_ops.eval_background(scene, d)
    radiance = radiance + Vec3.where(miss, st["throughput"] * bg, zero)

    # terminated rays keep their accumulated emission and go inactive
    cont = shaded & ~out["terminate"]

    throughput = Vec3.where(
        cont, st["throughput"] * out["tint"], st["throughput"]
    )

    # next ray origin: epsilon rules (raytracer.c:520, 551-552)
    bias = jnp.where(
        geom["ng"].dot(out["direction"]) < 0.0, -EPSILON, EPSILON
    )
    origin_shaded = geom["point"] + geom["ng"] * bias
    origin_back = geom["point"] + d * EPSILON
    new_origin = Vec3.where(
        backface, origin_back, Vec3.where(cont, origin_shaded, o)
    )
    new_dir = Vec3.where(cont, out["direction"], d)

    return {
        "origin": new_origin,
        "direction": new_dir,
        "throughput": throughput,
        "radiance": radiance,
        "active": (cont | backface),
        "rays": rays,
    }


def trace(scene, origin: Vec3, direction: Vec3, uniforms, max_bounces: int,
          method: str = "topk", texture_mode: str = "bilinear"):
    """Trace a batch of rays to completion.

    origin/direction: Vec3 of (R,); uniforms: (max_bounces, 4, R) pre-drawn
    threefry uniforms (lobe select, u1, u2, spare) — the stateless
    counter-based replacement for the reference's thread-local PCG stream
    (common.h:13-28, SURVEY §2.1).

    Returns (radiance Vec3 of (R,), rays_traced scalar) where rays_traced
    counts every scene intersection executed, including backface re-casts —
    the Mrays/s numerator (BASELINE.md measurement note).
    """
    r = origin.shape[0]

    state = {
        "origin": origin,
        "direction": direction,
        "throughput": Vec3.full((r,), 1.0),
        "radiance": Vec3.zeros((r,)),
        "active": jnp.ones((r,), bool),
        "rays": jnp.float32(0.0),
    }

    def bounce(i, st):
        return bounce_step(scene, st, uniforms[i], method, texture_mode)

    # while-loop over bounces: a batch whose rays have ALL terminated (e.g.
    # a sky-only tile, or every path absorbed) stops early instead of
    # paying the full bounce budget — the wavefront analog of the
    # reference's per-pixel loop break (raytracer.c:539-556)
    def cond(iv):
        i, st = iv
        return jnp.logical_and(i < max_bounces, jnp.any(st["active"]))

    def body(iv):
        i, st = iv
        return i + 1, bounce(i, st)

    _, st = jax.lax.while_loop(cond, body, (jnp.int32(0), state))
    return st["radiance"], st["rays"]
