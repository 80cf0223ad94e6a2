"""Disney/PBR ubershader — the material stage of the wavefront integrator.

The reference dispatches per-triangle function pointers (Shader.proc,
scene.h:30-35); on TPU there is exactly ONE branchless ubershader evaluated
for every shaded ray, selecting behavior from the material table. Both lobes
of the mixture sampler are computed and the sampled one selected — no
divergence, which is the TPU-native answer to shader divergence.

Semantics follow the reference exactly:
- mixture sampler with weights (1 - metalness, luminance(fresnel)),
  sample_disney_BRDF, driver.c:287-348
- GGX VNDF visible-normal sampling with anisotropic alpha_x =
  lerp(r^2, 1, aniso^2), driver.c:230-250, 288-290
- Disney diffuse (double Schlick with FD90) + luminance-normalized sheen,
  driver.c:166-183, 258-264
- Smith G2 specular with shadowed_f90 Schlick fresnel, driver.c:204-276
- returns rgb*NoL and the lobe-weighted pdf; the caller divides
  (tint = rgb/pdf) and terminates on pdf <= 0, driver.c:400-408
- normal mapping via TBN with strength lerp and green-channel flip,
  normal_map_apply, driver.c:129-153
- albedo/emissive textures are sRGB-decoded and multiplied into factors;
  roughness *= mr.g, metalness *= mr.b; roughness clamped to [0.001, 1];
  the metalness remap min(m, 0.9)/0.9, disney_shader_proc driver.c:350-409
- debug shader renders the (mapped) shading normal, driver.c:411-418
"""

from __future__ import annotations

import jax.numpy as jnp

from raytracing_c_tpu.models.scene import SHADER_DEBUG_NORMAL
from raytracing_c_tpu.ops import texture
from raytracing_c_tpu.utils import color, vecmath as vm

PI = jnp.float32(jnp.pi)


# ---------------------------------------------------------------------------
# BRDF pieces (tangent space, normal = +z)
# ---------------------------------------------------------------------------


def fresnel_schlick_scalar(f0, f90, theta):
    """driver.c:204-206."""
    return f0 + (f90 - f0) * jnp.power(jnp.maximum(1.0 - theta, 0.0), 5.0)


def fresnel_schlick_rgb(f0, f90, theta):
    """driver.c:208-210; f0 (R,3), f90/theta (R,)."""
    p = jnp.power(jnp.maximum(1.0 - theta, 0.0), 5.0)
    return f0 + (f90[..., None] - f0) * p[..., None]


def distribution_ggx(roughness, noh, k):
    """driver.c:212-215: a2 = roughness^2, denom (NoH^2 (a2^2-1) + 1)^k."""
    a2 = roughness * roughness
    return a2 / (PI * jnp.power((noh * noh) * (a2 * a2 - 1.0) + 1.0, k))


def smith_g(ndotv, alpha2):
    """driver.c:217-221."""
    a = alpha2 * alpha2
    b = ndotv * ndotv
    return (2.0 * ndotv) / (ndotv + jnp.sqrt(jnp.maximum(a + b - a * b, 0.0)))


def geometry_term(nol, nov, roughness):
    """driver.c:223-228."""
    a2 = roughness * roughness
    return smith_g(nov, a2) * smith_g(nol, a2)


def shadowed_f90(f0):
    """driver.c:273-276."""
    return jnp.minimum(1.0, (1.0 / 0.04) * color.luminance(f0))


def sheen_tint_color(base_color):
    """disney_calculate_sheen_tint (driver.c:166-169)."""
    lum = (
        base_color[..., 0] * 0.3
        + base_color[..., 1] * 0.6
        + base_color[..., 2] * 1.0
    )
    tint = base_color / jnp.maximum(lum[..., None], 1e-20)
    return jnp.where(lum[..., None] > 0.0, tint, jnp.ones_like(base_color))


def evaluate_sheen(sheen, base_color, sheen_tint, hol):
    """disney_evaluate_sheen (driver.c:176-183)."""
    tint = sheen_tint_color(base_color)
    white = jnp.ones_like(base_color)
    col = vm.lerp(white, tint, sheen_tint[..., None])
    m = jnp.maximum(1.0 - hol, 0.0)
    weight = sheen * (m * m * m * m * m)  # fresnel_schlick_weight
    out = col * weight[..., None]
    return jnp.where(sheen[..., None] > 0.0, out, jnp.zeros_like(out))


def eval_diffuse(base_color, nol, nov, loh, roughness):
    """disney_eval_diffuse (driver.c:258-264)."""
    fd90 = 0.5 + 2.0 * roughness * loh * loh
    a = fresnel_schlick_scalar(1.0, fd90, nol)
    b = fresnel_schlick_scalar(1.0, fd90, nov)
    return base_color * (a * b / PI)[..., None]


def eval_specular(roughness, fresnel, noh, nov, nol):
    """disney_eval_specular (driver.c:266-271)."""
    d = distribution_ggx(roughness, noh, 2.0)
    g = geometry_term(nol, nov, roughness)
    return fresnel * (d * g / (4.0 * nol * nov))[..., None]


def pdf_ggx_vndf(noh, nov, roughness):
    """pdf_GGX_VNDF (driver.c:252-256)."""
    d = distribution_ggx(roughness, noh, 2.0)
    g1 = smith_g(nov, roughness * roughness)
    return (d * g1) / jnp.maximum(1e-5, 4.0 * nov)


def sample_cosine_hemisphere(u1, u2):
    """driver.c:118-127: z-up cosine-weighted direction."""
    angle = u1 * 2.0 * PI
    dist = jnp.sqrt(u2)
    x = jnp.sin(angle) * dist
    y = jnp.cos(angle) * dist
    z = jnp.sqrt(jnp.maximum(1.0 - dist * dist, 0.0))
    return jnp.stack([x, y, z], axis=-1)


def sample_ggx_vndf(v, ax, ay, u1, u2):
    """sample_GGX_VNDF (driver.c:230-250): visible-normal sampling."""
    vh = jnp.stack([ax * v[..., 0], ay * v[..., 1], v[..., 2]], axis=-1)
    vh = vm.normalize(vh)

    lensq = vh[..., 0] ** 2 + vh[..., 1] ** 2
    inv_len = jnp.where(lensq > 0.0, 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-30)), 0.0)
    t1 = jnp.where(
        (lensq > 0.0)[..., None],
        jnp.stack([-vh[..., 1] * inv_len, vh[..., 0] * inv_len,
                   jnp.zeros_like(inv_len)], axis=-1),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], jnp.float32), vh.shape),
    )
    t2 = vm.cross(vh, t1)

    r = jnp.sqrt(u1)
    phi = 2.0 * PI * u2
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[..., 2])
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - p1 * p1, 0.0)) + s * p2

    nh = (
        t1 * p1[..., None]
        + t2 * p2[..., None]
        + vh * jnp.sqrt(jnp.maximum(0.0, 1.0 - p1 * p1 - p2 * p2))[..., None]
    )
    out = jnp.stack(
        [ax * nh[..., 0], ay * nh[..., 1], jnp.maximum(0.0, nh[..., 2])],
        axis=-1,
    )
    return vm.normalize(out)


def sample_disney_brdf(
    base_color, roughness, metalness, sheen, sheen_tint, aniso2,
    in_dir, u_lobe, u1, u2,
):
    """sample_disney_BRDF (driver.c:287-348) in tangent space (normal = +z).

    in_dir points AWAY from the surface toward the viewer. Returns
    (out_dir, rgb, pdf) where rgb already includes NoL and pdf includes the
    lobe selection weight; pdf <= 0 means terminate.
    """
    alpha_x = vm.lerp(roughness * roughness, jnp.ones_like(roughness), aniso2)
    alpha_y = roughness * roughness
    micro_n = sample_ggx_vndf(in_dir, alpha_x, alpha_y, u1, u2)

    f0 = vm.lerp(jnp.full_like(base_color, 0.04), base_color, metalness[..., None])
    fresnel = fresnel_schlick_rgb(
        f0, shadowed_f90(f0), vm.dot(in_dir, micro_n)
    )

    dw = 1.0 - metalness
    sw = color.luminance(fresnel)
    inv_w = 1.0 / jnp.maximum(dw + sw, 1e-20)
    dw = dw * inv_w
    sw = sw * inv_w

    pick_diffuse = u_lobe < dw
    nov = in_dir[..., 2]

    # --- diffuse lobe (cosine hemisphere) -------------------------------
    out_d = sample_cosine_hemisphere(u1, u2)
    half_d = vm.normalize(out_d + in_dir)
    nol_d = out_d[..., 2]
    ok_d = (nol_d > 0.0) & (nov > 0.0)
    loh = vm.dot(out_d, half_d)
    pdf_d = nol_d / PI
    diff = eval_diffuse(base_color, nol_d, nov, loh, roughness) * (
        1.0 - fresnel
    ) + evaluate_sheen(sheen, base_color, sheen_tint, loh)
    rgb_d = diff * nol_d[..., None]
    a_d = dw * pdf_d
    rgb_d = jnp.where(ok_d[..., None], rgb_d, 0.0)
    a_d = jnp.where(ok_d, a_d, 0.0)

    # --- specular lobe (VNDF reflection) --------------------------------
    out_s = vm.reflect(-in_dir, micro_n)
    nol_s = out_s[..., 2]
    ok_s = (nol_s > 0.0) & (nov > 0.0)
    nol_sc = jnp.maximum(nol_s, 0.001)
    nov_sc = jnp.maximum(nov, 0.001)
    noh = jnp.minimum(micro_n[..., 2], 0.99)
    pdf_s = pdf_ggx_vndf(noh, nov_sc, roughness)
    spec = eval_specular(roughness, fresnel, noh, nov_sc, nol_sc)
    rgb_s = spec * nol_sc[..., None]
    a_s = sw * pdf_s
    rgb_s = jnp.where(ok_s[..., None], rgb_s, 0.0)
    a_s = jnp.where(ok_s, a_s, 0.0)

    # --- select ----------------------------------------------------------
    out_dir = vm.normalize(jnp.where(pick_diffuse[..., None], out_d, out_s))
    rgb = jnp.where(pick_diffuse[..., None], rgb_d, rgb_s)
    pdf = jnp.where(pick_diffuse, a_d, a_s)
    return out_dir, rgb, pdf


# ---------------------------------------------------------------------------
# Ubershader (world space, full material stage)
# ---------------------------------------------------------------------------


def apply_normal_map(normal, tangent, bitangent, tex_rgb, strength, has_map):
    """normal_map_apply (driver.c:129-153): TBN transform with green flip and
    strength lerp toward the interpolated normal."""
    v = tex_rgb * 2.0 - 1.0
    v = v.at[..., 1].multiply(-1.0)  # v.g *= -1
    s = strength[..., None]
    mapped = (
        v[..., 0:1] * tangent + v[..., 1:2] * bitangent + v[..., 2:3] * normal
    )
    n = vm.normalize(mapped * s + normal * (1.0 - s))
    return jnp.where(has_map[..., None], n, normal)


def shade(scene, direction, normal, normal_geo, tangent, bitangent, uv,
          mat_id, rand4, texture_mode: str = "bilinear"):
    """The full material stage for a batch of shaded rays.

    direction: (R,3) incoming ray direction (toward the surface).
    normal: (R,3) normalized interpolated shading normal.
    rand4: (R,4) uniforms (lobe select, u1, u2, spare).
    Returns dict(direction, tint, emission, terminate) mirroring
    Shader_Output (scene.h:24-28).
    """
    mats = scene.materials
    mid = jnp.maximum(mat_id, 0)

    base_color = mats.base_color[mid]
    emission = mats.emission[mid]
    rough = mats.roughness[mid]
    metal = mats.metalness[mid]
    nstr = mats.normal_strength[mid]
    sheen = mats.sheen[mid]
    sheen_tint = mats.sheen_tint[mid]
    aniso = mats.anisotropic[mid]
    t_alb = mats.tex_albedo[mid]
    t_nrm = mats.tex_normal[mid]
    t_mr = mats.tex_mr[mid]
    t_emi = mats.tex_emission[mid]
    kind = mats.shader_kind[mid]

    # normal mapping
    nrm_tex = texture.sample(scene.atlas, t_nrm, uv, texture_mode)
    n = apply_normal_map(normal, tangent, bitangent, nrm_tex, nstr, t_nrm >= 0)

    # albedo / metal-roughness / emissive textures (driver.c:354-379)
    alb_tex = texture.sample(scene.atlas, t_alb, uv, texture_mode)
    base_color = jnp.where(
        (t_alb >= 0)[..., None],
        base_color * color.srgb_to_linear(alb_tex),
        base_color,
    )
    mr_tex = texture.sample(scene.atlas, t_mr, uv, texture_mode)
    has_mr = t_mr >= 0
    rough = jnp.where(has_mr, rough * mr_tex[..., 1], rough)
    metal = jnp.where(has_mr, metal * mr_tex[..., 2], metal)

    rough = jnp.clip(rough, 0.001, 1.0)
    # metalness remap (driver.c:370-373)
    metal = jnp.minimum(metal, 0.9) / 0.9

    emi_tex = texture.sample(scene.atlas, t_emi, uv, texture_mode)
    emission = jnp.where(
        (t_emi >= 0)[..., None],
        emission * color.srgb_to_linear(emi_tex),
        emission,
    )

    # view-aligned tangent basis + world<->tangent (driver.c:381-395)
    t_basis, b_basis = vm.basis(direction, n)
    neg_dir = -direction
    in_dir = jnp.stack(
        [vm.dot(neg_dir, t_basis), vm.dot(neg_dir, b_basis), vm.dot(neg_dir, n)],
        axis=-1,
    )

    out_t, rgb, pdf = sample_disney_brdf(
        base_color, rough, metal, sheen, sheen_tint, aniso * aniso,
        in_dir, rand4[..., 0], rand4[..., 1], rand4[..., 2],
    )
    out_world = (
        out_t[..., 0:1] * t_basis + out_t[..., 1:2] * b_basis + out_t[..., 2:3] * n
    )

    ok = pdf > 0.0
    tint = jnp.where(ok[..., None], rgb / jnp.where(ok, pdf, 1.0)[..., None], 0.0)
    terminate = ~ok

    # debug shader: emit the shading normal and stop (driver.c:411-418)
    is_debug = kind == SHADER_DEBUG_NORMAL
    emission = jnp.where(is_debug[..., None], n * 0.5 + 0.5, emission)
    terminate = jnp.where(is_debug, True, terminate)

    return {
        "direction": out_world,
        "tint": tint,
        "emission": emission,
        "terminate": terminate,
        "normal": n,
    }
