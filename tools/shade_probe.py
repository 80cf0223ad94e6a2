"""Fine-grained shade cost census on chip (serialized-in-jit, 256k rays).

Splits disney.shade into: material one-hot fetch, texture taps (1 bilinear,
1 nearest, 4 bilinear), lane-extract-only, BRDF sampling alone, basis +
world<->tangent transforms, full shade, shade minus textures. Also probes
transcendental lowering cost (pow(x,5) vs x*x*x*x*x, srgb pow 2.2).
"""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from raytracing_c_tpu.io.loader import load_scene
from raytracing_c_tpu.ops import disney, texture, onehot, traverse
from raytracing_c_tpu.render import camera as cam
from raytracing_c_tpu.render.integrator import _gather_hit_geometry
from raytracing_c_tpu.utils.vec3 import Vec3

ITERS = 16
R = 256 * 1024

print("backend:", jax.default_backend(), flush=True)
scene = load_scene(
    "/root/reference/models/helmet.glb", background_path=None,
    warn=lambda *a: None,
)

ids = np.arange(R, dtype=np.int64)
w = 1024
px = jnp.asarray((ids % w).astype(np.int32))
py = jnp.asarray(((ids // w) % w).astype(np.int32))
rng = np.random.default_rng(0)
jx = jnp.asarray(rng.random(R, np.float32))
jy = jnp.asarray(rng.random(R, np.float32))
o_cam, d_cam = cam.generate_rays(scene.camera, w, w, px, py, jx, jy)
rand4 = jnp.asarray(rng.random((4, R), np.float32))

hit0 = jax.jit(
    lambda o, d: traverse.intersect_scene(scene, o, d, method="pallas")
)(o_cam, d_cam)
geom0 = jax.jit(
    lambda o, d, h: _gather_hit_geometry(scene, o, d, h, method="pallas")
)(o_cam, d_cam, hit0)
geom0 = jax.tree.map(jax.block_until_ready, geom0)
nrm0 = jax.jit(lambda g: g["normal"].normalized())(geom0)
nrm0 = jax.block_until_ready(nrm0.x), nrm0


def timed(name, fn, carry):
    def loop(c):
        return jax.lax.fori_loop(0, ITERS, lambda i, cc: fn(cc), c)

    f = jax.jit(loop)
    jax.block_until_ready(f(carry))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(f(carry))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{name}: {best*1e3:7.3f} ms/256k", flush=True)
    return best


mid0 = geom0["mat_id"]
uvu0, uvv0 = geom0["uv_u"], geom0["uv_v"]
n_unit = nrm0[1]

rows_t = jnp.transpose(scene.materials.rows)


def f_mat(u):
    m = onehot.fetch_rows_exact(rows_t, jnp.maximum(mid0, 0))
    return u + 0.0 * m[0]


def f_tap1_bilinear(u):
    c = texture.sample(scene.atlas, jnp.maximum(mid0 * 0, 0), u, uvv0)
    return u + 0.0 * c.x


def f_tap1_nearest(u):
    c = texture.sample(scene.atlas, jnp.maximum(mid0 * 0, 0), u, uvv0,
                       "nearest")
    return u + 0.0 * c.x


def f_tap4(u):
    acc = u * 0.0
    for t in range(4):
        c = texture.sample(scene.atlas, jnp.full_like(mid0, t % 2), u, uvv0)
        acc = acc + c.x
    return u + 0.0 * acc


def f_brdf(u):
    in_dir = Vec3(u, jnp.abs(uvv0) + 0.1, jnp.abs(uvu0) + 0.2).normalized()
    base = Vec3(u, u, u)
    out_t, rgb, pdf = disney.sample_disney_brdf(
        base, jnp.abs(u) * 0.5 + 0.01, u * 0.5, u * 0.1, u * 0.2, u * 0.0,
        in_dir, rand4[0], rand4[1], rand4[2],
    )
    return u + 0.0 * (rgb.x + pdf + out_t.x)


def f_basis(u):
    n = Vec3(u, n_unit.y, n_unit.z).normalized()
    t_b, b_b = disney.basis(d_cam, n)
    neg = -d_cam
    in_dir = Vec3(neg.dot(t_b), neg.dot(b_b), neg.dot(n))
    return u + 0.0 * in_dir.x


def f_shade(u):
    out = disney.shade(
        scene, d_cam, Vec3(u, n_unit.y, n_unit.z).normalized(), geom0["ng"],
        geom0["tangent"], geom0["bitangent"], u, uvv0, mid0, rand4,
    )
    return u + 0.0 * out["tint"].x


from raytracing_c_tpu.models.scene import MROW_TEX_ALBEDO  # noqa: E402

scene_notex = scene.replace(
    atlas=type(scene.atlas).empty(),
    materials=scene.materials.replace(
        rows=scene.materials.rows.at[
            :, MROW_TEX_ALBEDO : MROW_TEX_ALBEDO + 4
        ].set(-1.0)
    ),
)


def f_shade_notex(u):
    out = disney.shade(
        scene_notex, d_cam, Vec3(u, n_unit.y, n_unit.z).normalized(),
        geom0["ng"], geom0["tangent"], geom0["bitangent"], u, uvv0, mid0,
        rand4,
    )
    return u + 0.0 * out["tint"].x


def f_pow5(u):
    acc = u
    for _ in range(4):
        acc = jnp.power(jnp.abs(acc) + 0.1, 5.0) * 1e-3
    return acc


def f_mul5(u):
    acc = u
    for _ in range(4):
        x = jnp.abs(acc) + 0.1
        x2 = x * x
        acc = x2 * x2 * x * 1e-3
    return acc


def f_srgb(u):
    from raytracing_c_tpu.utils import color
    acc = u
    for _ in range(2):
        acc = color.srgb_to_linear(jnp.abs(acc) * 0.5 + 0.1)
    return acc


def f_sincos(u):
    acc = u
    for _ in range(2):
        acc = jnp.sin(acc) * 0.5 + jnp.cos(acc) * 0.25
    return acc


carry = jnp.abs(uvu0) + 0.05
timed("mat_fetch   ", f_mat, carry)
timed("tap1_bilin  ", f_tap1_bilinear, carry)
timed("tap1_nearest", f_tap1_nearest, carry)
timed("tap4_bilin  ", f_tap4, carry)
timed("brdf_sample ", f_brdf, carry)
timed("basis+xform ", f_basis, carry)
timed("shade_full  ", f_shade, carry)
timed("shade_notex ", f_shade_notex, carry)
timed("pow5_x4     ", f_pow5, carry)
timed("mul5_x4     ", f_mul5, carry)
timed("srgb_x2     ", f_srgb, carry)
timed("sincos_x2   ", f_sincos, carry)
