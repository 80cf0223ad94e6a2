"""Fused Pallas traversal vs the exact oracles (CPU interpret mode).

Exactness contract (ops/traverse_pallas.py docstring): the verified Pallas
path must agree with the brute-force oracle on every ray UP TO the f32
conditioning of the Moller-Trumbore formula itself — on near-grazing hits
(|det| ~1e-6 relative) two schedulings of the same f32 math legitimately
differ by ~0.1%, so a tiny fraction of rays may deviate within a loose
relative tolerance while agreeing on the hit. Anything outside that class
(true misses, wrong-by-more-than-conditioning distances) is a failure.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from raytracing_c_tpu.ops import intersect, traverse
from raytracing_c_tpu.ops import traverse_pallas as tp

from helpers import random_mesh, random_rays, simple_scene, vec3_of

TIGHT = dict(rtol=1e-5, atol=1e-6)
# the grazing-hit conditioning class: same hit, f32 noise amplified by 1/det
LOOSE = dict(rtol=1e-2, atol=1e-4)


def _finite(a):
    return np.where(np.isfinite(a), a, 1e30)


def _assert_exact_up_to_conditioning(got_t, want_t, min_tight=0.995):
    got, want = _finite(np.asarray(got_t)), _finite(np.asarray(want_t))
    tight = np.isclose(got, want, **TIGHT)
    assert tight.mean() >= min_tight, f"only {tight.mean():.4f} tight matches"
    loose = np.isclose(got, want, **LOOSE)
    bad = ~tight & ~loose
    assert not bad.any(), (
        f"{bad.sum()} rays beyond conditioning tolerance: "
        f"got {got[bad][:5]} want {want[bad][:5]}"
    )


@pytest.mark.parametrize("n", [40, 900, 5000])
def test_pallas_verified_exact(n, rng):
    """Tiered pallas-verified path vs the brute-force oracle."""
    mesh = random_mesh(n, rng)
    scene = simple_scene(mesh)
    origin, direction = random_rays(512, rng)
    o, d = vec3_of(origin), vec3_of(direction)

    brute = intersect.intersect_bruteforce(o, d, scene.triangles)
    ver = traverse.intersect_bvh_pallas_verified(
        o, d, scene.triangles, scene.bvh
    )
    _assert_exact_up_to_conditioning(ver["t"], brute["t"])


def test_pallas_certificate_sound(rng):
    """Unverified single pass: every wrong ray must carry the suspect
    certificate (dropped_min < t) — modulo the FP-conditioning class."""
    mesh = random_mesh(3000, rng)
    scene = simple_scene(mesh)
    origin, direction = random_rays(512, rng)
    o, d = vec3_of(origin), vec3_of(direction)

    brute = intersect.intersect_bruteforce(o, d, scene.triangles)
    pal = tp.intersect_bvh_pallas(o, d, scene.triangles, scene.bvh, kp=2)

    got, want = _finite(np.asarray(pal["t"])), _finite(np.asarray(brute["t"]))
    tight = np.isclose(got, want, **TIGHT)
    loose = np.isclose(got, want, **LOOSE)
    suspect = np.asarray(pal["dropped_min"]) < np.asarray(pal["t"])
    unexplained = ~tight & ~suspect & ~loose
    assert not unexplained.any()


def test_pallas_wide_pass_tightens(rng):
    """ksel=16/kp=8 (the tier-1 escalation config) must leave fewer
    suspects than the base pass."""
    mesh = random_mesh(3000, rng)
    scene = simple_scene(mesh)
    origin, direction = random_rays(512, rng)
    o, d = vec3_of(origin), vec3_of(direction)

    base = tp.intersect_bvh_pallas(o, d, scene.triangles, scene.bvh, kp=2)
    wide = tp.intersect_bvh_pallas(
        o, d, scene.triangles, scene.bvh, kp=8, ksel=16
    )
    s_base = (np.asarray(base["dropped_min"]) < np.asarray(base["t"])).mean()
    s_wide = (np.asarray(wide["dropped_min"]) < np.asarray(wide["t"])).mean()
    assert s_wide <= s_base
    assert s_wide < 0.05


def test_pallas_inactive_rays(rng):
    mesh = random_mesh(100, rng)
    scene = simple_scene(mesh)
    origin, direction = random_rays(64, rng)
    hit = tp.intersect_bvh_pallas(
        vec3_of(origin), vec3_of(direction), scene.triangles, scene.bvh,
        active=jnp.zeros((64,), bool),
    )
    assert not np.isfinite(np.asarray(hit["t"])).any()
    assert (np.asarray(hit["tri"]) == -1).all()
    # no suspects on inactive rays either
    assert not (np.asarray(hit["dropped_min"]) < np.asarray(hit["t"])).any()


def test_pallas_depth1_scene(rng):
    """quad-sized scenes: a single static leaf fetch, no level loop."""
    mesh = random_mesh(10, rng)
    scene = simple_scene(mesh)
    assert scene.bvh.depth == 1
    origin, direction = random_rays(128, rng)
    o, d = vec3_of(origin), vec3_of(direction)
    brute = intersect.intersect_bruteforce(o, d, scene.triangles)
    ver = traverse.intersect_bvh_pallas_verified(
        o, d, scene.triangles, scene.bvh
    )
    _assert_exact_up_to_conditioning(ver["t"], brute["t"])


def test_pallas_ragged_batch(rng):
    """Batch sizes that are not a multiple of the ray tile must pad/slice
    transparently and give identical results to a one-tile call."""
    mesh = random_mesh(900, rng)
    scene = simple_scene(mesh)
    origin, direction = random_rays(700, rng)
    o, d = vec3_of(origin), vec3_of(direction)
    ragged = tp.intersect_bvh_pallas(o, d, scene.triangles, scene.bvh)

    pad = tp.R_TILE * 2 - 700
    op = vec3_of(np.concatenate([origin, origin[:pad]]))
    dp = vec3_of(np.concatenate([direction, direction[:pad]]))
    full = tp.intersect_bvh_pallas(op, dp, scene.triangles, scene.bvh)
    np.testing.assert_array_equal(
        np.asarray(ragged["t"]), np.asarray(full["t"])[:700]
    )
    np.testing.assert_array_equal(
        np.asarray(ragged["tri"]), np.asarray(full["tri"])[:700]
    )


def test_pallas_uv_match_on_agreeing_hits(rng):
    """Where pallas and the oracle pick the same triangle, the barycentrics
    must agree too (the shade stage consumes them)."""
    mesh = random_mesh(900, rng)
    scene = simple_scene(mesh)
    origin, direction = random_rays(512, rng)
    o, d = vec3_of(origin), vec3_of(direction)
    brute = intersect.intersect_bruteforce(o, d, scene.triangles)
    ver = traverse.intersect_bvh_pallas_verified(
        o, d, scene.triangles, scene.bvh
    )
    hits = np.isfinite(np.asarray(brute["t"])) & np.isfinite(
        np.asarray(ver["t"])
    )
    same = (
        (np.asarray(ver["tri"]) == np.asarray(brute["tri"]))
        & hits
        & np.isclose(
            _finite(np.asarray(ver["t"])),
            _finite(np.asarray(brute["t"])), **TIGHT,
        )
    )
    assert same.sum() > 0.9 * hits.sum()
    np.testing.assert_allclose(
        np.asarray(ver["u"])[same], np.asarray(brute["u"])[same],
        rtol=1e-3, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(ver["v"])[same], np.asarray(brute["v"])[same],
        rtol=1e-3, atol=1e-4,
    )


def test_pallas_scene_fits_gate(rng):
    mesh = random_mesh(900, rng)
    scene = simple_scene(mesh)
    assert tp.scene_fits(scene.triangles, scene.bvh)


def test_pallas_compacted_tables_bit_identical(rng):
    """Compacted PallasTables (built host-side at scene build) must give
    bit-identical results to the uncompacted traced fallback — compaction
    only relabels fetch columns."""
    from raytracing_c_tpu.models.scene import build_scene  # noqa: F401

    mesh = random_mesh(2000, rng)
    scene = simple_scene(mesh)
    assert scene.ptables is not None
    origin, direction = random_rays(512, rng)
    o, d = vec3_of(origin), vec3_of(direction)
    a = tp.intersect_bvh_pallas(o, d, scene.triangles, scene.bvh)
    b = tp.intersect_bvh_pallas(
        o, d, scene.triangles, scene.bvh, tables=scene.ptables
    )
    for k in ("t", "tri", "u", "v", "dropped_min"):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_attr_kernel_matches_xla_gather(rng):
    """fetch_attrs (one-hot MXU attr fetch + in-kernel interpolation) must
    match the XLA attr-row-gather path of _gather_hit_geometry on every
    winning triangle (same formulas, same f32 inputs -> tight tolerance)."""
    from raytracing_c_tpu.render.integrator import _gather_hit_geometry

    mesh = random_mesh(900, rng)
    scene = simple_scene(mesh)
    assert scene.ptables.attr is not None
    origin, direction = random_rays(512, rng)
    o, d = vec3_of(origin), vec3_of(direction)
    hit = traverse.intersect_bvh_pallas_verified(
        o, d, scene.triangles, scene.bvh, tables=scene.ptables
    )
    hit["sph"] = jnp.full((512,), -1, jnp.int32)

    want = _gather_hit_geometry(scene, o, d, hit, method="topk")
    got = tp.fetch_attrs(scene.ptables, hit["tri"], hit["u"], hit["v"])

    m = np.isfinite(np.asarray(hit["t"]))  # miss lanes carry garbage attrs
    for k in ("uv_u", "uv_v"):
        np.testing.assert_allclose(
            np.asarray(got[k])[m], np.asarray(want[k])[m], rtol=1e-6,
            atol=1e-6)
    for k in ("normal", "ng", "tangent", "bitangent"):
        for c in "xyz":
            np.testing.assert_allclose(
                np.asarray(getattr(got[k], c))[m],
                np.asarray(getattr(want[k], c))[m], rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(got["mat_id"])[m], np.asarray(want["mat_id"])[m])


@pytest.mark.parametrize("mode", ["bf16x3", "int8x4"])
def test_split_table_reconstruction_exact(rng, mode, monkeypatch):
    """Both split formats transport f32 table values BIT-exactly through
    a one-hot matmul fetch (incl. negatives, integer ids, and extreme
    exponents) — the invariant the traversal certificate rests on."""
    monkeypatch.setattr(tp, "SPLIT_MODE", mode)
    vals = np.concatenate([
        rng.standard_normal(400).astype(np.float32) * 1e3,
        rng.standard_normal(400).astype(np.float32) * 1e-3,
        np.arange(200, dtype=np.float32) * 37.0,  # integer ids incl. >256
        np.array([0.0, -0.0, 1.0, -1.0, 3.0e38, 1.2e-30], np.float32),
    ])
    table = np.zeros((24, 128), np.float32)
    table.flat[: vals.size] = vals[: table.size]
    split = tp._split3(table)
    ids = jnp.asarray(rng.integers(0, 128, size=(1, 256)), jnp.int32)
    got = tp._fetch_split(jnp.asarray(split), ids)
    want = jnp.asarray(table)[:, ids[0]]
    assert np.array_equal(np.asarray(got), np.asarray(want))

    split_t = tp._split3_traced(jnp.asarray(table))
    got_t = tp._fetch_split(split_t, ids)
    assert np.array_equal(np.asarray(got_t), np.asarray(want))


def test_fused_attr_traversal_matches_separate(rng):
    """fuse_attr: the in-kernel attr interpolation must equal the
    standalone attr kernel on the same winners, and the verified wrapper's
    stale-lane refetch must make the final geometry match the XLA gather
    even when repairs change winners (kp=2 forces a real repair rate)."""
    from raytracing_c_tpu.render.integrator import _gather_hit_geometry

    mesh = random_mesh(3000, rng)
    scene = simple_scene(mesh)
    origin, direction = random_rays(768, rng)
    o, d = vec3_of(origin), vec3_of(direction)

    # single pass: attrs == standalone kernel on identical winners
    one = tp.intersect_bvh_pallas(
        o, d, scene.triangles, scene.bvh, tables=scene.ptables,
        kp=2, fuse_attr=True,
    )
    sep = tp.fetch_attrs(scene.ptables, one["tri"], one["u"], one["v"])
    fused = tp.attrs_to_dict(one["attrs"])
    m = np.asarray(one["tri"]) >= 0
    for k in ("uv_u", "uv_v"):
        np.testing.assert_array_equal(
            np.asarray(fused[k])[m], np.asarray(sep[k])[m]
        )
    np.testing.assert_array_equal(
        np.asarray(fused["mat_id"])[m], np.asarray(sep["mat_id"])[m]
    )
    for k in ("normal", "ng", "tangent", "bitangent"):
        for c in "xyz":
            np.testing.assert_array_equal(
                np.asarray(getattr(fused[k], c))[m],
                np.asarray(getattr(sep[k], c))[m],
            )

    # verified + fused: final geometry equals the XLA gather of the FINAL
    # (repaired) winners — the stale-lane refetch must fire correctly
    ver = traverse.intersect_bvh_pallas_verified(
        o, d, scene.triangles, scene.bvh, kp=2, tables=scene.ptables,
        fuse_attr=True,
    )
    assert "attrs" in ver and "attrs_stale" in ver
    hitd = {
        "t": ver["t"], "tri": ver["tri"], "u": ver["u"], "v": ver["v"],
        "sph": jnp.full_like(ver["tri"], -1),
        "attrs": ver["attrs"], "attrs_stale": ver["attrs_stale"],
    }
    got = _gather_hit_geometry(scene, o, d, hitd, method="pallas")
    ref_hit = {k: hitd[k] for k in ("t", "tri", "u", "v", "sph")}
    want = _gather_hit_geometry(scene, o, d, ref_hit, method="topk")
    m = np.asarray(ver["tri"]) >= 0
    for k in ("uv_u", "uv_v"):
        np.testing.assert_allclose(
            np.asarray(got[k])[m], np.asarray(want[k])[m],
            rtol=1e-5, atol=1e-6,
        )
    np.testing.assert_array_equal(
        np.asarray(got["mat_id"])[m], np.asarray(want["mat_id"])[m]
    )
    for k in ("normal", "ng", "tangent", "bitangent"):
        for c in "xyz":
            np.testing.assert_allclose(
                np.asarray(getattr(got[k], c))[m],
                np.asarray(getattr(want[k], c))[m],
                rtol=1e-5, atol=1e-6,
            )


def test_int8x4_tables_full_traversal_exact(rng, monkeypatch):
    """The int8x4 split format must carry the FULL pipeline (table build ->
    traversal -> verified repair -> attr kernel) to the same oracle
    exactness as the default bf16x3 format."""
    monkeypatch.setattr(tp, "SPLIT_MODE", "int8x4")
    mesh = random_mesh(2500, rng)
    scene = simple_scene(mesh)  # tables built under int8x4
    assert scene.ptables.leaf.dtype == jnp.int8

    origin, direction = random_rays(512, rng)
    o, d = vec3_of(origin), vec3_of(direction)
    brute = intersect.intersect_bruteforce(o, d, scene.triangles)
    ver = traverse.intersect_bvh_pallas_verified(
        o, d, scene.triangles, scene.bvh, tables=scene.ptables,
        fuse_attr=True,
    )
    _assert_exact_up_to_conditioning(ver["t"], brute["t"])

    # attrs agree with the XLA gather on the final winners
    from raytracing_c_tpu.render.integrator import _gather_hit_geometry

    hitd = {
        "t": ver["t"], "tri": ver["tri"], "u": ver["u"], "v": ver["v"],
        "sph": jnp.full_like(ver["tri"], -1),
        "attrs": ver["attrs"], "attrs_stale": ver["attrs_stale"],
    }
    got = _gather_hit_geometry(scene, o, d, hitd, method="pallas")
    ref = {k: hitd[k] for k in ("t", "tri", "u", "v", "sph")}
    want = _gather_hit_geometry(scene, o, d, ref, method="topk")
    m = np.asarray(ver["tri"]) >= 0
    np.testing.assert_array_equal(
        np.asarray(got["mat_id"])[m], np.asarray(want["mat_id"])[m]
    )
    for c in "xyz":
        np.testing.assert_allclose(
            np.asarray(getattr(got["normal"], c))[m],
            np.asarray(getattr(want["normal"], c))[m],
            rtol=1e-5, atol=1e-6,
        )


def test_certificate_sound_at_kp1(rng):
    """kp=1 fetches ONE leaf group per ray — maximum certificate pressure
    for the group-ranked selection: every wrong/missed hit must carry
    dropped_min < t (no silent truncation), and the verified wrapper must
    still be oracle-exact from this weakest tier-0."""
    mesh = random_mesh(3000, rng)
    scene = simple_scene(mesh)
    origin, direction = random_rays(768, rng)
    o, d = vec3_of(origin), vec3_of(direction)
    brute = intersect.intersect_bruteforce(o, d, scene.triangles)

    pal = tp.intersect_bvh_pallas(
        o, d, scene.triangles, scene.bvh, kp=1, tables=scene.ptables
    )

    def fin(a):
        return np.where(np.isfinite(a), a, 1e30)

    got, want = fin(np.asarray(pal["t"])), fin(np.asarray(brute["t"]))
    tight = np.isclose(got, want, rtol=1e-5, atol=1e-6)
    loose = np.isclose(got, want, rtol=1e-2, atol=1e-4)
    suspect = np.asarray(pal["dropped_min"]) < np.asarray(pal["t"])
    assert not (~tight & ~suspect & ~loose).any()

    ver = traverse.intersect_bvh_pallas_verified(
        o, d, scene.triangles, scene.bvh, kp=1, tables=scene.ptables
    )
    _assert_exact_up_to_conditioning(ver["t"], brute["t"])


def test_shared_fetch_matches_direct(rng):
    """Tile-shared leaf/attr staging (traverse_pallas.SHARED): on a table
    wider than the 128-slot buffer, shared and direct tier-0 must agree
    exactly on every lane the shared pass could serve (its group was in
    the buffer); lanes it could NOT serve must carry the certificate.
    On hit lanes where both found the same winner, t/u/v/tri AND the
    fused attrs are bit-identical (the staged bytes are exact transport)."""
    mesh = random_mesh(9000, rng)
    scene = simple_scene(mesh)
    assert scene.ptables.leaf.shape[1] > tp.SHARED_U  # shared engages

    origin, direction = random_rays(768, rng)
    o, d = vec3_of(origin), vec3_of(direction)

    a = tp.intersect_bvh_pallas(
        o, d, scene.triangles, scene.bvh, kp=4, tables=scene.ptables,
        shared=False, fuse_attr=True,
    )
    b = tp.intersect_bvh_pallas(
        o, d, scene.triangles, scene.bvh, kp=4, tables=scene.ptables,
        shared=True, fuse_attr=True,
    )
    ta, tb = np.asarray(a["t"]), np.asarray(b["t"])
    sus_b = np.asarray(b["dropped_min"]) < tb
    # every divergence is a buffer-overflow lane, and those are certified
    diff = ~((ta == tb) | (np.isinf(ta) & np.isinf(tb)))
    assert (sus_b | ~diff).all(), "uncertified divergence"
    # agreeing hit lanes are bit-identical through the fused attrs
    m = (np.asarray(a["tri"]) == np.asarray(b["tri"])) & \
        (np.asarray(a["tri"]) >= 0) & (ta == tb)
    assert m.any()
    for k in ("u", "v"):
        np.testing.assert_array_equal(
            np.asarray(a[k])[m], np.asarray(b[k])[m], err_msg=k
        )
    np.testing.assert_array_equal(
        np.asarray(a["attrs"])[:, m], np.asarray(b["attrs"])[:, m]
    )


def test_shared_fetch_overflow_verified_exact(rng, monkeypatch):
    """Overflow stress: with the slot budget crushed to 8, most lanes'
    groups miss the buffer — the exact-distance certificate must flag
    every one of them, and the verified wrapper must still land on the
    brute-force oracle."""
    monkeypatch.setattr(tp, "SHARED_U", 8)
    monkeypatch.setattr(tp, "SHARED", True)
    mesh = random_mesh(9000, rng)
    scene = simple_scene(mesh)
    assert scene.ptables.leaf.shape[1] > 8

    origin, direction = random_rays(512, rng)
    o, d = vec3_of(origin), vec3_of(direction)
    brute = intersect.intersect_bruteforce(o, d, scene.triangles)

    pal = tp.intersect_bvh_pallas(
        o, d, scene.triangles, scene.bvh, kp=4, tables=scene.ptables,
        shared=True,
    )

    def fin(a):
        return np.where(np.isfinite(a), a, 1e30)

    got, want = fin(np.asarray(pal["t"])), fin(np.asarray(brute["t"]))
    tight = np.isclose(got, want, rtol=1e-5, atol=1e-6)
    loose = np.isclose(got, want, rtol=1e-2, atol=1e-4)
    suspect = np.asarray(pal["dropped_min"]) < np.asarray(pal["t"])
    assert suspect.any()  # the stress actually fired
    assert not (~tight & ~suspect & ~loose).any()

    ver = traverse.intersect_bvh_pallas_verified(
        o, d, scene.triangles, scene.bvh, tables=scene.ptables,
    )
    _assert_exact_up_to_conditioning(ver["t"], brute["t"])


def test_stage_mt_certificate_sound(rng):
    """Union-MT tier-0 (traverse_pallas.STAGE_MT): every lane whose hit
    deviates from the oracle beyond the f32 conditioning class must carry
    the certificate — slot-overflow lanes via the exact entry distances
    of their unstaged groups (a 768-random-ray 'tile' overflows the
    8-slot buffer constantly, so this stresses exactly that path)."""
    mesh = random_mesh(9000, rng)
    scene = simple_scene(mesh)
    origin, direction = random_rays(768, rng)
    o, d = vec3_of(origin), vec3_of(direction)

    brute = intersect.intersect_bruteforce(o, d, scene.triangles)
    pal = tp.intersect_bvh_pallas(
        o, d, scene.triangles, scene.bvh, kp=4, tables=scene.ptables,
        stage_mt=True, fuse_attr=True,
    )
    got, want = _finite(np.asarray(pal["t"])), _finite(np.asarray(brute["t"]))
    tight = np.isclose(got, want, **TIGHT)
    loose = np.isclose(got, want, **LOOSE)
    suspect = np.asarray(pal["dropped_min"]) < np.asarray(pal["t"])
    assert suspect.any()  # the overflow stress actually engaged
    assert not (~tight & ~suspect & ~loose).any(), "uncertified divergence"


def test_stage_mt_verified_oracle_exact(rng, monkeypatch):
    """The verified wrapper with the union-MT tier-0 must land on the
    brute-force oracle (up to conditioning), exactly like the per-lane
    tier-0 — the certificate + repair tiers absorb every slot overflow."""
    monkeypatch.setattr(tp, "STAGE_MT", True)
    mesh = random_mesh(9000, rng)
    scene = simple_scene(mesh)
    origin, direction = random_rays(512, rng)
    o, d = vec3_of(origin), vec3_of(direction)

    brute = intersect.intersect_bruteforce(o, d, scene.triangles)
    ver = traverse.intersect_bvh_pallas_verified(
        o, d, scene.triangles, scene.bvh, tables=scene.ptables,
        fuse_attr=True,
    )
    _assert_exact_up_to_conditioning(ver["t"], brute["t"])


def test_stage_mt_overflow_stress_verified(rng, monkeypatch):
    """Slot budget crushed to 2: almost every tile union overflows, the
    certificate must flag the victims, and the verified wrapper must
    still land on the oracle."""
    monkeypatch.setattr(tp, "STAGE_MT", True)
    monkeypatch.setattr(tp, "STAGE_MT_U", 2)
    mesh = random_mesh(5000, rng)
    scene = simple_scene(mesh)
    origin, direction = random_rays(512, rng)
    o, d = vec3_of(origin), vec3_of(direction)

    brute = intersect.intersect_bruteforce(o, d, scene.triangles)
    pal = tp.intersect_bvh_pallas(
        o, d, scene.triangles, scene.bvh, kp=4, tables=scene.ptables,
        stage_mt=True,
    )
    suspect = np.asarray(pal["dropped_min"]) < np.asarray(pal["t"])
    assert suspect.any()
    ver = traverse.intersect_bvh_pallas_verified(
        o, d, scene.triangles, scene.bvh, tables=scene.ptables,
    )
    _assert_exact_up_to_conditioning(ver["t"], brute["t"])


def test_stage_mt_extra_coverage_certified_or_oracle(rng):
    """Union-MT tests a SUPERSET of each lane's kp selection, so its
    tier-0 may legitimately find hits the per-lane pass missed — every
    such extra hit must be a genuine oracle hit (same tri, conditioning-
    tight t) or the lane must be certified."""
    mesh = random_mesh(3000, rng)
    scene = simple_scene(mesh)
    origin, direction = random_rays(512, rng)
    o, d = vec3_of(origin), vec3_of(direction)

    brute = intersect.intersect_bruteforce(o, d, scene.triangles)
    a = tp.intersect_bvh_pallas(
        o, d, scene.triangles, scene.bvh, kp=4, tables=scene.ptables,
        stage_mt=False,
    )
    b = tp.intersect_bvh_pallas(
        o, d, scene.triangles, scene.bvh, kp=4, tables=scene.ptables,
        stage_mt=True,
    )
    improved = np.asarray(b["t"]) < np.asarray(a["t"])
    if improved.any():
        got = _finite(np.asarray(b["t"]))[improved]
        want = _finite(np.asarray(brute["t"]))[improved]
        sus = (np.asarray(b["dropped_min"]) < np.asarray(b["t"]))[improved]
        ok = np.isclose(got, want, **TIGHT) | np.isclose(got, want, **LOOSE)
        assert (ok | sus).all()


def test_stage_mt_attrs_selfconsistent(rng):
    """Fused union-MT attrs must equal a standalone fetch_attrs of the
    SAME winners bit-for-bit (both are exact transport + identical
    interpolation math on identical (tri, u, v) inputs) — this pins the
    slot->canonical id inverse (gmap row 1) and the winner-slot attr
    refetch."""
    mesh = random_mesh(9000, rng)
    scene = simple_scene(mesh)
    origin, direction = random_rays(768, rng)
    o, d = vec3_of(origin), vec3_of(direction)

    b = tp.intersect_bvh_pallas(
        o, d, scene.triangles, scene.bvh, kp=4, tables=scene.ptables,
        stage_mt=True, fuse_attr=True,
    )
    hit = np.asarray(b["tri"]) >= 0
    assert hit.any()
    ref = tp.fetch_attrs(scene.ptables, b["tri"], b["u"], b["v"])
    got = tp.attrs_to_dict(b["attrs"])
    for k in ("normal", "ng", "tangent", "bitangent"):
        for c in "xyz":
            np.testing.assert_array_equal(
                np.asarray(getattr(got[k], c))[hit],
                np.asarray(getattr(ref[k], c))[hit],
                err_msg=f"{k}.{c}",
            )
    for k in ("uv_u", "uv_v", "mat_id"):
        np.testing.assert_array_equal(
            np.asarray(got[k])[hit], np.asarray(ref[k])[hit], err_msg=k
        )


def test_tw_certificate_sound(rng):
    """Tile-wavefront tier-0 (traverse_pallas.TW): random rays make the
    tile-global selection truncate constantly (each 'tile' is 768
    incoherent rays voting on 8 shared slots) — every lane whose hit
    deviates from the oracle beyond the f32 conditioning class must
    carry the certificate."""
    mesh = random_mesh(9000, rng)
    scene = simple_scene(mesh)
    origin, direction = random_rays(768, rng)
    o, d = vec3_of(origin), vec3_of(direction)

    brute = intersect.intersect_bruteforce(o, d, scene.triangles)
    pal = tp.intersect_bvh_pallas(
        o, d, scene.triangles, scene.bvh, kp=4, tables=scene.ptables,
        tile_wavefront=True, fuse_attr=True,
    )
    got, want = _finite(np.asarray(pal["t"])), _finite(np.asarray(brute["t"]))
    tight = np.isclose(got, want, **TIGHT)
    loose = np.isclose(got, want, **LOOSE)
    suspect = np.asarray(pal["dropped_min"]) < np.asarray(pal["t"])
    assert suspect.any()  # the incoherence stress actually engaged
    assert not (~tight & ~suspect & ~loose).any(), "uncertified divergence"


def test_tw_verified_oracle_exact(rng, monkeypatch):
    """The verified wrapper with the tile-wavefront tier-0 must land on
    the brute-force oracle (up to conditioning) — the per-lane wide
    repair tiers absorb every tile-vote truncation."""
    monkeypatch.setattr(tp, "TW", True)
    mesh = random_mesh(9000, rng)
    scene = simple_scene(mesh)
    origin, direction = random_rays(512, rng)
    o, d = vec3_of(origin), vec3_of(direction)

    brute = intersect.intersect_bruteforce(o, d, scene.triangles)
    ver = traverse.intersect_bvh_pallas_verified(
        o, d, scene.triangles, scene.bvh, tables=scene.ptables,
        fuse_attr=True,
    )
    _assert_exact_up_to_conditioning(ver["t"], brute["t"])


def test_tw_truncation_stress_verified(rng, monkeypatch):
    """Node and leaf slot budgets crushed (TW_U=4, TW_UL=2): the
    tile-global selection drops most of the tree at every level, the
    certificate must flag the victims, and the verified wrapper must
    still land on the oracle."""
    monkeypatch.setattr(tp, "TW", True)
    monkeypatch.setattr(tp, "TW_U", 4)
    monkeypatch.setattr(tp, "TW_UL", 2)
    mesh = random_mesh(5000, rng)
    scene = simple_scene(mesh)
    origin, direction = random_rays(512, rng)
    o, d = vec3_of(origin), vec3_of(direction)

    brute = intersect.intersect_bruteforce(o, d, scene.triangles)
    pal = tp.intersect_bvh_pallas(
        o, d, scene.triangles, scene.bvh, kp=4, tables=scene.ptables,
        tile_wavefront=True,
    )
    suspect = np.asarray(pal["dropped_min"]) < np.asarray(pal["t"])
    assert suspect.any()
    ver = traverse.intersect_bvh_pallas_verified(
        o, d, scene.triangles, scene.bvh, tables=scene.ptables,
    )
    _assert_exact_up_to_conditioning(ver["t"], brute["t"])


def test_tw_extra_coverage_certified_or_oracle(rng):
    """The tile union a lane tests under TW differs from its private
    per-lane kp selection, so TW's tier-0 may legitimately find hits the
    per-lane pass missed — every such extra hit must be a genuine oracle
    hit (conditioning-tight t) or the lane must be certified."""
    mesh = random_mesh(3000, rng)
    scene = simple_scene(mesh)
    origin, direction = random_rays(512, rng)
    o, d = vec3_of(origin), vec3_of(direction)

    brute = intersect.intersect_bruteforce(o, d, scene.triangles)
    a = tp.intersect_bvh_pallas(
        o, d, scene.triangles, scene.bvh, kp=4, tables=scene.ptables,
    )
    b = tp.intersect_bvh_pallas(
        o, d, scene.triangles, scene.bvh, kp=4, tables=scene.ptables,
        tile_wavefront=True,
    )
    improved = np.asarray(b["t"]) < np.asarray(a["t"])
    if improved.any():
        got = _finite(np.asarray(b["t"]))[improved]
        want = _finite(np.asarray(brute["t"]))[improved]
        sus = (np.asarray(b["dropped_min"]) < np.asarray(b["t"]))[improved]
        ok = np.isclose(got, want, **TIGHT) | np.isclose(got, want, **LOOSE)
        assert (ok | sus).all()


def test_tw_attrs_selfconsistent(rng):
    """Fused tile-wavefront attrs must equal a standalone fetch_attrs of
    the SAME winners bit-for-bit — pins the (U, G) one-hot column
    staging (_fetch_i8_cols exact transport) and the winner-slot attr
    refetch through the staged buffer."""
    mesh = random_mesh(9000, rng)
    scene = simple_scene(mesh)
    origin, direction = random_rays(768, rng)
    o, d = vec3_of(origin), vec3_of(direction)

    b = tp.intersect_bvh_pallas(
        o, d, scene.triangles, scene.bvh, kp=4, tables=scene.ptables,
        tile_wavefront=True, fuse_attr=True,
    )
    hit = np.asarray(b["tri"]) >= 0
    assert hit.any()
    ref = tp.fetch_attrs(scene.ptables, b["tri"], b["u"], b["v"])
    got = tp.attrs_to_dict(b["attrs"])
    for k in ("normal", "ng", "tangent", "bitangent"):
        for c in "xyz":
            np.testing.assert_array_equal(
                np.asarray(getattr(got[k], c))[hit],
                np.asarray(getattr(ref[k], c))[hit],
                err_msg=f"{k}.{c}",
            )
    for k in ("uv_u", "uv_v", "mat_id"):
        np.testing.assert_array_equal(
            np.asarray(got[k])[hit], np.asarray(ref[k])[hit], err_msg=k
        )


def test_tw_small_mesh_depth2(rng):
    """Depth-2 trees skip the staged-node levels entirely (static level-1
    expansion straight into the tile-global leaf vote) — the verified
    wrapper must still land on the oracle."""
    mesh = random_mesh(400, rng)
    scene = simple_scene(mesh)
    assert scene.ptables.depth == 2
    origin, direction = random_rays(512, rng)
    o, d = vec3_of(origin), vec3_of(direction)

    brute = intersect.intersect_bruteforce(o, d, scene.triangles)
    ver = traverse.intersect_bvh_pallas_verified(
        o, d, scene.triangles, scene.bvh, tables=scene.ptables,
        tile_wavefront=True,
    )
    _assert_exact_up_to_conditioning(ver["t"], brute["t"])
