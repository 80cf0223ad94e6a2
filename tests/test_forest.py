"""Subtree re-rooted (forest) Pallas traversal: scenes beyond the
monolithic depth-4 / VMEM gate still take the fused-kernel path.

The reference's recursive traversal handles any tree depth
(raytracer.c:443-483); the monolithic Pallas kernel cannot, because its
tables must be VMEM-resident. ForestTables splits the implicit tree at a
root level whose subtrees DO fit, runs the unchanged kernel per subtree
with the running best hit as each call's t_max pruning bound, and merges
hits + exactness certificates (ops/traverse_pallas.py:ForestTables for
the soundness argument). These tests hold the forest path to the same
bar as the monolithic one: brute-force-oracle exactness up to f32
Moller-Trumbore conditioning.
"""

import numpy as np
import jax.numpy as jnp

from raytracing_c_tpu.ops import intersect, traverse
from raytracing_c_tpu.ops import traverse_pallas as tp

from helpers import random_mesh, random_rays, simple_scene, vec3_of
from test_traverse_pallas import _assert_exact_up_to_conditioning


def _forest_of(scene, root_level=1):
    return tp.build_forest_host(
        np.asarray(scene.bvh.nodes),
        np.asarray(scene.triangles.leaf_rows),
        scene.bvh.depth,
        np.asarray(scene.triangles.attr_rows),
        root_level=root_level,
    )


def test_forced_forest_matches_oracle(rng):
    """Re-rooting a scene that also fits monolithically must not change
    results: the verified forest path is oracle-exact."""
    mesh = random_mesh(2000, rng)
    scene = simple_scene(mesh)
    assert isinstance(scene.ptables, tp.PallasTables)  # fits monolithically
    forest = _forest_of(scene)
    assert 1 < len(forest.subtrees) <= 8

    origin, direction = random_rays(512, rng)
    o, d = vec3_of(origin), vec3_of(direction)
    brute = intersect.intersect_bruteforce(o, d, scene.triangles)
    ver = traverse.intersect_bvh_pallas_verified(
        o, d, scene.triangles, scene.bvh, tables=forest
    )
    _assert_exact_up_to_conditioning(ver["t"], brute["t"])

    # triangle ids must be GLOBAL and agree with the oracle wherever the
    # distance matches tightly (ties broken to the lower id both sides)
    got_t = np.asarray(ver["t"])
    want_t = np.asarray(brute["t"])
    tight = (
        np.isclose(got_t, want_t, rtol=1e-5, atol=1e-6)
        & np.isfinite(want_t)
    )
    np.testing.assert_array_equal(
        np.asarray(ver["tri"])[tight], np.asarray(brute["tri"])[tight]
    )


def test_depth5_scene_builds_forest_and_is_exact(rng):
    """A >32k-triangle scene (tree depth 5) must auto-build ForestTables
    and stay oracle-exact on the verified path."""
    mesh = random_mesh(40_000, rng)
    scene = simple_scene(mesh)
    assert scene.bvh.depth == 5
    assert isinstance(scene.ptables, tp.ForestTables)

    origin, direction = random_rays(256, rng)
    o, d = vec3_of(origin), vec3_of(direction)
    brute = intersect.intersect_bruteforce(o, d, scene.triangles)
    ver = traverse.intersect_bvh_pallas_verified(
        o, d, scene.triangles, scene.bvh, tables=scene.ptables
    )
    _assert_exact_up_to_conditioning(ver["t"], brute["t"])


def test_forest_unverified_certificate_sound(rng):
    """Forest single pass: every wrong ray must carry the suspect
    certificate (dropped_min < t) — the t_max chaining must not lose
    certificate mass across subtree merges."""
    mesh = random_mesh(3000, rng)
    scene = simple_scene(mesh)
    forest = _forest_of(scene)

    origin, direction = random_rays(512, rng)
    o, d = vec3_of(origin), vec3_of(direction)
    brute = intersect.intersect_bruteforce(o, d, scene.triangles)
    pal = tp.intersect_bvh_pallas_forest(o, d, forest, kp=2)

    def fin(a):
        return np.where(np.isfinite(a), a, 1e30)

    got, want = fin(np.asarray(pal["t"])), fin(np.asarray(brute["t"]))
    tight = np.isclose(got, want, rtol=1e-5, atol=1e-6)
    loose = np.isclose(got, want, rtol=1e-2, atol=1e-4)
    suspect = np.asarray(pal["dropped_min"]) < np.asarray(pal["t"])
    unexplained = ~tight & ~suspect & ~loose
    assert not unexplained.any()


def test_forest_attrs_match_xla_gather(rng):
    """fetch_attrs_forest must reproduce the XLA attribute-row gather's
    interpolated shading attributes for global triangle ids."""
    from raytracing_c_tpu.render.integrator import _gather_hit_geometry

    mesh = random_mesh(2000, rng)
    scene = simple_scene(mesh)
    forest = _forest_of(scene)

    origin, direction = random_rays(512, rng)
    o, d = vec3_of(origin), vec3_of(direction)
    hit = traverse.intersect_bvh_pallas_verified(
        o, d, scene.triangles, scene.bvh, tables=forest
    )
    hitd = {
        "t": hit["t"], "tri": hit["tri"], "u": hit["u"], "v": hit["v"],
        "sph": jnp.full_like(hit["tri"], -1),
    }
    want = _gather_hit_geometry(scene, o, d, hitd, method="topk")
    got = tp.fetch_attrs_forest(forest, hit["tri"], hit["u"], hit["v"])

    m = np.asarray(hit["tri"]) >= 0
    for k in ("uv_u", "uv_v"):
        np.testing.assert_allclose(
            np.asarray(got[k])[m], np.asarray(want[k])[m],
            rtol=1e-5, atol=1e-6,
        )
    for k in ("normal", "ng", "tangent", "bitangent"):
        for c in "xyz":
            np.testing.assert_allclose(
                np.asarray(getattr(got[k], c))[m],
                np.asarray(getattr(want[k], c))[m],
                rtol=1e-5, atol=1e-6,
            )
    np.testing.assert_array_equal(
        np.asarray(got["mat_id"])[m], np.asarray(want["mat_id"])[m]
    )


def test_forest_fused_attrs_match_xla_gather(rng):
    """Forest + fuse_attr: the merged in-kernel attrs (with stale-lane
    refetch) must reproduce the XLA gather for the final winners."""
    from raytracing_c_tpu.render.integrator import _gather_hit_geometry

    mesh = random_mesh(2000, rng)
    scene = simple_scene(mesh)
    forest = _forest_of(scene)

    origin, direction = random_rays(512, rng)
    o, d = vec3_of(origin), vec3_of(direction)
    ver = traverse.intersect_bvh_pallas_verified(
        o, d, scene.triangles, scene.bvh, tables=forest, fuse_attr=True,
    )
    assert "attrs" in ver and "attrs_stale" in ver

    class S:  # scene view with the forest as ptables (refetch dispatch)
        pass

    s = S()
    for k in ("triangles", "bvh", "spheres", "materials", "atlas"):
        setattr(s, k, getattr(scene, k))
    s.ptables = forest

    hitd = {
        "t": ver["t"], "tri": ver["tri"], "u": ver["u"], "v": ver["v"],
        "sph": jnp.full_like(ver["tri"], -1),
        "attrs": ver["attrs"], "attrs_stale": ver["attrs_stale"],
    }
    got = _gather_hit_geometry(s, o, d, hitd, method="pallas")
    ref = {k: hitd[k] for k in ("t", "tri", "u", "v", "sph")}
    want = _gather_hit_geometry(scene, o, d, ref, method="topk")
    m = np.asarray(ver["tri"]) >= 0
    np.testing.assert_array_equal(
        np.asarray(got["mat_id"])[m], np.asarray(want["mat_id"])[m]
    )
    for k in ("normal", "ng", "uv_u"):
        ga, wa = got[k], want[k]
        if hasattr(ga, "x"):
            for c in "xyz":
                np.testing.assert_allclose(
                    np.asarray(getattr(ga, c))[m],
                    np.asarray(getattr(wa, c))[m], rtol=1e-5, atol=1e-6,
                )
        else:
            np.testing.assert_allclose(
                np.asarray(ga)[m], np.asarray(wa)[m], rtol=1e-5, atol=1e-6
            )


def test_forest_stage_mt_verified_exact(rng, monkeypatch):
    """Union-MT tier-0 (traverse_pallas.STAGE_MT) through the forest
    chain: per-subtree slot staging + t_max threading must still land the
    verified wrapper on the brute-force oracle."""
    monkeypatch.setattr(tp, "STAGE_MT", True)
    mesh = random_mesh(9000, rng)
    scene = simple_scene(mesh)
    forest = _forest_of(scene)
    origin, direction = random_rays(512, rng)
    o, d = vec3_of(origin), vec3_of(direction)

    brute = intersect.intersect_bruteforce(o, d, scene.triangles)
    ver = traverse.intersect_bvh_pallas_verified(
        o, d, scene.triangles, scene.bvh, tables=forest, fuse_attr=True,
    )
    _assert_exact_up_to_conditioning(ver["t"], brute["t"])
