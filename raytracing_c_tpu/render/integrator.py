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

import os

import jax
import jax.numpy as jnp

from raytracing_c_tpu import EPSILON
from raytracing_c_tpu.ops import background as bg_ops
from raytracing_c_tpu.ops import disney, traverse
from raytracing_c_tpu.utils.vec3 import Vec3


def _gather_hit_geometry(scene, origin: Vec3, direction: Vec3, hit,
                         method: str = "topk"):
    """Deferred attribute interpolation: gather per-hit vertex data by the
    winning triangle index (the SIMD kernel interpolated inline,
    raytracer.c:159-183; we defer it to one dense stage per bounce).

    XLA path: ONE 512-byte attribute-row gather per ray (models/scene.py
    ATTR_* layout) instead of ~25 per-lane gathers. Pallas path (when the
    traversal ran the Pallas kernel and host-built tables exist): one-hot
    MXU fetch + in-kernel interpolation (traverse_pallas.fetch_attrs) —
    row gathers are latency-bound even at 512 bytes (measured 4.5 ms per
    262k rays; the kernel does the same work in ~1 ms).
    """
    ptables = getattr(scene, "ptables", None)
    if "attrs" in hit:
        # fused-traversal attrs (tier-0 winners, interpolated in-kernel).
        # Lanes the exactness repair changed refetch behind a cond — rare
        # by construction (suspects ~0.5%, most verify unchanged), so the
        # dense refetch branch almost never executes.
        from raytracing_c_tpu.ops import traverse_pallas as tp

        fused = tp.attrs_to_dict(hit["attrs"])
        stale = hit["attrs_stale"]

        def _refetch(_):
            if isinstance(ptables, tp.ForestTables):
                g2 = tp.fetch_attrs_forest(
                    ptables, hit["tri"], hit["u"], hit["v"]
                )
            else:
                g2 = tp.fetch_attrs(ptables, hit["tri"], hit["u"], hit["v"])
            return {
                k: (
                    Vec3.where(stale, g2[k], fused[k])
                    if isinstance(fused[k], Vec3)
                    else jnp.where(stale, g2[k], fused[k])
                )
                for k in fused
            }

        g = jax.lax.cond(
            jnp.any(stale), _refetch, lambda _: fused, None
        )
        normal, ng = g["normal"], g["ng"]
        tangent, bitangent = g["tangent"], g["bitangent"]
        uv_u, uv_v, mat_id = g["uv_u"], g["uv_v"], g["mat_id"]
    elif method.startswith("pallas") and ptables is not None \
            and ptables.attr is not None:
        from raytracing_c_tpu.ops import traverse_pallas as tp

        if isinstance(ptables, tp.ForestTables):
            g = tp.fetch_attrs_forest(
                ptables, hit["tri"], hit["u"], hit["v"]
            )
        else:
            g = tp.fetch_attrs(ptables, hit["tri"], hit["u"], hit["v"])
        normal, ng = g["normal"], g["ng"]
        tangent, bitangent = g["tangent"], g["bitangent"]
        uv_u, uv_v, mat_id = g["uv_u"], g["uv_v"], g["mat_id"]
    else:
        from raytracing_c_tpu.models.scene import (
            ATTR_BTN, ATTR_MAT, ATTR_N0, ATTR_N1, ATTR_N2, ATTR_NG,
            ATTR_TAN, ATTR_UV,
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


#: first bounce eligible for Russian roulette (when enabled): short paths
#: carry most of the image energy and are never gambled away
RR_START = 3


def bounce_step(scene, st, rand4, method: str = "topk",
                texture_mode: str = "bilinear", rr: bool = False,
                bounce_i=None, nee: bool = False, rand2=None,
                tw: bool = False):
    """ONE wavefront bounce over a state dict of per-ray planes.

    st: dict(origin, direction, throughput, radiance: Vec3; active: bool;
    rays: f32 scalar). rand4: (4, R) uniforms for the material stage.
    The single source of per-bounce semantics: trace()/trace_bucketed()
    below and the demoted pool probe (tools/pool_engine.py) all call it.

    rr: Russian-roulette path termination (BEYOND-PARITY, default off —
    the reference integrator has none, raytracer.c:505-558): from bounce
    RR_START, a continuing path survives with p = clip(max(throughput),
    0.05, 1) and its throughput is divided by p — the standard unbiased
    estimator. Uses rand4[3] (the spare channel). bounce_i: traced bounce
    index (required when rr=True).

    tw: route the PRIMARY intersect through the tile-wavefront tier-0
    (pallas methods only; see traverse_pallas.TW) — for statically-known
    coherent bounces (the peeled bounce 0 in trace/trace_bucketed).
    Shadow rays always stay per-lane: NEE directions are not
    tile-coherent.

    nee (BEYOND-PARITY, default off): next-event estimation of the
    environment light with power-heuristic MIS. Each shaded vertex draws
    one uniform-sphere light sample (rand2), casts a shadow ray, and adds
    throughput x nee_partial when unoccluded; the ordinary miss
    contribution is MIS-weighted by the deterministic scatter pdf carried
    in st["prev_pdf"] (INF sentinel = previous vertex did no NEE -> full
    weight). Triangle emission stays unweighted (NEE samples only the env,
    so no double counting). Shadow rays count toward `rays`.
    """
    active = st["active"]
    o, d = st["origin"], st["direction"]
    r = o.shape[0]

    hit = traverse.intersect_scene(scene, o, d, active, method=method,
                                   tw=tw)
    rays = st["rays"] + jnp.sum(active).astype(jnp.float32)

    is_hit = active & jnp.isfinite(hit["t"])
    geom = _gather_hit_geometry(scene, o, d, hit, method=method)

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
        nee=nee, rand2=rand2,
    )

    zero = Vec3.zeros((r,))
    radiance = st["radiance"] + Vec3.where(
        shaded, st["throughput"] * out["emission"], zero
    )

    # miss: background * throughput (raytracer.c:553-555); under NEE the
    # env contribution of a scattered ray carries its MIS weight
    miss = active & ~is_hit
    bg = bg_ops.eval_background(scene, d)
    if nee:
        pp = st["prev_pdf"]
        env = getattr(scene, "env_light", None)
        if env is not None:
            from raytracing_c_tpu.ops import env_light as el

            pl = el.eval_pdf(env, d)  # per-direction light pdf
        else:
            pl = disney.UNIFORM_SPHERE_PDF
        w_brdf = jnp.where(
            jnp.isfinite(pp), (pp * pp) / (pp * pp + pl * pl), 1.0
        )
        bg = bg * w_brdf
    radiance = radiance + Vec3.where(miss, st["throughput"] * bg, zero)

    if nee:
        # shadow ray toward the env sample; origin epsilon rule as below
        wd = out["nee_dir"]
        sbias = jnp.where(geom["ng"].dot(wd) < 0.0, -EPSILON, EPSILON)
        s_org = geom["point"] + geom["ng"] * sbias
        # shadow rays only need occlusion — never pay for fused attrs
        shadow_method = "pallas" if method == "pallas_fused" else method
        shot = traverse.intersect_scene(scene, s_org, wd, shaded,
                                        method=shadow_method)
        lit = shaded & ~jnp.isfinite(shot["t"])
        radiance = radiance + Vec3.where(
            lit, st["throughput"] * out["nee_partial"], zero
        )
        rays = rays + jnp.sum(shaded).astype(jnp.float32)

    # terminated rays keep their accumulated emission and go inactive
    cont = shaded & ~out["terminate"]

    throughput = Vec3.where(
        cont, st["throughput"] * out["tint"], st["throughput"]
    )

    if rr:
        assert bounce_i is not None
        lum = jnp.maximum(
            jnp.maximum(throughput.x, throughput.y), throughput.z
        )
        p = jnp.clip(lum, 0.05, 1.0)
        gamble = cont & (bounce_i >= RR_START)
        kill = gamble & (rand4[3] >= p)
        cont = cont & ~kill
        scale = jnp.where(gamble & ~kill, 1.0 / p, 1.0)
        throughput = throughput * scale

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

    res = {
        "origin": new_origin,
        "direction": new_dir,
        "throughput": throughput,
        "radiance": radiance,
        "active": (cont | backface),
        "rays": rays,
    }
    if "grp" in st:
        # winner leaf group of THIS bounce's hit — the next compaction's
        # coherence-sort key (TW_DEEP). Sphere winners/misses take the
        # sentinel; live lanes always hit (cont = shaded & ~terminate)
        res["grp"] = jnp.where(
            hit["tri"] >= 0, hit["tri"] >> 6, _GRP_MISS
        ).astype(jnp.int32)
    if "prev_pdf" in st:
        if nee:
            # backface re-casts continue the SAME segment: keep its pdf
            res["prev_pdf"] = jnp.where(
                backface, st["prev_pdf"],
                jnp.where(cont, out["pdf_eval"], jnp.inf),
            )
        else:
            res["prev_pdf"] = st["prev_pdf"]
    return res


def trace(scene, origin: Vec3, direction: Vec3, uniforms, max_bounces: int,
          method: str = "topk", texture_mode: str = "bilinear",
          rr: bool = False, nee: bool = False, nee_uniforms=None):
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
        "prev_pdf": jnp.full((r,), jnp.inf),
    }

    def bounce(i, st, tw=False):
        return bounce_step(scene, st, uniforms[i], method, texture_mode,
                           rr=rr, bounce_i=i, nee=nee,
                           rand2=None if nee_uniforms is None
                           else nee_uniforms[i], tw=tw)

    # bounce-0 peel (see TW_BOUNCE0): the first bounce is statically
    # known camera-coherent and all-active, so it runs OUTSIDE the
    # while_loop with the tile-wavefront tier-0; RNG keys on the bounce
    # index, so peeling is semantics-identical to iteration 0
    i0 = jnp.int32(0)
    if TW_BOUNCE0 and method.startswith("pallas") and max_bounces >= 1:
        state = bounce(0, state, tw=True)
        i0 = jnp.int32(1)

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

    _, st = jax.lax.while_loop(cond, body, (i0, state))
    return st["radiance"], st["rays"]


# state-plane order for the bucket sort (all payloads are (R,) f32/i32)
_SORT_PLANES = (
    ("origin", "x"), ("origin", "y"), ("origin", "z"),
    ("direction", "x"), ("direction", "y"), ("direction", "z"),
    ("throughput", "x"), ("throughput", "y"), ("throughput", "z"),
    ("radiance", "x"), ("radiance", "y"), ("radiance", "z"),
)

#: smallest bucket: a few Pallas tiles so the kernel grid stays busy
_MIN_BUCKET = 4096

#: extra 5r/16 ladder rung between r/2 and r/8 (6 switch branches).
#: The round-3 occupancy census prices the r/2 rung as the ladder's
#: biggest padding source: helmet bounce-1 runs ~295k live lanes at
#: 512k width (43% padding on the second-widest bounce). A 320k rung
#: captures it, and an ADDED rung can never regress (every bounce still
#: picks the narrowest width that holds its live count) — the cost is
#: one more branch's compile time. Env knob for A/B; default per the
#: full-bench measurement in docs/PERF.md round 4.
_LADDER_516 = os.environ.get("RAYTPU_LADDER516", "1") == "1"

#: experiment hook (tools/octant_ab.py): secondary bucket-sort key = ray
#: direction octant, clustering lanes by direction for fetch coherence.
#: A/B'd on chip — see docs/PERF.md for the measured verdict.
SORT_OCTANT = False

#: bounce-0 peel: run the first bounce outside the bounce while_loop so
#: its PRIMARY intersect can statically select the tile-wavefront
#: tier-0 (traverse_pallas.TW — camera rays are tile-coherent by
#: construction; ~75% of all traced rays are bounce 0 per the occupancy
#: census). Peeling is semantics-identical: bounce 0 always runs the
#: full-width branch with no preceding sort, and the RNG keys on
#: (slot, bounce index). Within-conditioning hit differences only (the
#: TW MT runs on staged (576, 1) planes — same f32 math, different
#: scheduling); suspects repair through the unchanged verified tiers.
#: Default ON per the full-bench A/B (docs/PERF.md r5 wave 2: helmet
#: 9.88 -> 10.57 device Mrays/s, tower within noise, CPU goldens
#: unchanged with the peel on).
TW_BOUNCE0 = os.environ.get("RAYTPU_TW_BOUNCE0", "1") == "1"

#: extend tile-wavefront traversal to DEEP bounces via compaction-time
#: coherence sorting (VERDICT r4 #4): live lanes sort by (bounce-(i-1)
#: winner leaf group, direction octant) — the RNG is schedule-invariant,
#: so any compaction order is image-identical for free — and the WIDE
#: ladder branches (>= 5r/16, where bounce 1 lands) run the TW kernel.
#: tools/tw_bounce1.py (helmet bounce-1, 259k live): suspects per-lane
#: 0.82% / TW grp+oct 2.53%, verified 11.50 -> 8.66 ms (-25%); the
#: activity-only order measures 4.76% suspects and trips the repair
#: cap, which is why TW bounces carry an r/16 cap (traverse.py) and
#: narrow branches stay per-lane.
TW_DEEP = os.environ.get("RAYTPU_TW_DEEP", "0") == "1"

#: winner-group sentinel for miss/inactive lanes (> any real leaf group
#: id: the Pallas gate admits <= 32k-triangle scenes -> grp <= 511)
_GRP_MISS = 8191


def trace_bucketed(scene, origin: Vec3, direction: Vec3, key,
                   max_bounces: int, method: str = "topk",
                   texture_mode: str = "bilinear", rr: bool = False,
                   nee: bool = False):
    """trace() with on-device occupancy compaction — the wavefront
    work-pool of the reference (render_thread_proc's chunk stealing,
    raytracer.c:596-720) done the TPU way, with zero host round-trips.

    After a few bounces most lanes are dead but a dense bounce still pays
    for all of them (measured: a geometry batch's later bounces run at
    <20%% occupancy). Each bounce here first sorts live lanes to the front
    (one variadic lax.sort, ~1 ms at 256k — per-lane gathers would cost
    ~7x that), then lax.switch picks the narrowest power-of-two-divided
    front slice that holds every live lane and runs bounce_step on THAT
    static shape only; the dead tail is carried through untouched. Lane
    order stays permuted across bounces; one final sort on the carried
    sample slot restores it.

    Per-sample RNG: uniforms derive from (key, SLOT, bounce) via
    vectorized threefry fold_in (measured 3.4 ms/bounce at 1M lanes for
    the full 6-channel draw — now 4 channels when nee is off, see
    below; docs/PERF.md round-3 RNG census), where slot is the
    sample id carried through every permutation — so a sample's stream is
    PERMUTATION-INDEPENDENT and images are invariant to the compaction
    schedule (bucket widths, sort cadence). Differs from trace()'s
    pre-drawn stream; both are seed-deterministic.
    """
    r = origin.shape[0]

    # Decay-matched ladder, <=5 switch branches: /2 for the first step
    # (helmet's bounce-1 occupancy is ~30%, so a /4 first step would
    # bounce back to FULL width — the round-2 pure-/4 ladder lost ~26%
    # that way), then /4 steps, floored at _MIN_BUCKET. The round-3
    # occupancy census (1M bench lanes: live 1.38M vs 1.97M executed
    # under the old /2 ladder with its r//16 floor = 29.8% padding,
    # docs/PERF.md) shows bounces 2+ collapse to <23k live lanes — the
    # deep /4 tail cuts padding to ~15% at the SAME branch count, so
    # compile cost is unchanged (each branch compiles its own copy of
    # the full bounce program; 7 branches once measured ~45 min of
    # remote compile on the tunnel, 4-5 compile in minutes).
    widths = [r]
    div = 2
    while len(widths) < 5 and widths[-1] // div >= _MIN_BUCKET:
        widths.append(widths[-1] // div)
        div = 4
    if _LADDER_516 and len(widths) >= 2 and (5 * r) // 16 >= _MIN_BUCKET:
        # keep the list strictly decreasing: 5r/16 slots between r/2 and
        # r/8 (see _LADDER_516; widths need not be powers of two — every
        # branch is just a static front slice)
        widths = sorted(set(widths) | {(5 * r) // 16}, reverse=True)

    state = {
        "origin": origin,
        "direction": direction,
        "throughput": Vec3.full((r,), 1.0),
        "radiance": Vec3.zeros((r,)),
        "active": jnp.ones((r,), bool),
        "slot": jnp.arange(r, dtype=jnp.int32),
        "rays": jnp.float32(0.0),
        "prev_pdf": jnp.full((r,), jnp.inf),
    }
    if TW_DEEP:
        state["grp"] = jnp.full((r,), _GRP_MISS, jnp.int32)

    def compact(st):
        key = (~st["active"]).astype(jnp.int32)  # live lanes first
        if TW_DEEP:
            # secondary (grp, octant) coherence key for the TW tile vote
            # (see TW_DEEP); any order of live lanes is image-identical
            d_ = st["direction"]
            octant = (
                (d_.x < 0).astype(jnp.int32) * 4
                + (d_.y < 0).astype(jnp.int32) * 2
                + (d_.z < 0).astype(jnp.int32)
            )
            key = key * (1 << 20) + st["grp"] * 8 + octant
        elif SORT_OCTANT:
            d_ = st["direction"]
            octant = (
                (d_.x < 0).astype(jnp.int32) * 4
                + (d_.y < 0).astype(jnp.int32) * 2
                + (d_.z < 0).astype(jnp.int32)
            )
            key = key * 8 + octant  # active decodes as key < 8 below
        planes = [getattr(st[name], c) for name, c in _SORT_PLANES]
        extra = (st["grp"],) if TW_DEEP else ()
        out = jax.lax.sort(
            (key, st["slot"], st["prev_pdf"], *extra, *planes), num_keys=1
        )
        key_s, slot_s, pp_s, *rest = out
        new = dict(st)
        if TW_DEEP:
            new["active"] = key_s < (1 << 20)
            new["grp"] = rest[0]
            planes_s = rest[1:]
        else:
            new["active"] = key_s < 8 if SORT_OCTANT else key_s == 0
            planes_s = rest
        new["slot"] = slot_s
        new["prev_pdf"] = pp_s
        it = iter(planes_s)
        for name in ("origin", "direction", "throughput", "radiance"):
            new[name] = Vec3(next(it), next(it), next(it))
        return new

    def make_branch(w, i_ref, tw=False):
        def br(args):
            i, st = args
            head = {
                "origin": Vec3(*(getattr(st["origin"], c)[:w] for c in "xyz")),
                "direction": Vec3(
                    *(getattr(st["direction"], c)[:w] for c in "xyz")
                ),
                "throughput": Vec3(
                    *(getattr(st["throughput"], c)[:w] for c in "xyz")
                ),
                "radiance": Vec3(
                    *(getattr(st["radiance"], c)[:w] for c in "xyz")
                ),
                "active": st["active"][:w],
                "rays": st["rays"],
                "prev_pdf": st["prev_pdf"][:w],
            }
            if TW_DEEP:
                head["grp"] = st["grp"][:w]
            # nee: 4 material + 2 light-sample + 1 env-CDF jitter. rr
            # additionally reads channel 3; plain tracing consumes only
            # the 3 BRDF channels. threefry counter semantics make
            # uniform(k, (m,)) the exact PREFIX of uniform(k, (n>m,)),
            # so narrowing the draw is bit-identical (tests/test_golden)
            # while skipping the unused per-lane bit generation (the
            # round-3 narrowing measured 3.4 ms/bounce at 1M lanes for
            # 6->4; r4 trims the rr spare too)
            nu = 7 if nee else (4 if rr else 3)

            def draw(s):
                k = jax.random.fold_in(jax.random.fold_in(key, s), i)
                return jax.random.uniform(k, (nu,), jnp.float32)

            u6 = jax.vmap(draw, out_axes=1)(st["slot"][:w])  # (nu, w)
            out = bounce_step(
                scene, head, u6[: min(nu, 4)], method, texture_mode,
                rr=rr, bounce_i=i, nee=nee,
                rand2=u6[4:nu] if nee else None, tw=tw,
            )
            new = dict(st)
            for name in ("origin", "direction", "throughput", "radiance"):
                new[name] = Vec3(
                    *(
                        jnp.concatenate(
                            [getattr(out[name], c), getattr(st[name], c)[w:]]
                        )
                        for c in "xyz"
                    )
                )
            new["active"] = jnp.concatenate(
                [out["active"], st["active"][w:]]
            )
            new["rays"] = out["rays"]
            new["prev_pdf"] = jnp.concatenate(
                [out["prev_pdf"], st["prev_pdf"][w:]]
            )
            if TW_DEEP:
                new["grp"] = jnp.concatenate([out["grp"], st["grp"][w:]])
            return new

        return br

    # TW_DEEP: wide branches (>= 5r/16 — where bounce 1 lands after the
    # shrink-sort) run the tile-wavefront kernel on their
    # coherence-sorted lanes; narrow (deep-bounce) branches stay
    # per-lane (tools/tw_bounce1.py: unsorted/incoherent distributions
    # cost more in repair than TW saves)
    branches = [
        make_branch(
            w, None,
            tw=TW_DEEP and method.startswith("pallas") and 16 * w >= 5 * r,
        )
        for w in widths
    ]

    # bounce-0 peel (TW_BOUNCE0): iteration 0 always takes the full-width
    # branch with no sort (all lanes live), so running it statically
    # outside the loop with the tile-wavefront tier-0 is exact — the RNG
    # keys on (slot, bounce), invariant to where the bounce executes
    i0 = jnp.int32(0)
    if TW_BOUNCE0 and method.startswith("pallas") and max_bounces >= 1:
        state = make_branch(widths[0], None, tw=True)(
            (jnp.int32(0), state)
        )
        i0 = jnp.int32(1)

    def cond(iv):
        i, k_prev, st = iv
        return jnp.logical_and(i < max_bounces, jnp.any(st["active"]))

    def body(iv):
        i, k_prev, st = iv
        n = jnp.sum(st["active"].astype(jnp.int32))
        # narrowest bucket that holds every live lane (monotone count)
        k_new = jnp.int32(0)
        for j, w in enumerate(widths[1:], start=1):
            k_new = jnp.where(n <= w, jnp.int32(j), k_new)
        # sort ONLY when it lets the bucket shrink: lanes never reactivate,
        # so every live lane already sits inside the previous front slice —
        # the per-bounce sort (~1.6 ms at 1M lanes) is pure waste otherwise
        do_sort = k_new > k_prev
        st = jax.lax.cond(do_sort, compact, lambda s: s, st)
        k = jnp.where(do_sort, k_new, k_prev)
        st = jax.lax.switch(k, branches, (i, st))
        return i + 1, k, st

    _, _, st = jax.lax.while_loop(cond, body, (i0, jnp.int32(0),
                                               state))

    # undo the accumulated permutation
    _, rx, ry, rz = jax.lax.sort(
        (st["slot"], st["radiance"].x, st["radiance"].y, st["radiance"].z),
        num_keys=1,
    )
    return Vec3(rx, ry, rz), st["rays"]
