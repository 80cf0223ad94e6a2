"""Fused BVH traversal + leaf test as a Pallas TPU kernel.

Reference algorithm: ray_bvh_node_hit (raytracer.c:443-483) + the 8-wide
leaf test ray_triangles_hit_8 (raytracer.c:84-188), re-designed
level-synchronous for the TPU (no per-ray stacks, no data-dependent control
flow) with every per-ray table fetch expressed as a ONE-HOT MATMUL against
VMEM-resident tables. The MXU runs ~70x faster than the VPU and one-hot
selection is exact (1.0*x is exact, adding zeros is exact), so the fetches
that are HBM-latency-bound 512-byte row gathers in the XLA path
(docs/PERF.md) run at matmul speed here (measured in tools/mxu_probe.py).

Structure per ray tile (helmet.glb: depth 4):

  root slab (static row)                      ->  8 level-1 candidates
  fetch 8 node rows (one-hot, G=8)    + slab  -> 64 level-2 candidates
  select-8 -> fetch node rows (G~64)  + slab  -> 64 level-3 candidates
  select-8 -> fetch node rows (G~256) + slab  -> 64 leaf-block candidates
                                           (8 sibling blocks x 8 parents)
  rank parent groups by their nearest block (== greedy block-order group
  cover) -> fetch kp leaf super-rows (split-bf16, 1728 x G~256)
  Moller-Trumbore on kp*64 triangles  -> best (t, u, v, tri) + certificate

Escalation passes rerun the same kernel with wider selection (ksel=16
candidates per level) and more groups (kp up to 16) on a compacted suspect
buffer — see intersect_bvh_pallas_verified in ops/traverse.py.

Table compaction: the implicit complete tree pads to 8^depth leaf blocks,
so on helmet ~half of every table is empty slots. One-hot matmul cost is
G * fetched_floats per selection, so empty columns are pure waste: tables
keep only NONEMPTY nodes/groups, and each node row carries the COMPACT
column ids of its 8 children in lanes 48..55 (fetched together with the
boxes, so no extra lookup is ever needed). Canonical level-relative ids
still flow through selection for triangle-id reconstruction and the
certificate; compact ids are used only to address fetches.

Soundness:
- every one-hot fetch reconstructs the stored f32 values BIT-EXACTLY:
  fetched tables are stored as exact 3-plane truncated-bf16 splits
  (x = hi + mid + lo, 8+8+8 mantissa bits — see _split3/_fetch_split),
  so a single-pass bf16 matmul per plane reconstructs f32 exactly. The
  platform-default matmul on raw f32 tables is bf16-grade and corrupts
  both coordinates and integer ids (the round-3 hardware bug, see
  LEAF_PRECISION); Precision.HIGHEST is exact but costs 6 passes vs the
  split's 3;
- every candidate a selection drops contributes its EXACT f32 entry
  distance to `dropped_min` (via the in-place mask `_extract` leaves
  behind) — the same exactness certificate as
  intersect_bvh_topk(with_bound=True). Surface meshes produce constant
  near-ties between a hit and its neighbor boxes' entry distances, so even
  a 0.01% round-down in the certificate would flood the escalation with
  false suspects (measured: 10x the true suspect rate);
- found hits are genuine triangle intersections computed by the shared
  intersect.moller_trumbore formulas. On near-grazing hits (|det| ~ 1e-6
  relative to its operands) the f32 result carries the conditioning of the
  formula itself, so two schedulings of the same math can differ by ~0.1%
  there; tests tolerate exactly that class and nothing else.

Selection packs the candidate id into the low 13 mantissa bits of the
(non-negative) distance and compares as int32: for non-negative floats the
int order equals the float order, and the id bits make keys unique so the
min+mask extraction never collides. The rounded keys are used for RANKING
only; the certificate reads back exact distances.
"""

from __future__ import annotations

import functools
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracing_c_tpu import BVH_WIDTH, EPSILON
from raytracing_c_tpu.ops import intersect
from raytracing_c_tpu.utils.vec3 import Vec3

W = BVH_WIDTH  # 8
INF = float("inf")  # python literal: pallas kernels may not capture jnp consts

# finite sentinel for "no candidate": packs into the key without becoming
# inf/nan after the id bits are stuffed into the mantissa
BIG = float(np.float32(2.0e38))
BIG_BITS = int(np.float32(1.0e38).view(np.int32))  # validity threshold
MAXI = 0x7FFFFFFF

ID_BITS = 13  # level-relative ids: supports trees up to depth 5 (G=4096)
ID_MASK = (1 << ID_BITS) - 1

# node-table row layout: 48 box components + the 8 children's COMPACT ids
NROWS = 56

#: rays per grid step; tables are VMEM-resident across steps
R_TILE = 1024

#: precision for the few remaining f32-table one-hot fetches (gmap in the
#: attr kernel). Round 3 hardware finding (tools/tower_exact.py ->
#: /tmp/ray_hw2 probe): the platform DEFAULT matmul is bf16-grade
#: (measured 3.7e-3 relative error reconstructing a stored leaf row),
#: which (a) perturbs slab/MT inputs enough to flip a sliver-triangle hit
#: to a miss (t 2.429 -> 3.155 on a real tower ray, uncertified), and
#: (b) ROUNDS the integer ids >256 riding the node rows (child compact
#: columns, lanes 48..55) and gmap — silently fetching the wrong columns
#: on any table wider than 256. HIGHEST reconstructs f32 bit-exactly
#: (verified on-chip: max abs diff 0.0) but costs 6 MXU passes; the HOT
#: fetches therefore use 3-plane bf16 SPLIT tables (_split3 /
#: _fetch_split below): bit-exact by construction at 3x single-pass bf16
#: cost — half of HIGHEST. Exactness is an invariant: neither scheme is
#: tunable back to the platform default without a probe showing it became
#: exact.
LEAF_PRECISION = jax.lax.Precision.HIGHEST


class PallasTables(struct.PyTreeNode):
    """Precomputed, compacted traversal tables (derived from the scene;
    rebuilt on deserialization, never stored). `levels[l-1]` is the level-l
    node table (NROWS, Gc_l); `leaf` packs each nonempty level-(depth-1)
    node's 64 triangles component-major into one (576, Gc) column; `attr`
    packs the same 64 triangles' 25 shading attributes (scene.py ATTR_*)
    as rows c*64+pos; `gmap` row 0 maps canonical leaf-group ids to
    compact columns."""

    root: Any  # (NROWS, 128) f32 (static read)
    levels: Any  # [0]: (NROWS, G1) f32 static; [1:]: (3*NROWS, Gc) bf16 split
    leaf: Any  # depth 1: (576, 128) f32 static; else (3*576, Gc) bf16 split
    attr: Any  # (3*1600, Gc_leaf) bf16 split, or None (traced fallback)
    gmap: Any  # (8, G_canonical) f32, or None
    depth: int = struct.field(pytree_node=False)


def _iota(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _pack(dist, ids):
    """(dist, id) -> one int32 sort key. dist must be >= 0 (or +inf)."""
    d = jnp.minimum(dist, BIG)
    bits = jax.lax.bitcast_convert_type(d, jnp.int32)
    return (bits & ~ID_MASK) | ids


def _extract(keys, n, payload=None):
    """Pop the n smallest keys of a (C, R) int32 key array, one min-reduce
    per pop (the reference's nearest-first selection loop,
    raytracer.c:459-474, made rank-based). Returns ((n, R) keys, remaining)
    — plus the popped entries' (n, R) `payload` values when given (the
    pop's one-hot mask extracts them for free; a separate _match_select
    would recompute every mask). `payload` may be one (C, R) array or a
    tuple of them (each popped under the same mask). Valid keys are unique
    (id bits), so `== m` masks exactly one entry. `remaining` is the INPUT
    array with popped entries masked to MAXI in place, so callers can
    recover the un-rounded f32 distance of every unselected candidate (the
    exact certificate) by masking the original distances with
    `remaining != MAXI`."""
    single = payload is not None and not isinstance(payload, tuple)
    pls = (payload,) if single else (payload or ())
    sels = []
    pays = [[] for _ in pls]
    for _ in range(n):
        m = jnp.min(keys, axis=0, keepdims=True)
        sels.append(m)
        mask = keys == m
        for j, pl_ in enumerate(pls):
            pays[j].append(
                jnp.sum(jnp.where(mask, pl_, 0), axis=0, keepdims=True)
            )
        keys = jnp.where(mask, MAXI, keys)
    sel = jnp.concatenate(sels, axis=0)
    if payload is None:
        return sel, keys
    cat = tuple(jnp.concatenate(p, axis=0) for p in pays)
    return (sel, keys, cat[0]) if single else (sel, keys, cat)


#: tile-shared leaf/attr fetch. The per-lane one-hot fetch costs
#: rows x G x R MACs, but the MXU pads its contraction dim to 128 — so
#: on tables wider than 128 columns (helmet leaf: G=256) the same rows
#: can be staged through a per-tile shared buffer of <= 128 slots for
#: half the MACs: lanes in a tile want nearly identical groups (per-tile
#: unions: mean 7.6 / p95 21, tools/sah_probe.py), so the tile fetches
#: the UNION of its lanes' selected groups once (one rows x G x U
#: matmul, amortized over the tile) and each lane refetches from the
#: U-slot buffer at contraction 128. A lane whose group overflowed the
#: buffer (union > U, incoherent deep bounces) contributes that group's
#: EXACT entry distance to the certificate instead — the verified tiers
#: repair it, so hits stay oracle-exact. Auto-disabled when it cannot
#: win: G <= 128 tables (tower), wide repair passes (ksel > 8), bf16x3
#: tables. Default ON per the full-bench A/B (docs/PERF.md r4 wave 6):
#: helmet 9.60 -> 9.88 device Mrays/s, tower unchanged (gate inactive),
#: images bit-identical (hit lanes exact; only miss-lane junk u/v differ,
#: masked by every consumer).
SHARED = os.environ.get("RAYTPU_TIER0_SHARED", "1") == "1"

#: shared-buffer slots: the MXU contraction floor — fewer slots do not
#: shrink the refetch matmul, more would double it
SHARED_U = 128

#: tile-shared UNION Moller-Trumbore (the round-5 representation,
#: VERDICT r4 #1). SHARED staging still paid three per-lane costs the
#: MXU contraction floor cannot shrink: the kp refetch matmuls
#: (contraction 128), the int8x4 word assembly of every refetched
#: (576, R) plane set, and kp*64 MT tests per lane. stage_mt removes
#: all three: the tile stages its lanes' selected-group UNION into a
#: SMALL buffer of STAGE_MT_U slots, assembles it to f32 ONCE
#: ((576, U) elements, not (576, R)), and every lane runs
#: Moller-Trumbore directly against all U*64 staged triangles. The
#: union census (tools/union_probe.py, production pixel order,
#: 1024-ray kernel tiles at 1080p): helmet kp=4 unions mean 1.26 /
#: p99 7 / max 10 (U=8 covers 99.8% of tiles, 0.085% lane-want
#: overflow); tower max 5. Exactness is preserved by construction:
#: a selected group that overflows the buffer feeds its EXACT entry
#: distance to the certificate (repair tiers restore oracle equality),
#: and every lane now tests a SUPERSET of its own kp selection, so
#: unselected-but-staged groups are REMOVED from the certificate
#: (in-union credit) — suspect rates can only drop vs SHARED.
#: Reference analog: the per-ray nearest-first leaf recursion
#: (raytracer.c:443-483) executed once per tile instead of per lane.
STAGE_MT = os.environ.get("RAYTPU_TIER0_STAGEMT", "0") == "1"

#: union slots for stage_mt: every lane pays U*64 MT tests, so U is the
#: knob that trades shared-MT cost against certificate overflow; 8 per
#: the census above
STAGE_MT_U = int(os.environ.get("RAYTPU_TIER0_STAGEMT_U", "8"))

#: TILE-WAVEFRONT traversal (the round-5 representation, successor to
#: stage_mt per its measured marginals — docs/PERF.md r5 wave 1). The
#: per-lane path's cost is ~7.4 ms FIXED selection machinery + 1.0
#: ms/group (kp sweep); stage_mt only attacked the marginal. TW
#: amortizes the SELECTION itself per kernel tile: the tree is
#: descended once per tile — every level slabs ALL staged candidates
#: per lane (exactness needs the per-lane entry distances anyway),
#: ranks candidates by the tile-global (lane-min over active lanes)
#: entry key at width 1, stages the top-U node columns with ONE tiny
#: (U, G) one-hot matmul, and the leaf level runs MT per staged union
#: slot. Gone from the per-lane bill: the extraction pop chain, every
#: (G, R) one-hot build, every fetch matmul at R width, and the
#: (576, R) int8x4 word assemblies. Exactness is by construction:
#: candidates the tile ranks out contribute their per-lane EXACT f32
#: entry distances to the certificate (we slabbed them for every
#: lane), staged-but-farther groups are fully tested for every lane
#: (in-union credit), and the verified repair tiers restore oracle
#: equality for the rare lane whose private nearest candidate lost
#: the tile vote (camera tiles: unions mean 1.26 / p99 7,
#: tools/union_probe.py). Coherent (bounce-0) batches only — the
#: strip-layout probe measured 31.8% suspects on bounce-1 rays
#: (tools/stagemt_ab2.py); bounce rays stay per-lane.
#: Reference analog: ray_bvh_node_hit's nearest-first recursion
#: (raytracer.c:443-483) run once per 1024-ray tile.
TW = os.environ.get("RAYTPU_TIER0_TW", "0") == "1"

#: staged node slots per internal level (tile-global budget; the
#: per-lane path keeps ksel=8 PER LANE, TW keeps TW_U per TILE)
TW_U = int(os.environ.get("RAYTPU_TIER0_TW_U", "8"))

#: staged leaf-group slots: every lane pays TW_UL*64 MT tests, so UL
#: trades shared-MT cost against tile-vote truncation suspects. 6 per
#: the on-chip sweep (docs/PERF.md r5 wave 2): verified 10.82 ms/256k
#: vs 11.18 at UL=8; UL=5 is flat on the full bench but carries 0.84%
#: suspects vs 0.065% — the suspect-safe point wins (r4 ksel=6 lesson)
TW_UL = int(os.environ.get("RAYTPU_TIER0_TW_UL", "6"))


def _stage_union(tables, gcids, valid_rows, interp, u=None):
    """Stage the tile's UNION of wanted columns into <=u-slot buffers
    (see SHARED / STAGE_MT). gcids/valid_rows: (k, R) compact column ids
    and validity. Returns (bufs, sel_g): bufs[i] = (P_i, U) s8 staged copy
    of tables[i] restricted to the union; sel_g = (U, 1) i32 column id per
    slot (0 for empty slots, whose buffer columns are all-zero — adding
    zeros in a multi-hot refetch is exact).

    Per-lane consumption: ohs = (sel_g == gcids[k]) & valid_rows[k] is a
    (U, R) one-hot into the buffers; jnp.any(ohs, 0) tells whether the
    lane's column made the buffer (overflow lanes must fall back to the
    exactness certificate). Third return `nsel` = (1, 1) i32 count of
    union columns (slot s is filled iff s < nsel; overflow iff
    nsel > u)."""
    g = tables[0].shape[1]
    if u is None:
        u = SHARED_U
    kk = gcids.shape[0]
    r = gcids.shape[1]
    want = None
    for k in range(kk):
        wk = (_iota((g, r), 0) == gcids[k : k + 1]) \
            & valid_rows[k : k + 1]
        want = wk if want is None else (want | wk)
    present = jnp.max(want.astype(jnp.int32), axis=1, keepdims=True)
    # slot(g) = inclusive prefix count - 1; cumsum along sublanes is not
    # Mosaic-lowerable, so count via a lower-triangular s8 matmul (s32
    # accumulate is exact)
    tril = (_iota((g, g), 0) >= _iota((g, g), 1)).astype(jnp.int8)
    cnt = _dot_i8(tril, present > 0, interp)  # (g, 1) s32
    oh_sh = ((cnt - 1) == _iota((g, u), 1)) & (present > 0) & (cnt <= u)
    # each slot's column id, via a 2-byte s8 matmul (the platform
    # bf16-grade f32 matmul ROUNDS integers > 256 — the round-3 hardware
    # bug)
    cid_iota = _iota((g, 1), 0)
    lo = cid_iota & 0xFF
    lo = lo - ((lo >> 7) << 8)  # wrap to signed before the s8 cast
    cidb = jnp.concatenate([lo, cid_iota >> 8], axis=1).astype(jnp.int8)
    selb = jax.lax.dot_general(
        oh_sh.astype(jnp.float32 if interp else jnp.int8),
        cidb.astype(jnp.float32) if interp else cidb,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32 if interp else jnp.int32,
    ).astype(jnp.int32)
    sel_g = (selb[:, 0:1] & 0xFF) | (selb[:, 1:2] << 8)  # (u, 1)
    bufs = [
        _dot_i8(t, oh_sh, interp).astype(jnp.int8) for t in tables
    ]
    nsel = jnp.sum(present, axis=0, keepdims=True)  # (1, 1) union size
    return bufs, sel_g, nsel


def _slab48(rows, o, inv, tmax):
    """rows: (>=48, C) node row [component*8 + child] -> (8, C*R or R)
    entry distances via the shared slab test (raytracer.c:190-230)."""
    bmin = Vec3(rows[0:8], rows[8:16], rows[16:24])
    bmax = Vec3(rows[24:32], rows[32:40], rows[40:48])
    return intersect.aabb_slab(o, inv, bmin, bmax, EPSILON, tmax)


#: exact split-table format for the hot one-hot fetches:
#:   "bf16x3" — x = hi+mid+lo truncated-8-bit-mantissa bf16 planes; one
#:     single-pass bf16 matmul over 3x rows + 2 f32 adds. 3 pass-
#:     equivalents (vs HIGHEST's 6).
#:   "int8x4" — the RAW f32 BITS as 4 int8 byte planes, fetched with an
#:     s8 x s8 -> s32 matmul and reassembled by shifts + bitcast. Pure
#:     bit transport: exact for EVERY bit pattern, and the int8 MXU path
#:     runs 2x the bf16 MAC rate on v5e, so 4 planes cost 2 bf16-pass
#:     equivalents — the fastest exact fetch if Mosaic lowers s8 dots.
#: Baked into tables at build time; kernels infer the format from dtype.
#: Default int8x4 per the on-chip A/B (tools/split_ab.py, r3): verified
#: kp=4 camera pass 9.22 ms vs bf16x3's 10.22, fused-attr 11.43 vs
#: 13.59, wide ksel16/kp16 24.1 vs 28.1 — Mosaic does lower s8 dots at
#: the 2x rate, and both modes are fetch-bit-exact on hardware.
SPLIT_MODE = "int8x4"


def _fetch_split(table_ref, ids, interp: bool = False):
    """One-hot matmul row fetch from an exact SPLIT table (see SPLIT_MODE)
    -> the exact stored f32 rows (Wc, R).

    interp: running under pallas interpret mode (CPU tests) — upcast the
    planes to f32 and matmul in f32 (bit-equal: plane->f32 conversion is
    exact and the CPU f32 matmul is exact; XLA:CPU emulates bf16/int8
    matmuls an order of magnitude slower than f32).

    bf16x3 exactness: _split3 stores x = hi + mid + lo with TRUNCATED
    8-bit mantissa chunks (bits [0,8) + [8,16) + [16,24) of the f32
    mantissa), each exactly representable in bf16. In the matmul every
    product is value*1.0 or value*0.0 (exact), the MXU accumulates in
    f32, and hi+mid+lo re-sums exactly in f32 in ANY order (each partial
    sum spans <= 24 mantissa bits).

    int8x4 exactness: each plane carries one byte of the f32 bit pattern;
    byte*{0,1} products accumulate exactly in s32 and the shifts/ors
    reassemble the original word, bitcast back to f32."""
    g = table_ref.shape[1]
    r = ids.shape[-1]
    if table_ref.dtype == jnp.int8:
        oh = (_iota((g, r), 0) == ids)
        return _fetch_i8_oh(table_ref, oh, interp)
    w = table_ref.shape[0] // 3
    dt = jnp.float32 if interp else jnp.bfloat16
    oh = (_iota((g, r), 0) == ids).astype(dt)
    out = jax.lax.dot_general(
        table_ref[:].astype(dt), oh, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return out[:w] + out[w : 2 * w] + out[2 * w :]


def _dot_i8(table, oh, interp):
    """int8-plane one-hot matmul: (P, G) s8 table x (G, R) bool one-hot ->
    (P, R) s32 (each output element = one stored byte, exactly). Under
    interpret the planes upcast to f32 (exact: bytes in [-128, 127]; the
    CPU f32 matmul is exact and 10x faster than emulated s8)."""
    if interp:
        out = jax.lax.dot_general(
            table[:].astype(jnp.float32), oh.astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)
    else:
        out = jax.lax.dot_general(
            table[:], oh.astype(jnp.int8), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    return out


def _assemble_i8(buf):
    """(4P, U) s8 byte-plane buffer -> (P, U) f32 by exact bit transport
    (the word reassembly of _fetch_i8_oh without a matmul — used by the
    stage_mt path, where the union buffer is assembled ONCE per tile
    instead of once per refetched (P, R) lane plane set)."""
    b = buf.astype(jnp.int32)
    w = buf.shape[0] // 4
    word = (
        (b[:w] & 0xFF)
        | ((b[w : 2 * w] & 0xFF) << 8)
        | ((b[2 * w : 3 * w] & 0xFF) << 16)
        | (b[3 * w :] << 24)
    )
    return jax.lax.bitcast_convert_type(word, jnp.float32)


def _fetch_i8_oh(table, oh, interp):
    """int8x4 fetch core from an explicit (G, R) bool one-hot: 4-plane s8
    matmul + word reassembly -> exact stored f32 rows. oh may have MULTIPLE
    hot entries per lane only if the extra columns are all-zero (adding
    zeros is exact — the shared-buffer empty-slot case)."""
    w = table.shape[0] // 4
    out = _dot_i8(table, oh, interp)
    word = (
        (out[:w] & 0xFF)
        | ((out[w : 2 * w] & 0xFF) << 8)
        | ((out[2 * w : 3 * w] & 0xFF) << 16)
        | (out[3 * w :] << 24)
    )
    return jax.lax.bitcast_convert_type(word, jnp.float32)


def _dot_i8_nt(table, oh_ug, interp):
    """int8-plane one-hot matmul contracting the table's COLUMN axis:
    (P, G) s8 x (U, G) bool -> (P, U) s32 (out[p, u] = the stored byte of
    column sel[u] — exact, same argument as _dot_i8). The (U, G) one-hot
    orientation avoids ever transposing slot metadata into lanes: it is
    built directly from (U, 1) sublane-resident column ids via
    iota((U, G), 1) == ids."""
    if interp:
        out = jax.lax.dot_general(
            table[:].astype(jnp.float32), oh_ug.astype(jnp.float32),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)
    else:
        out = jax.lax.dot_general(
            table[:], oh_ug.astype(jnp.int8), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    return out


def _fetch_i8_cols(table, oh_ug, interp):
    """Fetch whole int8x4 table COLUMNS into a small f32 buffer via a
    (U, G) one-hot: _dot_i8_nt + the word reassembly of _fetch_i8_oh ->
    (P, U) exact stored f32. Dead one-hot rows yield all-zero columns
    (consumers mask by slot liveness)."""
    w = table.shape[0] // 4
    out = _dot_i8_nt(table, oh_ug, interp)
    word = (
        (out[:w] & 0xFF)
        | ((out[w : 2 * w] & 0xFF) << 8)
        | ((out[2 * w : 3 * w] & 0xFF) << 16)
        | (out[3 * w :] << 24)
    )
    return jax.lax.bitcast_convert_type(word, jnp.float32)


def _split3(x: np.ndarray) -> np.ndarray:
    """Split an f32 table into its exact split representation (SPLIT_MODE),
    stacked along rows: (R, C) f32 -> (3R, C) bf16 or (4R, C) int8 with
    the planes reconstructing x bit-exactly (see _fetch_split)."""
    x = np.ascontiguousarray(np.asarray(x, np.float32))
    if SPLIT_MODE == "int8x4":
        b = x.view(np.uint32)
        planes = [((b >> (8 * k)) & 0xFF).astype(np.uint8) for k in range(4)]
        return np.concatenate(planes, axis=0).view(np.int8)
    m = np.uint32(0xFFFF0000)  # truncate-to-bf16 mask (top 8 mantissa bits)
    hi = (x.view(np.uint32) & m).view(np.float32)
    r1 = x - hi
    mid = (r1.view(np.uint32) & m).view(np.float32)
    lo = r1 - mid
    # truncation leaves <= 8 significant bits in lo, so it is exactly
    # bf16-representable unless a value is subnormal/non-finite (tables
    # never hold either: boxes are +/-EPSILON padded, empty slots are 0)
    chk = (lo.view(np.uint32) & m).view(np.float32)
    assert np.array_equal(chk, lo) and np.isfinite(x).all(), (
        "table value not exactly 3-plane-bf16 splittable (subnormal/inf?)"
    )
    return np.concatenate([hi, mid, lo], axis=0).astype(jnp.bfloat16)


def _split_any(x):
    """_split3 for whatever build_tables gets handed: concrete arrays go
    through the HOST splitter (keeping its exactness assert); only true
    tracers take the unguarded traced form."""
    if isinstance(x, jax.core.Tracer):
        return _split3_traced(x)
    return jnp.asarray(_split3(np.asarray(x)))


def _split3_traced(x):
    """Traced (jnp) form of _split3 for the uncompacted fallback build
    under tracing. CAVEAT: no exactness guard is possible at trace time —
    a table value whose low plane is bf16-subnormal (|x| ~< 2^-110) or
    non-finite would split lossily and silently; _split3's assert rejects
    those on every concrete path (geometry at that scale does not occur,
    and empty slots are exact zeros)."""
    if SPLIT_MODE == "int8x4":
        b = jax.lax.bitcast_convert_type(x, jnp.uint32)
        planes = [
            ((b >> (8 * k)) & 0xFF).astype(jnp.uint8).view(jnp.int8)
            for k in range(4)
        ]
        return jnp.concatenate(planes, axis=0)
    m = jnp.uint32(0xFFFF0000)
    b = jax.lax.bitcast_convert_type(x, jnp.uint32)
    hi = jax.lax.bitcast_convert_type(b & m, jnp.float32)
    r1 = x - hi
    b1 = jax.lax.bitcast_convert_type(r1, jnp.uint32)
    mid = jax.lax.bitcast_convert_type(b1 & m, jnp.float32)
    lo = r1 - mid
    return jnp.concatenate([hi, mid, lo], axis=0).astype(jnp.bfloat16)


def _traverse_kernel(depth, ksel, kp, interp, fuse, shared, smt, tw,
                     rays_ref, root_ref, *refs):
    """The kernel body. refs = node level tables (levels 1..depth-1),
    leaf super table, [gmap when fuse or smt], [attr when fuse], out_ref.
    ksel = candidates kept per level; kp = leaf groups fetched; interp =
    interpret mode (see _fetch_split); fuse = interpolate the winner's
    shading attributes in-kernel (_interp_attrs) — one dispatch per
    bounce instead of two, and the hit planes never round-trip HBM
    between them; smt = tile-shared union Moller-Trumbore (STAGE_MT).

    (Round-4 scheduling experiments removed in r5: the `halves`
    round-robin sub-tile driver measured a NO-OP — Mosaic serializes
    MXU/VPU regardless of independent work — and the per-parent SELMODE
    is unusable in production, suspect rate 9%->69%. docs/PERF.md round 4
    keeps the writeups.)"""
    node_refs = refs[: depth - 1]
    leaf_ref = refs[depth - 1]
    i = depth
    gmap_ref = attr_ref = None
    if fuse or smt:
        gmap_ref = refs[i]
        i += 1
    if fuse:
        attr_ref = refs[i]
        i += 1
    out_ref = refs[i]

    if tw:
        out_ref[:] = _traverse_stages_tw(
            depth, TW_U, TW_UL, interp, fuse, rays_ref[:, :],
            root_ref, node_refs, leaf_ref, gmap_ref, attr_ref,
        )
    else:
        out_ref[:] = _traverse_stages(
            depth, ksel, kp, interp, fuse, shared, smt, rays_ref[:, :],
            root_ref, node_refs, leaf_ref, gmap_ref, attr_ref,
        )


def _traverse_stages(depth, ksel, kp, interp, fuse, shared, smt, rays,
                     root_ref, node_refs, leaf_ref, gmap_ref, attr_ref):
    """The level-synchronous traversal body over one ray tile.
    Returns the (8 or 24, r) output rows."""
    r = rays.shape[1]
    o = Vec3(rays[0:1, :], rays[1:2, :], rays[2:3, :])
    d = Vec3(rays[3:4, :], rays[4:5, :], rays[5:6, :])
    act = rays[6:7, :] > 0.0
    tmax = rays[7:8, :]  # per-ray pruning bound (INF by default)
    inv = Vec3(1.0 / d.x, 1.0 / d.y, 1.0 / d.z)

    # --- root: static row, children are the level-1 candidates -------------
    root_rows = root_ref[:, 0:1].astype(jnp.float32)  # (NROWS, 1)
    cand_d = jnp.where(act, _slab48(root_rows, o, inv, tmax), INF)  # (8, R)
    cand_id = jnp.broadcast_to(_iota((W, 1), 0), (W, r))
    cand_cid = jnp.broadcast_to(
        root_rows[48:56].astype(jnp.int32), (W, r)
    )

    dropped = jnp.full((1, r), INF)

    # --- internal levels ----------------------------------------------------
    for li in range(depth - 1):
        if li == 0:
            # Level 1: all 8 root children expand (ksel >= 8), and their
            # table columns are STATIC (level-1 compaction is forced to the
            # identity), so each fetch is a static column read — no one-hot
            # matmul, and no lane-replicated dynamic index for Mosaic to
            # lower as an unsupported both-axis broadcast.
            last = depth == 2
            valid = jnp.isfinite(cand_d)
            new_d, new_id, new_cid = [], [], []
            for k in range(W):
                rows = node_refs[0][:, k : k + 1]  # (NROWS, 1) static
                d8 = _slab48(rows, o, inv, tmax)  # (8, R) via broadcast
                new_d.append(jnp.where(valid[k : k + 1], d8, INF))
                new_id.append(
                    jnp.broadcast_to(_iota((W, 1), 0) + k * W, (W, r))
                )
                if last:
                    # children are blocks; leaf super col = parent col = k
                    new_cid.append(jnp.full((W, r), k, jnp.int32))
                else:
                    new_cid.append(
                        jnp.broadcast_to(
                            rows[48:56].astype(jnp.int32), (W, r)
                        )
                    )
            cand_d = jnp.concatenate(new_d, axis=0)
            cand_id = jnp.concatenate(new_id, axis=0)
            cand_cid = jnp.concatenate(new_cid, axis=0)
            continue

        n = min(ksel, cand_d.shape[0])
        keys = _pack(cand_d, cand_id)
        # node tables wider than the 128-lane contraction floor stage
        # through the same union buffer as the leaf phase (helmet's
        # level-3 table is 256 wide: 8 fetches/lane at half the MACs)
        stage_nodes = (
            shared and ksel <= W
            and node_refs[li].dtype == jnp.int8
            and node_refs[li].shape[1] > SHARED_U
        )
        sel_dist = None
        if stage_nodes:
            sel, rem, (sel_cid, sel_dist) = _extract(
                keys, n, payload=(cand_cid, cand_d)
            )
        else:
            sel, rem, sel_cid = _extract(keys, n, payload=cand_cid)
        # certificate from the EXACT f32 distances of the unselected
        # candidates (decoding the rounded keys instead costs ~0.01%
        # round-down, which near-ties on surface meshes trip constantly)
        dropped = jnp.minimum(
            dropped,
            jnp.min(
                jnp.where(rem != MAXI, cand_d, INF),
                axis=0, keepdims=True,
            ),
        )
        sel_ids = sel & ID_MASK  # (n, R)
        sel_valid = sel < BIG_BITS

        node_buf = node_selg = None
        if stage_nodes:
            (node_buf,), node_selg, _ = _stage_union(
                [node_refs[li]], sel_cid, sel_valid, interp
            )

        last = li == depth - 2
        new_d, new_id, new_cid = [], [], []
        for k in range(sel_ids.shape[0]):
            valid_k = sel_valid[k : k + 1]
            if stage_nodes:
                ohs = (node_selg == sel_cid[k : k + 1]) & valid_k
                in_buf = jnp.any(ohs, axis=0, keepdims=True)
                rows = _fetch_i8_oh(node_buf, ohs, interp)  # (NROWS, R)
                # a selected node that overflowed the buffer is dropped
                # with its EXACT entry distance (certificate -> repair)
                dropped = jnp.minimum(
                    dropped,
                    jnp.where(valid_k & ~in_buf, sel_dist[k : k + 1], INF),
                )
                valid_k = valid_k & in_buf
            else:
                rows = _fetch_split(
                    node_refs[li], sel_cid[k : k + 1], interp
                )  # (NROWS, R)
            d8 = _slab48(rows, o, inv, tmax)  # (8, R)
            new_d.append(jnp.where(valid_k, d8, INF))
            new_id.append(sel_ids[k : k + 1] * W + _iota((W, 1), 0))
            if last:
                # children are leaf blocks; their super-row lives at the
                # PARENT's compact column
                new_cid.append(
                    jnp.broadcast_to(sel_cid[k : k + 1], (W, r))
                )
            else:
                new_cid.append(rows[48:56].astype(jnp.int32))
        cand_d = jnp.concatenate(new_d, axis=0)  # (8*ksel, R)
        cand_id = jnp.concatenate(new_id, axis=0)
        cand_cid = jnp.concatenate(new_cid, axis=0)

    # cand_* now hold leaf BLOCK candidates (rel id = parent_rel*8 + sib),
    # cand_cid the compact leaf-super column of each block's parent

    # --- leaf phase ----------------------------------------------------------
    shared_ctx = None
    if depth == 1:
        # single group: the root's children ARE the blocks (scene.c:224-233
        # clamped to depth >= 1 — see models/bvh.py). Static fetch.
        f = jnp.broadcast_to(leaf_ref[:, 0:1], (leaf_ref.shape[0], r))
        zero_cid = jnp.zeros((1, r), jnp.int32)
        groups = [(f, zero_cid, act, zero_cid)]
    else:
        # Rank whole PARENT GROUPS by their nearest block. This equals the
        # previous block-rank + greedy-group-cover selection: greedy
        # coverage visits blocks in distance order and fetches each new
        # block's group, so the fetched-group sequence IS the distinct
        # groups ordered by their own minimum block key — and ranking
        # n_par group rows costs (n_par, R) work instead of pops +
        # match-selects over the (8*n_par, R) block array. When the top
        # blocks cluster into fewer than kp groups this fetches MORE
        # distinct groups than the cover did (it ran out of ranked
        # blocks), so coverage is never worse. Certificate: every block
        # of every UNfetched group contributes its exact f32 entry
        # distance via the group minimum.
        n_par = cand_d.shape[0] // W
        gmin_d = jnp.concatenate(
            [
                jnp.min(cand_d[p * W : (p + 1) * W], axis=0, keepdims=True)
                for p in range(n_par)
            ],
            axis=0,
        )  # (n_par, R) exact min entry distance per parent group
        # parent canonical rel id (= any child block id >> 3) and compact
        # leaf column, one row per parent (rows are per-parent broadcasts)
        pgrel = jnp.concatenate(
            [cand_id[p * W : p * W + 1] >> 3 for p in range(n_par)], axis=0
        )
        pgcid = jnp.concatenate(
            [cand_cid[p * W : p * W + 1] for p in range(n_par)], axis=0
        )
        gkeys = _pack(gmin_d, pgrel)
        # stage_mt (union MT, see STAGE_MT) needs int8x4 tables, the
        # canonical-id map (gmap row 1), and a narrow pass — the wide
        # (ksel>8) repair unions blow the small slot buffer constantly
        use_stage_mt = (
            smt and ksel <= W and leaf_ref.dtype == jnp.int8
            and gmap_ref is not None
        )
        # shared-buffer staging wins only when the leaf table is wider
        # than the 128-lane MXU contraction floor, on int8x4 tables, and
        # never for the wide (ksel>8) repair passes whose unions blow up
        use_shared = not use_stage_mt and (
            shared and ksel <= W and leaf_ref.dtype == jnp.int8
            and leaf_ref.shape[1] > SHARED_U
        )
        if use_shared or use_stage_mt:
            sel, grem, (gcids, gdist) = _extract(
                gkeys, min(kp, n_par), payload=(pgcid, gmin_d)
            )
        else:
            sel, grem, gcids = _extract(
                gkeys, min(kp, n_par), payload=pgcid
            )

        if not use_stage_mt:
            dropped = jnp.minimum(
                dropped,
                jnp.min(
                    jnp.where(grem != MAXI, gmin_d, INF),
                    axis=0, keepdims=True,
                ),
            )

        groups = []
        if use_stage_mt:
            u_mt = STAGE_MT_U
            kk = sel.shape[0]
            valid_rows = sel < BIG_BITS  # (kk, R)
            tabs = [leaf_ref] + ([attr_ref] if fuse else [])
            bufs, sel_g, nsel = _stage_union(
                tabs, gcids, valid_rows, interp, u=u_mt
            )
            # the whole union assembles to f32 ONCE — (576, U) elements,
            # vs the per-lane path's (576, R) words per refetched group
            leaf_f = _assemble_i8(bufs[0])  # (576, u_mt) f32
            attr_buf = bufs[1] if fuse else None
            shared_ctx = (sel_g, attr_buf)
            slot_live = _iota((u_mt, 1), 0) < nsel  # (u_mt, 1)

            # a selected group that overflowed the slot buffer joins the
            # certificate with its EXACT entry distance (repair restores
            # oracle equality — same contract as SHARED overflow)
            for k in range(kk):
                in_buf = jnp.any(
                    (sel_g == gcids[k : k + 1]) & slot_live,
                    axis=0, keepdims=True,
                )
                dropped = jnp.minimum(
                    dropped,
                    jnp.where(
                        valid_rows[k : k + 1] & ~in_buf,
                        gdist[k : k + 1], INF,
                    ),
                )
            # in-union credit: every staged group is FULLY tested for
            # every lane below, so an unselected parent that made the
            # buffer leaves this lane's certificate — it cannot hide a
            # missed hit. Suspect rates only drop vs the per-lane path.
            unc = []
            for p in range(n_par):
                cov = jnp.any(
                    (sel_g == pgcid[p : p + 1]) & slot_live,
                    axis=0, keepdims=True,
                )
                unc.append(
                    jnp.where(
                        (grem[p : p + 1] != MAXI) & ~cov,
                        gmin_d[p : p + 1], INF,
                    )
                )
            dropped = jnp.minimum(
                dropped,
                jnp.min(jnp.concatenate(unc, axis=0), axis=0,
                        keepdims=True),
            )

            # canonical rel id per slot: gmap row 1 maps canonical group
            # -> compact column (or -1 for empty canonical slots, and in
            # the padding), so the slot's canonical id is the (unique
            # nonempty) minimum canonical index mapping to its column.
            # Static f32 row reads — no matmul, no precision caveat.
            g_can = gmap_ref.shape[1]
            match = gmap_ref[1:2, :] == sel_g.astype(jnp.float32)
            slot_grel = jnp.min(
                jnp.where(match, _iota((u_mt, g_can), 1), MAXI),
                axis=1, keepdims=True,
            )  # (u_mt, 1)

            # every lane tests every staged slot: (f, grel, gval, gcid)
            # broadcast through the unchanged MT/winner loops below
            for s in range(u_mt):
                groups.append((
                    leaf_f[:, s : s + 1],
                    slot_grel[s : s + 1],
                    slot_live[s : s + 1] & act,
                    sel_g[s : s + 1],
                ))
        elif use_shared:
            kk = sel.shape[0]
            valid_rows = sel < BIG_BITS  # (kk, R)
            tabs = [leaf_ref] + ([attr_ref] if fuse else [])
            bufs, sel_g, _ = _stage_union(
                tabs, gcids, valid_rows, interp
            )
            leaf_buf = bufs[0]
            attr_buf = bufs[1] if fuse else None
            shared_ctx = (sel_g, attr_buf)

            for k in range(kk):
                row = sel[k : k + 1]
                grel = row & ID_MASK
                gcid = gcids[k : k + 1]
                ohs = (sel_g == gcid) & valid_rows[k : k + 1]  # (u, R)
                in_buf = jnp.any(ohs, axis=0, keepdims=True)
                # refetch from the buffer at contraction u (multi-hot only
                # on all-zero empty-slot columns — exact, see _fetch_i8_oh)
                f = _fetch_i8_oh(leaf_buf, ohs, interp)  # (576, R)
                has = valid_rows[k : k + 1] & in_buf
                # a wanted group that overflowed the buffer joins the
                # certificate with its EXACT entry distance instead
                dropped = jnp.minimum(
                    dropped,
                    jnp.where(
                        valid_rows[k : k + 1] & ~in_buf,
                        gdist[k : k + 1], INF,
                    ),
                )
                groups.append((f, grel, has, gcid))
        else:
            for k in range(sel.shape[0]):
                row = sel[k : k + 1]
                has = row < BIG_BITS
                grel = row & ID_MASK
                gcid = gcids[k : k + 1]
                f = _fetch_split(leaf_ref, gcid, interp)  # (576, R)
                groups.append((f, grel, has, gcid))

    return _mt_tail(depth, interp, fuse, o, d, r, groups, dropped,
                    shared_ctx, gmap_ref, attr_ref)


def _mt_tail(depth, interp, fuse, o, d, r, groups, dropped, shared_ctx,
             gmap_ref, attr_ref):
    """Shared Moller-Trumbore + winner-select + fused-attr tail. `groups`
    entries are (f, grel, gval, gcid): (576, 1 or R) triangle planes, the
    group's canonical rel id ((1, 1) tile-uniform or (1, R) per-lane),
    the per-lane test mask, and the compact attr column — both the
    per-lane/stage_mt path and the tile-wavefront path feed it."""
    best_t = jnp.full((1, r), INF)
    best_tri = jnp.full((1, r), MAXI, jnp.int32)
    best_u = jnp.zeros((1, r), jnp.float32)
    best_v = jnp.zeros((1, r), jnp.float32)
    tri_iota = _iota((W * W, 1), 0)
    for f, grel, gval, _gcid in groups:
        v0 = Vec3(f[0:64], f[64:128], f[128:192])
        e1 = Vec3(f[192:256], f[256:320], f[320:384])
        e2 = Vec3(f[384:448], f[448:512], f[512:576])
        t, u, v = intersect.moller_trumbore(o, d, v0, e1, e2)  # (64, R)
        t = jnp.where(gval, t, INF)
        tri = grel * (W * W) + tri_iota  # (64, R)

        tmin = jnp.min(t, axis=0, keepdims=True)
        is_min = t == tmin
        tri_min = jnp.min(
            jnp.where(is_min, tri, MAXI), axis=0, keepdims=True
        )
        pick = is_min & (tri == tri_min)
        u_sel = jnp.sum(jnp.where(pick, u, 0.0), axis=0, keepdims=True)
        v_sel = jnp.sum(jnp.where(pick, v, 0.0), axis=0, keepdims=True)

        # nearer-t wins; ties pick the lower triangle id (the oracle's
        # argmin-first-index rule)
        better = (tmin < best_t) | ((tmin == best_t) & (tri_min < best_tri))
        best_u = jnp.where(better, u_sel, best_u)
        best_v = jnp.where(better, v_sel, best_v)
        best_tri = jnp.where(better, tri_min, best_tri)
        best_t = jnp.where(better, tmin, best_t)

    hit_rows = jnp.concatenate(
        [
            best_t,
            best_u,
            best_v,
            best_tri.astype(jnp.float32),
            dropped,
            jnp.zeros((3, r), jnp.float32),
        ],
        axis=0,
    )
    if fuse:
        # the winner's compact attr column is in hand: its group is one
        # of the just-fetched kp groups — match its canonical rel id
        # instead of paying the gmap one-hot over all canonical groups
        # (miss lanes match nothing -> column 0, masked downstream)
        wg = best_tri >> 6
        win_cid = jnp.zeros_like(wg)
        for _f, grel, has, gcid in groups:
            win_cid = jnp.where((grel == wg) & has, gcid, win_cid)
        cols = None
        if shared_ctx is not None:
            # the winner's group is one of the just-staged buffer slots
            # (only has=in-buffer groups can win) — refetch its attr rows
            # at contraction u instead of the full-width attr table.
            # Miss lanes (win_cid 0) match group-0's slot or all-zero
            # empty slots; either way downstream masks them.
            sel_g, attr_buf = shared_ctx
            oh_win = sel_g == win_cid
            cols = _fetch_i8_oh(attr_buf, oh_win, interp)
        attrs = _interp_attrs(
            depth, interp, gmap_ref, attr_ref,
            jnp.maximum(best_tri, 0), best_u, best_v, cid=win_cid,
            cols=cols,
        )
        return jnp.concatenate([hit_rows, attrs], axis=0)
    return hit_rows


def _srow(x, i):
    """Extract row i of a small (C, L) int/f32 array as (1, L) with a
    masked sum instead of a slice: slices carry their sublane offset in
    the Mosaic layout and tpu.concatenate refuses to stitch
    differently-offset pieces ('result/input offset mismatch on
    non-concat dimension'); a reduction lands at offset 0. Exact: one
    mask row is 1, the rest contribute 0."""
    return jnp.sum(
        jnp.where(_iota(x.shape, 0) == i, x, 0), axis=0, keepdims=True
    )


def _scol(x, s):
    """Column s of a small (P, U) int array as (P, 1), by masked sum —
    same Mosaic lane-offset canonicalization as _srow."""
    return jnp.sum(
        jnp.where(_iota(x.shape, 1) == s, x, 0), axis=1, keepdims=True
    )


def _traverse_stages_tw(depth, u_node, u_leaf, interp, fuse, rays,
                        root_ref, node_refs, leaf_ref, gmap_ref, attr_ref):
    """Tile-wavefront traversal body (see the TW comment): the tree is
    descended ONCE per ray tile. Per level: slab every staged candidate
    for every lane (per-lane exact entry distances — the certificate's
    raw material), rank candidates by the tile-global lane-min entry key
    at width 1 (_extract on (C, 1) — the pop chain the per-lane path runs
    at (C, R) width), stage the top-u_node survivors' node columns with
    one (U, G) one-hot matmul, expand their children. The leaf level
    stages the top-u_leaf groups the same way and feeds the shared
    _mt_tail — every lane tests every staged slot.

    Certificate: a candidate ranked out at any level contributes its
    per-lane EXACT f32 entry distance to `dropped` (INF on lanes that
    miss it, so only lanes it could actually affect become suspects);
    staged groups are fully tested for every lane. Children of a staged
    node need no validity cascade: child boxes are contained in their
    parent (bvh.c union build), so a lane missing the parent slabs the
    child to INF on its own, and t_max-pruned parents bound their
    children's entries the same way."""
    r = rays.shape[1]
    o = Vec3(rays[0:1, :], rays[1:2, :], rays[2:3, :])
    d = Vec3(rays[3:4, :], rays[4:5, :], rays[5:6, :])
    act = rays[6:7, :] > 0.0
    tmax = rays[7:8, :]
    inv = Vec3(1.0 / d.x, 1.0 / d.y, 1.0 / d.z)

    root_rows = root_ref[:, 0:1].astype(jnp.float32)
    cand_d = jnp.where(act, _slab48(root_rows, o, inv, tmax), INF)  # (8, R)
    cand_id = _iota((W, 1), 0)  # (8, 1) tile-uniform metadata
    cand_cid = root_rows[48:56].astype(jnp.int32)  # (8, 1)

    dropped = jnp.full((1, r), INF)

    for li in range(depth - 1):
        if li == 0:
            # all 8 root children expand; static column reads (level-1
            # compaction is the identity) — same as the per-lane path but
            # with (C, 1) tile-uniform ids
            last = depth == 2
            valid = jnp.isfinite(cand_d)
            l1_cid = node_refs[0][48:56].astype(jnp.int32)  # (8, G1)
            new_d, new_id, new_cid = [], [], []
            for k in range(W):
                rows = node_refs[0][:, k : k + 1]
                d8 = _slab48(rows, o, inv, tmax)
                new_d.append(jnp.where(valid[k : k + 1], d8, INF))
                new_id.append(_iota((W, 1), 0) + k * W)
                if last:
                    new_cid.append(jnp.full((W, 1), k, jnp.int32))
                else:
                    # _scol: masked-sum column extract — a plain column
                    # slice carries its lane offset into the concat below,
                    # which Mosaic's tpu.concatenate rejects
                    new_cid.append(_scol(l1_cid, k))
            cand_d = jnp.concatenate(new_d, axis=0)  # (64, R)
            cand_id = jnp.concatenate(new_id, axis=0)  # (64, 1)
            cand_cid = jnp.concatenate(new_cid, axis=0)
            continue

        # --- tile-global node selection --------------------------------
        c = cand_d.shape[0]
        u = min(u_node, c)
        tile_d = jnp.min(jnp.where(act, cand_d, INF), axis=1,
                         keepdims=True)  # (C, 1)
        keys = _pack(tile_d, _iota((c, 1), 0))
        sel, rem, (s_cid, s_rel) = _extract(
            keys, u, payload=(cand_cid, cand_id)
        )
        # ranked-out candidates: per-lane exact entry -> certificate
        dropped = jnp.minimum(
            dropped,
            jnp.min(
                jnp.where(rem != MAXI, cand_d, INF),
                axis=0, keepdims=True,
            ),
        )
        slot_live = sel < BIG_BITS  # (u, 1)
        g = node_refs[li].shape[1]
        oh_ug = (_iota((u, g), 1) == s_cid) & slot_live
        nbuf = _fetch_i8_cols(node_refs[li], oh_ug, interp)  # (NROWS, u)

        last = li == depth - 2
        child_cid = nbuf[48:56].astype(jnp.int32)  # (8, u)
        new_d, new_id, new_cid = [], [], []
        for s in range(u):
            rows = nbuf[:, s : s + 1]  # (NROWS, 1)
            d8 = _slab48(rows, o, inv, tmax)  # (8, R)
            new_d.append(
                jnp.where(_srow(slot_live.astype(jnp.int32), s) > 0,
                          d8, INF)
            )
            new_id.append(_srow(s_rel, s) * W + _iota((W, 1), 0))
            if last:
                new_cid.append(
                    jnp.broadcast_to(_srow(s_cid, s), (W, 1))
                )
            else:
                new_cid.append(_scol(child_cid, s))
        cand_d = jnp.concatenate(new_d, axis=0)  # (8u, R)
        cand_id = jnp.concatenate(new_id, axis=0)
        cand_cid = jnp.concatenate(new_cid, axis=0)

    # --- leaf phase: tile-global group selection + union staging -------
    n_par = cand_d.shape[0] // W
    gmin_d = jnp.concatenate(
        [
            jnp.min(cand_d[p * W : (p + 1) * W], axis=0, keepdims=True)
            for p in range(n_par)
        ],
        axis=0,
    )  # (n_par, R) exact min entry distance per parent group, per lane
    pgrel = jnp.concatenate(
        [_srow(cand_id, p * W) >> 3 for p in range(n_par)], axis=0
    )
    pgcid = jnp.concatenate(
        [_srow(cand_cid, p * W) for p in range(n_par)], axis=0
    )
    ul = min(u_leaf, n_par)
    tile_g = jnp.min(jnp.where(act, gmin_d, INF), axis=1, keepdims=True)
    gkeys = _pack(tile_g, _iota((n_par, 1), 0))
    sel, rem, (s_gcid, s_grel) = _extract(
        gkeys, ul, payload=(pgcid, pgrel)
    )
    dropped = jnp.minimum(
        dropped,
        jnp.min(
            jnp.where(rem != MAXI, gmin_d, INF), axis=0, keepdims=True
        ),
    )
    slot_live = sel < BIG_BITS  # (ul, 1)
    g = leaf_ref.shape[1]
    oh_ug = (_iota((ul, g), 1) == s_gcid) & slot_live
    leaf_f = _fetch_i8_cols(leaf_ref, oh_ug, interp)  # (576, ul) f32
    shared_ctx = None
    if fuse:
        attr_buf = _dot_i8_nt(attr_ref, oh_ug, interp).astype(jnp.int8)
        # dead slots carry garbage ids from the exhausted-pop payload
        # sum, but their buffer columns are all-zero (oh_ug row masked):
        # a multi-hot match in the win refetch adds zeros — exact
        shared_ctx = (s_gcid, attr_buf)

    groups = [
        (
            leaf_f[:, s : s + 1],
            _srow(s_grel, s),
            (_srow(slot_live.astype(jnp.int32), s) > 0) & act,
            _srow(s_gcid, s),
        )
        for s in range(ul)
    ]
    dropped = jnp.where(act, dropped, INF)
    return _mt_tail(depth, interp, fuse, o, d, r, groups, dropped,
                    shared_ctx, gmap_ref, attr_ref)


def _round_up(n, m=128):
    return max(((n + m - 1) // m) * m, m)


def _level_offset(lvl):
    return (W**lvl - 1) // (W - 1)


def build_tables_host(nodes, leaf_rows, depth, attr_rows=None) -> PallasTables:
    """Compacted table build (host numpy, once per scene — build_scene and
    the scene-cache loader both call this).

    A node is nonempty iff its row carries any box data (real boxes are
    +/-EPSILON padded so they are never all-zero, scene.c:177-188); empty
    canonical slots map to compact column 0, which is only ever fetched
    under an invalid selection mask."""
    nodes = np.asarray(nodes, np.float32)
    leaf_rows = np.asarray(leaf_rows, np.float32)

    keep, cmap = {}, {}
    for lvl in range(1, depth):
        s, g = _level_offset(lvl), W**lvl
        if lvl == 1:
            # level 1 stays identity: the kernel reads its 8 columns
            # statically (no one-hot), so canonical slot == column
            keep[lvl] = np.arange(g)
        else:
            ne = np.abs(nodes[s : s + g, : 6 * W]).max(axis=1) > 0
            keep[lvl] = np.nonzero(ne)[0]
        cm = np.zeros(g, np.int64)
        cm[keep[lvl]] = np.arange(len(keep[lvl]))
        cmap[lvl] = cm

    root = np.zeros((NROWS, 128), np.float32)
    root[: 6 * W, 0] = nodes[0, : 6 * W]
    if depth > 1:
        root[48:56, 0] = cmap[1][:W]

    levels = []
    for lvl in range(1, depth):
        idx = keep[lvl]
        t = np.zeros((NROWS, _round_up(len(idx))), np.float32)
        t[: 6 * W, : len(idx)] = nodes[_level_offset(lvl) + idx, : 6 * W].T
        if lvl + 1 < depth:
            ch = idx[:, None] * W + np.arange(W)[None, :]
            t[48:56, : len(idx)] = cmap[lvl + 1][ch].T
        # level 1 is read statically (no matmul) -> plain f32; deeper
        # levels are one-hot fetched -> exact 3-plane bf16 split
        levels.append(jnp.asarray(t if lvl == 1 else _split3(t)))

    # leaf super table: columns = compact level-(depth-1) ids
    n_groups = max(leaf_rows.shape[0] // W, 1)
    lr = leaf_rows.reshape(n_groups, W, 16, W)[:, :, :9, :]
    arr = lr.transpose(2, 1, 3, 0).reshape(9 * W * W, n_groups)
    if depth == 1:
        # single group: read statically in the kernel -> plain f32
        sup = np.zeros((9 * W * W, 128), np.float32)
        sup[:, :1] = arr
        lidx = np.arange(1)
        leaf = jnp.asarray(sup)
        ncols = 128
    else:
        lidx = keep[depth - 1]
        ncols = _round_up(len(lidx))
        sup = np.zeros((9 * W * W, ncols), np.float32)
        sup[:, : len(lidx)] = arr[:, lidx]
        leaf = jnp.asarray(_split3(sup))  # one-hot fetched -> split

    attr = gmap = None
    if attr_rows is not None:
        # attr super table: row c*64 + pos = ATTR component c of the pos-th
        # triangle of the (compact) leaf group; + canonical->compact map
        ar = np.asarray(attr_rows, np.float32)
        at = ar[: n_groups * 64, :25].reshape(n_groups, 64, 25)
        aarr = at.transpose(2, 1, 0).reshape(25 * 64, n_groups)
        attr_t = np.zeros((25 * 64, ncols), np.float32)
        attr_t[:, : len(lidx)] = aarr[:, lidx]
        g_can = W ** (depth - 1)
        gm = np.zeros((8, _round_up(g_can)), np.float32)
        # row 1: compact column for NONEMPTY canonical groups, else -1
        # (incl. the padding) — the stage_mt slot->canonical inverse
        # (slot_grel) needs emptiness, which row 0's 0-default conflates
        # with the real compact column 0
        gm[1, :] = -1.0
        if depth > 1:
            gm[0, :g_can] = cmap[depth - 1]
            ne = np.zeros(g_can, bool)
            ne[keep[depth - 1]] = True
            gm[1, :g_can] = np.where(ne, cmap[depth - 1], -1.0)
        else:
            gm[1, 0] = 0.0
        attr = jnp.asarray(_split3(attr_t))  # always one-hot fetched
        gmap = jnp.asarray(gm)

    return PallasTables(
        root=jnp.asarray(root), levels=tuple(levels),
        leaf=leaf, attr=attr, gmap=gmap, depth=depth,
    )


class ForestTables(struct.PyTreeNode):
    """Subtree re-rooting for scenes too deep/large for one VMEM-resident
    table set (VERDICT r2 missing #2: the reference's recursion handles any
    depth, raytracer.c:443-483; the monolithic kernel gated at depth <= 4).

    The implicit 8-ary tree is split at `root_level`: every nonempty node
    at that level heads an independent depth-(depth-root_level) subtree
    whose compacted tables DO fit VMEM. Traversal runs the unchanged
    kernel once per subtree, threading the running best hit in as the
    per-ray `t_max` pruning bound; certificates and hits merge exactly
    (see intersect_bvh_pallas_forest). One-hot fetch cost scales with
    table WIDTH, so the summed fetch cost over subtrees equals a
    monolithic kernel's — re-rooting adds only the per-call selection
    machinery and dispatches.

    subtrees: tuple of PallasTables (one per KEPT nonempty subtree);
    bases: python tuple of global triangle-id offsets (k * 8^(depth-1-
    root_level) * 64 for subtree k)."""

    subtrees: Any
    bases: Any = struct.field(pytree_node=False)
    root_level: int = struct.field(pytree_node=False)
    depth: int = struct.field(pytree_node=False)

    @property
    def attr(self):
        return self.subtrees[0].attr if self.subtrees else None


def build_forest_host(nodes, leaf_rows, depth, attr_rows=None,
                      root_level: int = 1) -> ForestTables:
    """Slice the implicit tree into 8^root_level subtrees and build each
    subtree's compacted tables (build_tables_host). Empty subtrees (their
    root row carries no box data — real boxes are +/-EPSILON padded so
    never all-zero, scene.c:177-188) are dropped entirely."""
    nodes = np.asarray(nodes, np.float32)
    leaf_rows = np.asarray(leaf_rows, np.float32)
    sub_depth = depth - root_level
    assert 1 <= sub_depth <= 4
    n_sub = W**root_level
    g_sub = W ** (sub_depth - 1)  # leaf groups per subtree

    subtrees, bases = [], []
    for k in range(n_sub):
        root_row = nodes[_level_offset(root_level) + k]
        if np.abs(root_row[: 6 * W]).max() == 0:
            continue
        sub_nodes = np.concatenate(
            [
                nodes[
                    _level_offset(root_level + l) + k * W**l
                    : _level_offset(root_level + l) + (k + 1) * W**l
                ]
                for l in range(sub_depth)
            ],
            axis=0,
        )
        sub_leaf = leaf_rows[k * g_sub * W : (k + 1) * g_sub * W]
        sub_attr = None
        if attr_rows is not None:
            sub_attr = np.asarray(attr_rows)[
                k * g_sub * 64 : (k + 1) * g_sub * 64
            ]
        subtrees.append(
            build_tables_host(sub_nodes, sub_leaf, sub_depth, sub_attr)
        )
        bases.append(k * g_sub * 64)

    return ForestTables(
        subtrees=tuple(subtrees), bases=tuple(bases),
        root_level=root_level, depth=depth,
    )


def build_scene_tables(nodes, leaf_rows, depth, attr_rows=None,
                       budget_bytes: int = 8 * 2**20):
    """Pick the traversal table form for a scene: monolithic PallasTables
    when depth <= 4 and the tables fit the VMEM budget, else the smallest
    re-rooting whose per-subtree tables fit (always exists: sub_depth=1
    tables are one leaf group). Scene builders and the cache loader call
    this (models/scene.py, models/serialization.py)."""
    n_groups = max(np.asarray(leaf_rows).shape[0] // W, 1)
    if depth <= 4 and _tables_bytes(n_groups, depth) < budget_bytes:
        return build_tables_host(nodes, leaf_rows, depth, attr_rows)
    for root_level in range(1, depth):
        sub_depth = depth - root_level
        if sub_depth > 4:
            continue
        g_sub = W ** (sub_depth - 1)
        if _tables_bytes(g_sub, sub_depth) < budget_bytes:
            return build_forest_host(
                nodes, leaf_rows, depth, attr_rows, root_level
            )
    raise AssertionError("unreachable: sub_depth=1 always fits")


def _tables_bytes(n_groups: int, depth: int) -> int:
    """Worst-case (uncompacted) VMEM bytes for one subtree's leaf + attr +
    node tables — attr is resident in the same kernel's VMEM for
    fetch_attrs, so it counts against the budget too. Fetched tables are
    3-plane bf16 splits: 6 bytes per stored f32 (1.5x plain f32)."""
    leaf = _round_up(n_groups) * 9 * W * W * 6
    attr = _round_up(n_groups) * 25 * W * W * 6
    node = sum(W**l for l in range(depth)) * NROWS * 6
    return leaf + attr + node


def build_tables(triangles, bvh) -> PallasTables:
    """Uncompacted fallback build from (possibly traced) device arrays —
    used when a caller has no precomputed Scene.ptables. Compact ids are
    the identity (canonical level-relative ids)."""
    depth = bvh.depth
    nodes = bvh.nodes

    def child_const(g, lvl):
        # child compact id = canonical child rel id under identity mapping
        if lvl + 1 >= depth:
            return np.zeros((W, _round_up(g)), np.float32)
        c = np.arange(g)[None, :] * W + np.arange(W)[:, None]
        return np.pad(
            c.astype(np.float32), ((0, 0), (0, _round_up(g) - g))
        )

    root = jnp.zeros((NROWS, 128), jnp.float32)
    root = root.at[: 6 * W, 0].set(nodes[0, : 6 * W])
    if depth > 1:
        root = root.at[48:56, 0].set(jnp.arange(W, dtype=jnp.float32))

    levels = []
    for lvl in range(1, depth):
        s, g = _level_offset(lvl), W**lvl
        t = jnp.zeros((NROWS, _round_up(g)), jnp.float32)
        t = t.at[: 6 * W, :g].set(jnp.transpose(nodes[s : s + g, : 6 * W]))
        t = t.at[48:56, :].set(jnp.asarray(child_const(g, lvl)))
        levels.append(t if lvl == 1 else _split_any(t))

    n_groups = max(triangles.leaf_rows.shape[0] // W, 1)
    lr = triangles.leaf_rows.reshape(n_groups, W, 16, W)[:, :, :9, :]
    arr = jnp.transpose(lr, (2, 1, 3, 0)).reshape(9 * W * W, n_groups)
    sup = jnp.zeros((9 * W * W, _round_up(n_groups)), jnp.float32)
    sup = sup.at[:, :n_groups].set(arr)
    if depth > 1:
        sup = _split_any(sup)

    return PallasTables(root=root, levels=tuple(levels), leaf=sup,
                        attr=None, gmap=None, depth=depth)


def scene_fits(triangles, bvh, budget_bytes: int = 8 * 2**20) -> bool:
    """Whether this scene fits ONE monolithic table set: tree depth <= 4
    (the 13-bit id packing bounds leaf-block rel ids to 8192) and the
    (worst-case uncompacted) tables fit a VMEM budget that leaves ~8 MB
    for the per-tile working set. Scenes beyond this take the Pallas path
    anyway via subtree re-rooting (build_scene_tables -> ForestTables);
    this predicate only decides monolithic vs forest."""
    if bvh.depth > 4:
        return False
    n_groups = max(triangles.leaf_rows.shape[0] // W, 1)
    leaf_bytes = _round_up(n_groups) * 9 * W * W * 6
    node_bytes = bvh.nodes.shape[0] * NROWS * 6
    return leaf_bytes + node_bytes < budget_bytes


def intersect_bvh_pallas(
    origin: Vec3, direction: Vec3, triangles, bvh, active=None, kp: int = 2,
    ksel: int = 8, t_max=None, tables: PallasTables | None = None,
    interpret: bool | None = None, tile: int | None = None,
    fuse_attr: bool = False, shared: bool | None = None,
    stage_mt: bool | None = None, tile_wavefront: bool | None = None,
):
    """Single-pass fused traversal (Pallas). Returns dict(t, tri, u, v,
    dropped_min) with the same semantics/certificate as
    intersect_bvh_topk(with_bound=True).

    stage_mt: tile-shared union Moller-Trumbore (None -> module default
    STAGE_MT, env RAYTPU_TIER0_STAGEMT; see the STAGE_MT comment).
    Requires host-built tables (gmap); silently off otherwise. Hits may
    DIFFER from the per-lane path only on lanes the certificate flags
    (strictly larger per-lane coverage) — the verified wrapper's output
    stays oracle-bit-exact either way.

    tile_wavefront: tile-global selection + union staging (None ->
    module default TW, env RAYTPU_TIER0_TW; see the TW comment). For
    COHERENT batches (bounce-0 camera rays). Requires int8x4 split
    tables and depth >= 2; silently falls back otherwise. Same
    certificate contract as stage_mt: per-lane hits may differ only on
    certificate-flagged lanes, verified output stays oracle-exact.

    tables: precomputed compacted PallasTables (Scene.ptables); falls back
    to an uncompacted traced build when absent.
    t_max: optional (R,) per-ray pruning bound: subtrees entered at or
    beyond it are skipped AND excluded from the certificate (only hits
    strictly closer than t_max can be found/certified).
    fuse_attr: also interpolate the winner's 25 shading attributes
    in-kernel (requires host-built tables with attr/gmap); adds an
    "attrs" entry — the (16, R) _interp_attrs planes — to the result.
    Attr values correspond to THIS pass's winners; callers that repair
    hits afterwards must refetch attrs for changed lanes (see
    intersect_bvh_pallas_verified)."""
    r = origin.shape[0]
    kp = min(kp, max(W, ksel))
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    if tile is None:
        tile = R_TILE

    if tables is None:
        tables = build_tables(triangles, bvh)
    depth = tables.depth
    fuse = bool(fuse_attr) and tables.attr is not None

    if tile_wavefront is None:
        tile_wavefront = TW
    tw = (
        bool(tile_wavefront)
        and depth >= 2
        and tables.leaf.dtype == jnp.int8
        and all(lv.dtype == jnp.int8 for lv in tables.levels[1:])
        and (not fuse or tables.attr is not None)
    )
    if tw:
        # the TW working set (concatenated per-slot slab planes + the
        # staged-union MT chains) overflows the 16 MB scoped-VMEM limit
        # at tile=1024 (measured 20 MB); 512-lane tiles fit and the
        # tile-global selection still amortizes over 512 lanes
        tile = min(tile, 512)

    r_pad = ((r + tile - 1) // tile) * tile
    if active is None:
        act = jnp.ones((r,), jnp.float32)
    else:
        act = active.astype(jnp.float32)
    if t_max is None:
        t_max = jnp.full((r,), INF, jnp.float32)
    rays = jnp.stack(
        [origin.x, origin.y, origin.z,
         direction.x, direction.y, direction.z,
         act, t_max],
        axis=0,
    )
    rays = jnp.pad(rays, ((0, 0), (0, r_pad - r)))

    if shared is None:
        shared = SHARED
    if stage_mt is None:
        stage_mt = STAGE_MT
    smt = bool(stage_mt) and tables.gmap is not None and not tw
    tbls = [tables.root, *tables.levels, tables.leaf]
    if fuse or smt:
        tbls += [tables.gmap]
    if fuse:
        tbls += [tables.attr]
    out_rows = 24 if fuse else 8
    full = lambda t: pl.BlockSpec(  # noqa: E731
        t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(
            _traverse_kernel, depth, ksel, kp, interpret, fuse, shared,
            smt, tw,
        ),
        grid=(r_pad // tile,),
        in_specs=[
            pl.BlockSpec((8, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            *[full(t) for t in tbls],
        ],
        out_specs=pl.BlockSpec((out_rows, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((out_rows, r_pad), jnp.float32),
        interpret=interpret,
    )(rays, *tbls)

    t = out[0, :r]
    hit = jnp.isfinite(t)
    res = {
        "t": t,
        "u": out[1, :r],
        "v": out[2, :r],
        "tri": jnp.where(hit, out[3, :r].astype(jnp.int32), -1),
        "dropped_min": out[4, :r],
    }
    if fuse:
        res["attrs"] = out[8:24, :r]
    return res


def intersect_bvh_pallas_forest(
    origin: Vec3, direction: Vec3, forest: ForestTables, active=None,
    kp: int = 2, ksel: int = 8, t_max=None, interpret: bool | None = None,
    tile: int | None = None, fuse_attr: bool = False,
    shared: bool | None = None, stage_mt: bool | None = None,
    tile_wavefront: bool | None = None,
):
    """Run the fused kernel once per subtree, threading the running best
    hit in as each call's per-ray t_max bound. fuse_attr: each subtree
    interpolates its winners' attrs in-kernel and the merge selects the
    winning subtree's planes — same "attrs" contract as the monolithic
    path. Exactness of the merge:

    - a subtree candidate pruned by t_max entered at >= t_max >= final
      best t, so it cannot contain a STRICTLY closer hit — dropping it
      from the certificate is sound (same argument as the monolithic
      kernel's t_max contract);
    - equal-t ties resolve to the LOWEST triangle id (the oracle rule):
      subtree k's ids are all lower than subtree k+1's, later subtrees
      prune at t_max = running best (strictly-closer only), and the merge
      below takes later only when strictly nearer.

    Returns the same dict as intersect_bvh_pallas, with global tri ids.
    """
    r = origin.shape[0]
    if t_max is None:
        t_max = jnp.full((r,), INF, jnp.float32)
    best = None
    for st, base in zip(forest.subtrees, forest.bases):
        bound = t_max if best is None else jnp.minimum(t_max, best["t"])
        hit = intersect_bvh_pallas(
            origin, direction, None, None, active, kp=kp, ksel=ksel,
            t_max=bound, tables=st, interpret=interpret, tile=tile,
            fuse_attr=fuse_attr, shared=shared, stage_mt=stage_mt,
            tile_wavefront=tile_wavefront,
        )
        hit["tri"] = jnp.where(hit["tri"] >= 0, hit["tri"] + base, -1)
        if best is None:
            best = hit
        else:
            wins = hit["t"] < best["t"]
            merged = {
                "t": jnp.where(wins, hit["t"], best["t"]),
                "u": jnp.where(wins, hit["u"], best["u"]),
                "v": jnp.where(wins, hit["v"], best["v"]),
                "tri": jnp.where(wins, hit["tri"], best["tri"]),
                "dropped_min": jnp.minimum(
                    hit["dropped_min"], best["dropped_min"]
                ),
            }
            if "attrs" in hit:
                merged["attrs"] = jnp.where(
                    wins[None, :], hit["attrs"], best["attrs"]
                )
            best = merged
    return best


def _interp_attrs(depth, interp, gmap_ref, attr_ref, tri, u, v, cid=None,
                  cols=None):
    """Shared attribute fetch + interpolation core: one-hot matmul against
    the VMEM-resident attr super table (canonical group -> compact column
    via `gmap`, then a 64-wide position select), interpolation matching
    _gather_hit_geometry term for term (raytracer.c:159-183 parity):
    normal = n0*w + n1*u + n2*v, uv likewise, with w = 1 - u - v.
    Returns (16, R): normal3, ng3, tangent3, bitangent3, uv_u, uv_v, mat,
    zero pad. Used by the standalone _attr_kernel AND inlined into the
    traversal kernel when fuse_attr is on."""
    r = tri.shape[-1]
    w = 1.0 - u - v

    if cid is None:
        if depth > 1:
            g_can = tri >> 6
            oh_can = (_iota((gmap_ref.shape[1], r), 0) == g_can).astype(
                jnp.float32
            )
            # LEAF_PRECISION (= HIGHEST): gmap holds integer column ids
            # > 256, which the platform-default bf16 matmul ROUNDS. The
            # FUSED traversal path passes `cid` directly (the winner's
            # group was just fetched, its compact column is in hand) and
            # never pays this.
            cid = jax.lax.dot_general(
                gmap_ref[0:1, :], oh_can, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=LEAF_PRECISION,
            ).astype(jnp.int32)
        else:
            cid = jnp.zeros((1, r), jnp.int32)
    if cols is None:
        cols = _fetch_split(attr_ref, cid, interp)  # (1600, r)

    pos = tri & 63
    oh_p = _iota((64, r), 0) == pos

    def sel(c):
        rows = cols[c * 64 : (c + 1) * 64]  # static slice (Mosaic-safe)
        return jnp.sum(jnp.where(oh_p, rows, 0.0), axis=0, keepdims=True)

    # ATTR_* layout (models/scene.py:51-59)
    n0 = [sel(c) for c in range(0, 3)]
    n1 = [sel(c) for c in range(3, 6)]
    n2 = [sel(c) for c in range(6, 9)]
    ng = [sel(c) for c in range(9, 12)]
    tan = [sel(c) for c in range(12, 15)]
    btn = [sel(c) for c in range(15, 18)]
    uv0u, uv0v, uv1u, uv1v, uv2u, uv2v = (sel(c) for c in range(18, 24))
    mat = sel(24)

    normal = [n0[c] * w + n1[c] * u + n2[c] * v for c in range(3)]
    uv_u = uv0u * w + uv1u * u + uv2u * v
    uv_v = uv0v * w + uv1v * u + uv2v * v

    return jnp.concatenate(
        [*normal, *ng, *tan, *btn, uv_u, uv_v, mat,
         jnp.zeros((1, r), jnp.float32)],
        axis=0,
    )


def _attr_kernel(depth, interp, hits_ref, gmap_ref, attr_ref, out_ref):
    """Standalone winning-triangle attribute kernel (the XLA equivalent,
    integrator._gather_hit_geometry, is ONE 512-byte attribute-row gather
    per ray — measured 4.5 ms per 262k rays, latency-bound; the one-hot
    MXU fetch does the same work in ~1 ms, docs/PERF.md)."""
    tri = jnp.maximum(hits_ref[0:1, :], 0.0).astype(jnp.int32)
    u = hits_ref[1:2, :]
    v = hits_ref[2:3, :]
    out_ref[:] = _interp_attrs(depth, interp, gmap_ref, attr_ref, tri, u, v)


def fetch_attrs(tables: PallasTables, tri, u, v, interpret: bool | None = None):
    """Winning-triangle attribute fetch + interpolation (Pallas).

    tri: (R,) i32 (-1 for miss: clamped, outputs masked by the caller);
    u/v: (R,) barycentrics. Returns a dict of interpolated planes:
    normal/ng/tangent/bitangent (Vec3), uv_u/uv_v (R,), mat_id (R,) i32.
    Requires tables built host-side (tables.attr is not None).
    """
    r = tri.shape[0]
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"

    r_pad = ((r + R_TILE - 1) // R_TILE) * R_TILE
    hits = jnp.stack([tri.astype(jnp.float32), u, v], axis=0)
    hits = jnp.pad(
        jnp.concatenate([hits, jnp.zeros((5, r), jnp.float32)], axis=0),
        ((0, 0), (0, r_pad - r)),
    )

    full = lambda t: pl.BlockSpec(  # noqa: E731
        t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_attr_kernel, tables.depth, interpret),
        grid=(r_pad // R_TILE,),
        in_specs=[
            pl.BlockSpec((8, R_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            full(tables.gmap), full(tables.attr),
        ],
        out_specs=pl.BlockSpec((16, R_TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, r_pad), jnp.float32),
        interpret=interpret,
    )(hits, tables.gmap, tables.attr)

    return attrs_to_dict(out[:, :r])


def attrs_to_dict(o):
    """(16, R) _interp_attrs planes -> the geometry dict the integrator
    consumes (shared by fetch_attrs and the fused-traversal path)."""
    return {
        "normal": Vec3(o[0], o[1], o[2]),
        "ng": Vec3(o[3], o[4], o[5]),
        "tangent": Vec3(o[6], o[7], o[8]),
        "bitangent": Vec3(o[9], o[10], o[11]),
        "uv_u": o[12],
        "uv_v": o[13],
        "mat_id": o[14].astype(jnp.int32),
    }


def fetch_attrs_forest(forest: ForestTables, tri, u, v,
                       interpret: bool | None = None):
    """Forest form of fetch_attrs: one attr-kernel launch per subtree with
    LOCAL triangle ids (clamped for lanes belonging elsewhere), combined
    by ownership masks. Summed one-hot cost equals a monolithic table's;
    only the per-launch overhead multiplies."""
    out = None
    for st, base in zip(forest.subtrees, forest.bases):
        span = W ** (st.depth - 1) * 64  # canonical triangles per subtree
        mine = (tri >= base) & (tri < base + span)
        local = jnp.where(mine, tri - base, 0)
        g = fetch_attrs(st, local, u, v, interpret=interpret)
        if out is None:
            out = g
        else:
            out = {
                k: (
                    Vec3.where(mine, g[k], out[k])
                    if isinstance(g[k], Vec3)
                    else jnp.where(mine, g[k], out[k])
                )
                for k in g
            }
    return out
