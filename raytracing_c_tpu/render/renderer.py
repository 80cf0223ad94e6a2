"""Batched tile renderer.

The reference's thread/chunk execution model (render_thread_proc,
raytracer.c:596-720: 32x32 chunks pulled from an atomic counter by N threads)
becomes: the image is cut into flat pixel mega-batches; each batch renders as
ONE jitted device program over a ray arena of (pixels x spp) rays; batches
are optionally sharded across a `jax.sharding.Mesh` (chunks -> shards,
SURVEY §2.11). No atomics — accumulation is a reshape+mean per pixel.
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from raytracing_c_tpu.render import camera as camera_mod
from raytracing_c_tpu.render import integrator
from raytracing_c_tpu.utils import color


@dataclass
class RenderStats:
    """Phase timers + throughput, mirroring the reference's -V metrics
    (driver.c:776-836): BVH build ms, render ms, samples/s — plus Mrays/s
    (BASELINE.md measurement note: rays = samples x bounces actually cast)."""

    wall_ms: float = 0.0
    samples: int = 0
    rays_traced: int = 0
    batches: int = 0
    compile_ms: float = 0.0
    extra: dict = field(default_factory=dict)

    @property
    def samples_per_sec(self) -> float:
        return self.samples / max(self.wall_ms / 1e3, 1e-9)

    @property
    def mrays_per_sec(self) -> float:
        return self.rays_traced / 1e6 / max(self.wall_ms / 1e3, 1e-9)


def _batch_core(scene, px, py, jitter, uniforms, nee_uniforms, key, *,
                width, height, spp, max_bounces, method, texture_mode,
                compact, rr, nee, tonemap=None):
    """Shared body of the (sharded) batch renderers: raygen -> trace ->
    per-pixel spp mean. Dense trace consumes the pre-drawn `uniforms`
    stream (sharded wrappers hand each shard its slice of the GLOBAL
    stream -> bit parity); the bucketed tracer derives uniforms from
    (key, sample slot, bounce) instead, so its images are invariant to
    the compaction schedule."""
    p = px.shape[0]
    rpx = jnp.repeat(px, spp)
    rpy = jnp.repeat(py, spp)
    origin, direction = camera_mod.generate_rays(
        scene.camera, width, height, rpx, rpy, jitter[0], jitter[1]
    )

    if compact:
        radiance, rays = integrator.trace_bucketed(
            scene, origin, direction, key, max_bounces,
            method=method, texture_mode=texture_mode, rr=rr, nee=nee,
        )
    else:
        radiance, rays = integrator.trace(
            scene, origin, direction, uniforms, max_bounces,
            method=method, texture_mode=texture_mode, rr=rr, nee=nee,
            nee_uniforms=nee_uniforms,
        )
    rgb = jnp.stack(
        [
            radiance.x.reshape(p, spp).mean(axis=1),
            radiance.y.reshape(p, spp).mean(axis=1),
            radiance.z.reshape(p, spp).mean(axis=1),
        ],
        axis=-1,
    )
    # optional tonemap on the FLOAT per-pixel radiance — the reference's
    # (disabled) hook sits before the clamp+encode (raytracer.c:701), not
    # on quantized u8
    if tonemap == "aces":
        rgb = color.aces(rgb)
    elif tonemap == "reinhard":
        rgb = color.reinhard(rgb)
    # encode to u8 ON DEVICE: the per-batch readback drops from 12 B to
    # 3 B per pixel (the tunnel moves ~40 MB/s), and the per-pixel encode
    # is identical to encoding the assembled image
    return color.encode_u8(rgb), rays


def _draw_uniforms(key, r, max_bounces, nee, skip_mat=False):
    # stateless counter-based RNG replaces the reference's time-seeded
    # thread-local PCG (common.h:13-28, raytracer.c:597): one threefry draw
    # for raygen jitter + per-bounce material uniforms. All draws are
    # batch-minor: (2, R) and (bounces, 4, R).
    k_jit, k_mat = jax.random.split(key)
    jitter = jax.random.uniform(k_jit, (2, r), jnp.float32)
    uniforms = None if skip_mat else jax.random.uniform(
        k_mat, (max_bounces, 4, r), jnp.float32
    )
    nee_uniforms = None
    if nee and not skip_mat:
        # separate key so the base stream (and nee-off goldens) is unchanged
        k_nee = jax.random.fold_in(key, 7919)
        # 3 channels: (select+accept, jitter-x, jitter-y) for the env-CDF
        # alias sampler; the uniform-sphere fallback uses the first two
        nee_uniforms = jax.random.uniform(
            k_nee, (max_bounces, 3, r), jnp.float32
        )
    return jitter, uniforms, nee_uniforms


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "spp", "max_bounces", "batch_px", "method",
        "texture_mode", "compact", "rr", "nee", "tonemap",
    ),
)
def render_batch_indexed(
    scene, xs_all, ys_all, key, b, *, width: int, height: int, spp: int,
    max_bounces: int, batch_px: int, method: str = "topk",
    texture_mode: str = "bilinear", compact: bool = False,
    rr: bool = False, nee: bool = False, tonemap: str | None = None,
):
    """One batch of the single-device render loop, fully device-side: the
    pixel list lives on device whole, the batch slice + per-batch key fold
    happen INSIDE the jit, and the host hands over only the batch index —
    one dispatch per batch. (Per-batch host slicing/uploads and tiny
    fold_in/slice dispatches each cost a tunnel round-trip; at 32 batches
    they measured ~0.5-1 s of wall.)"""
    start = b * batch_px
    px = jax.lax.dynamic_slice_in_dim(xs_all, start, batch_px)
    py = jax.lax.dynamic_slice_in_dim(ys_all, start, batch_px)
    kb = jax.random.fold_in(key, b)
    jitter, uniforms, nee_uniforms = _draw_uniforms(
        kb, batch_px * spp, max_bounces, nee, skip_mat=compact
    )
    return _batch_core(
        scene, px, py, jitter, uniforms, nee_uniforms,
        jax.random.fold_in(kb, 1),
        width=width, height=height, spp=spp, max_bounces=max_bounces,
        method=method, texture_mode=texture_mode, compact=compact, rr=rr,
        nee=nee, tonemap=tonemap,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "spp", "max_bounces", "batch_px", "k_group",
        "method", "texture_mode", "compact", "rr", "nee", "tonemap",
    ),
)
def render_batches_grouped(
    scene, xs_all, ys_all, key, b0, *, width: int, height: int, spp: int,
    max_bounces: int, batch_px: int, k_group: int, method: str = "topk",
    texture_mode: str = "bilinear", compact: bool = False,
    rr: bool = False, nee: bool = False, tonemap: str | None = None,
):
    """k_group consecutive batches in ONE device program (lax.map over the
    render_batch_indexed body): each tunnel dispatch costs a host round
    trip, and 32 single-batch dispatches measured ~2 s of the 6 s bench
    wall. Returns (rgb_u8 (k, batch_px, 3), rays (k,)). Out-of-range
    batch indices clamp to the last batch (its pixels just re-render)."""
    n_batches = xs_all.shape[0] // batch_px

    def one(b):
        b = jnp.minimum(b, jnp.uint32(n_batches - 1))
        start = b * batch_px
        px = jax.lax.dynamic_slice_in_dim(xs_all, start, batch_px)
        py = jax.lax.dynamic_slice_in_dim(ys_all, start, batch_px)
        kb = jax.random.fold_in(key, b)
        jitter, uniforms, nee_uniforms = _draw_uniforms(
            kb, batch_px * spp, max_bounces, nee, skip_mat=compact
        )
        return _batch_core(
            scene, px, py, jitter, uniforms, nee_uniforms,
            jax.random.fold_in(kb, 1),
            width=width, height=height, spp=spp, max_bounces=max_bounces,
            method=method, texture_mode=texture_mode, compact=compact,
            rr=rr, nee=nee, tonemap=tonemap,
        )

    return jax.lax.map(one, b0 + jnp.arange(k_group, dtype=jnp.uint32))


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "spp", "max_bounces", "batch_px", "k_group",
        "method", "texture_mode", "compact", "rr", "nee", "tonemap",
    ),
    donate_argnums=(5, 6),
)
def render_batches_grouped_acc(
    scene, xs_all, ys_all, key, b0, acc, rays_acc, *, width: int,
    height: int, spp: int, max_bounces: int, batch_px: int, k_group: int,
    method: str = "topk", texture_mode: str = "bilinear",
    compact: bool = False, rr: bool = False, nee: bool = False,
    tonemap: str | None = None,
):
    """render_batches_grouped, but the u8 pixels land in a DEVICE-resident
    accumulator instead of being read back per dispatch: acc
    ((n_groups*k_group*batch_px, 3) u8) and rays_acc ((n_groups*k_group,)
    f32) are donated, so XLA updates them in place, and the host fetches
    the whole image ONCE at the end of the render. Every intermediate
    readback shares the axon tunnel with compute; at 1080p the per-group
    drains measurably steal device time from in-flight dispatches.
    rays_acc stays per-batch (each entry < 2^24 rays, exact in f32); the
    host reduces it in float64."""
    rgb, rays = render_batches_grouped(
        scene, xs_all, ys_all, key, b0, width=width, height=height,
        spp=spp, max_bounces=max_bounces, batch_px=batch_px,
        k_group=k_group, method=method, texture_mode=texture_mode,
        compact=compact, rr=rr, nee=nee, tonemap=tonemap,
    )
    acc = jax.lax.dynamic_update_slice_in_dim(
        acc, rgb.reshape(k_group * batch_px, 3),
        (b0 * batch_px).astype(jnp.int32), axis=0,
    )
    rays_acc = jax.lax.dynamic_update_slice_in_dim(
        rays_acc, rays, b0.astype(jnp.int32), axis=0
    )
    return acc, rays_acc


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "spp", "max_bounces", "method", "texture_mode",
        "compact", "rr", "nee", "tonemap",
    ),
)
def render_batch(
    scene, px, py, key, *, width: int, height: int, spp: int,
    max_bounces: int, method: str = "topk", texture_mode: str = "bilinear",
    compact: bool = False, rr: bool = False, nee: bool = False,
    tonemap: str | None = None,
):
    """Render one flat batch of pixels.

    px/py: (P,) i32 pixel coordinates. Returns (rgb_linear (P, 3) f32 mean
    over spp, rays_traced scalar).
    """
    jitter, uniforms, nee_uniforms = _draw_uniforms(
        key, px.shape[0] * spp, max_bounces, nee, skip_mat=compact
    )
    return _batch_core(
        scene, px, py, jitter, uniforms, nee_uniforms,
        jax.random.fold_in(key, 1),
        width=width, height=height, spp=spp, max_bounces=max_bounces,
        method=method, texture_mode=texture_mode, compact=compact, rr=rr,
        nee=nee, tonemap=tonemap,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "width", "height", "spp", "max_bounces", "method",
        "texture_mode", "compact", "rr", "nee", "tonemap",
    ),
)
def render_batch_sharded(
    scene, px, py, key, *, mesh, width: int, height: int, spp: int,
    max_bounces: int, method: str = "topk", texture_mode: str = "bilinear",
    compact: bool = False, rr: bool = False, nee: bool = False,
    tonemap: str | None = None,
):
    """render_batch over a device mesh via shard_map (SURVEY §2: rays
    sharded, scene replicated, no collectives in the trace).

    Random draws happen GLOBALLY (each shard receives its slice of the
    same stream), so compact=False is bit-identical to the single-device
    render. shard_map — not GSPMD auto-sharding — is what lets
    compact=True work multi-chip: each shard bucket-sorts its OWN lanes
    (a global lax.sort would force cross-chip collectives every bounce).
    The ray counter is psum'd."""
    from jax.sharding import PartitionSpec as P

    shard_map = jax.shard_map

    axis = mesh.axis_names[0]
    r = px.shape[0] * spp
    jitter, uniforms, nee_uniforms = _draw_uniforms(
        key, r, max_bounces, nee, skip_mat=compact
    )

    def per_shard(scene, px, py, jitter, *rest):
        uni = rest[0] if not compact else None
        nu = rest[1] if (not compact and nee) else None
        # bucketed RNG keys by LOCAL slot -> make the key shard-unique
        ks = jax.random.fold_in(
            jax.random.fold_in(key, 1), jax.lax.axis_index(axis)
        )
        rgb, rays = _batch_core(
            scene, px, py, jitter, uni, nu, ks,
            width=width, height=height, spp=spp, max_bounces=max_bounces,
            method=method, texture_mode=texture_mode, compact=compact,
            rr=rr, nee=nee, tonemap=tonemap,
        )
        return rgb, jax.lax.psum(rays, axis)

    specs = [P(), P(axis), P(axis), P(None, axis)]
    args = [scene, px, py, jitter]
    if not compact:
        specs.append(P(None, None, axis))
        args.append(uniforms)
        if nee:
            specs.append(P(None, None, axis))
            args.append(nee_uniforms)
    # check_vma off: zero-initialized loop carries start replicated and
    # become shard-varying after one iteration, which the strict varying-
    # axis checker rejects; semantics are unaffected (pure map + one psum)
    fn = shard_map(
        per_shard, mesh=mesh, in_specs=tuple(specs),
        out_specs=(P(axis), P()), check_vma=False,
    )
    return fn(*args)


@functools.lru_cache(maxsize=8)
def _pixel_tables(width: int, height: int, pad: int):
    """Tile-ordered pixel tables (the reference's 32x32 chunks,
    raytracer.c:601): batches then cover compact screen regions, so
    sky-only batches terminate after one bounce instead of dragging
    through the full loop. Cached per (width, height, pad) — rebuilding
    the lexsort and re-padding ~2M-entry tables costs tens of host ms per
    render call, all inside the timed region."""
    tile = 32
    ids = np.arange(width * height, dtype=np.int64)
    x = ids % width
    y = ids // width
    order = np.lexsort((x % tile, y % tile, x // tile, y // tile))
    xs = x[order].astype(np.int32)
    ys = y[order].astype(np.int32)
    if pad:
        xs = np.concatenate([xs, np.zeros(pad, np.int32)])
        ys = np.concatenate([ys, np.zeros(pad, np.int32)])
    # out[perm[i]] is the pixel rendered at position i
    return xs, ys, order


@functools.lru_cache(maxsize=8)
def _pixel_tables_device(width: int, height: int, pad: int):
    """Device-resident copy of _pixel_tables' (xs, ys) — ONE tunnel upload
    per frame shape instead of ~16 MB per render call (at 1080p the
    re-upload sat inside bench.py's timed region)."""
    xs, ys, _ = _pixel_tables(width, height, pad)
    return jnp.asarray(xs), jnp.asarray(ys)


def render(
    scene,
    width: int,
    height: int,
    spp: int = 16,
    max_bounces: int = 8,
    seed: int = 0,
    batch_pixels: int | None = None,
    method: str = "auto",
    mesh: "jax.sharding.Mesh | None" = None,
    progress=None,
    texture_mode: str = "bilinear",
    limit_batches: int | None = None,
    compact: bool | None = None,
    rr: bool = False,
    nee: bool = False,
    k_group: int | None = None,
    tonemap: str | None = None,
    accumulate: bool | None = None,
):
    """Render a full image.

    Returns (image u8 (H, W, 3), RenderStats). method="auto" picks the
    brute-force oracle for tiny scenes (the reference's own `#if 0` path,
    raytracer.c:497-503) and the dense top-k traversal otherwise; "dfs"
    forces the exact ordered-DFS path. `mesh` shards batch pixels across devices
    (scene replicated; per SURVEY §2 the only cross-chip traffic is the final
    image gather).

    compact: on-device bucket compaction of the bounce loop
    (integrator.trace_bucketed). Default on. Mesh renders run it
    PER-SHARD via shard_map (render_batch_sharded) — each shard sorts its
    own lanes, so no cross-chip collectives enter the trace.

    accumulate: keep the rendered u8 pixels in a device-resident donated
    buffer and read the whole image back ONCE at the end, instead of a
    per-group readback (render_batches_grouped_acc). Default (None): on
    when single-device and no progress callback — per-group drains share
    the tunnel with compute; a progress callback needs per-batch
    completion, so it keeps the draining path.
    """
    if compact is None:
        compact = True
    if method == "auto":
        if scene.triangles.capacity <= 64:
            # tiny scenes: the reference's own exhaustive oracle path
            method = "brute"
        else:
            # the fused Pallas kernel is the production path on real
            # devices — monolithic tables or a re-rooted forest, the
            # builder always provides ptables; CPU (tests / dryrun) keeps
            # the XLA top-k path since pallas interpret mode is orders of
            # magnitude slower. pallas_fused (traversal + attr interp in
            # one dispatch) won the on-chip A/B (tools/split_ab.py r3:
            # 11.43 vs 11.92 ms camera, 13.38 vs 14.13 bounce, int8x4).
            on_cpu = jax.devices()[0].platform == "cpu"
            method = (
                "pallas_fused"
                if not on_cpu and getattr(scene, "ptables", None) is not None
                else "topk"
            )

    n_pixels = width * height
    if batch_pixels is None:
        # bound the live ray arena: top-k traversal materializes a few
        # (k_leaf*8, R) intermediates, so ~256k rays keeps them ~128 MB each
        batch_pixels = max(1, min(n_pixels, (262_144 // max(spp, 1))))
    n_dev = 1
    if mesh is not None:
        n_dev = int(np.prod(list(mesh.shape.values())))
        batch_pixels = max(n_dev, (batch_pixels // n_dev) * n_dev)

    # pad pixel count so every batch has identical shape (one compile)
    n_batches = (n_pixels + batch_pixels - 1) // batch_pixels
    # full-frame batch count BEFORE limit_batches: the accumulator buffer
    # is sized from it so a limit_batches warmup compiles the exact
    # program (same acc shape) the unlimited timed run uses
    n_batches_full = n_batches
    pad = n_batches * batch_pixels - n_pixels
    xs, ys, perm = _pixel_tables(width, height, pad)

    shard = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        shard = NamedSharding(mesh, P(mesh.axis_names[0]))
        scene = jax.device_put(scene, NamedSharding(mesh, P()))

    key = jax.random.PRNGKey(seed)
    out = np.zeros((n_pixels + pad, 3), np.uint8)
    rays_total = 0.0

    if limit_batches is not None:
        n_batches = min(n_batches, limit_batches)

    # pipelined batch loop: keep a few batches in flight so the synchronous
    # device->host readback of batch b overlaps batch b+1..b+k's compute
    # (over the axon tunnel a blocking readback costs ~100 ms — serializing
    # it per batch would idle the chip for a large fraction of the render)
    # drains run on a worker thread: device_get releases the GIL during
    # the transfer, so fetching batch b overlaps dispatching b+1..b+k
    # (32 serial drains measured ~1 s of host wall at 1080p)
    pipeline_depth = 8
    in_flight: list = []
    from concurrent.futures import ThreadPoolExecutor

    drain_pool = ThreadPoolExecutor(max_workers=1)

    def drain_sync(entry):
        nonlocal rays_total
        b, rgb, rays = entry
        # ONE device_get for both outputs (separate np.asarray/float calls
        # pay the ~26 ms tunnel round-trip latency twice per batch)
        rgb_h, rays_h = jax.device_get((rgb, rays))
        if rgb_h.ndim == 2:  # single batch
            rgb_h, rays_h = rgb_h[None], np.asarray([rays_h])
        for j in range(rgb_h.shape[0]):
            bj = b + j
            if bj >= n_batches:
                continue  # clamped duplicate of the last batch
            lo = bj * batch_pixels
            hi = min((bj + 1) * batch_pixels, n_pixels)
            if hi > lo:
                out[perm[lo:hi]] = rgb_h[j, : hi - lo]
            rays_total += float(rays_h[j])
            if progress is not None:
                progress(bj + 1, n_batches)

    def drain(entry):
        in_flight.append(drain_pool.submit(drain_sync, entry))
        while len(in_flight) > pipeline_depth:
            in_flight.pop(0).result()

    # ONE host->device upload of the full pixel list per frame shape
    # (cached); batches slice it inside the jitted program
    if mesh is None:
        xs_dev, ys_dev = _pixel_tables_device(width, height, pad)

    _tm = {"aces": color.aces, "reinhard": color.reinhard}.get(
        tonemap, lambda x: x
    )

    t0 = time.perf_counter()
    kw = dict(
        width=width, height=height, spp=spp, max_bounces=max_bounces,
        method=method, texture_mode=texture_mode, compact=compact,
        rr=rr, nee=nee, tonemap=tonemap,
    )
    # k_group is part of the compiled program's static shape: a warmup
    # run MUST use the same value as the timed run (bench.py pins it) —
    # round 2's official bench regression was a warmup compiled at
    # k_group=1 while the timed loop ran the never-compiled k_group=4
    # program, putting a fresh tunnel compile inside the timer.
    if k_group is None:
        k_group = min(4, n_batches) if mesh is None else 1
    k_group = max(1, min(k_group, n_batches)) if mesh is None else 1
    if accumulate is None:
        accumulate = mesh is None and progress is None
    if accumulate and mesh is None:
        n_groups_full = (n_batches_full + k_group - 1) // k_group
        acc = jnp.zeros(
            (n_groups_full * k_group * batch_pixels, 3), jnp.uint8
        )
        rays_acc = jnp.zeros((n_groups_full * k_group,), jnp.float32)
        for b in range(0, n_batches, k_group):
            acc, rays_acc = render_batches_grouped_acc(
                scene, xs_dev, ys_dev, key, jnp.uint32(b), acc,
                rays_acc, batch_px=batch_pixels, k_group=k_group, **kw
            )
            if progress is not None:  # dispatch-enqueue progress
                progress(min(b + k_group, n_batches), n_batches)
        acc_h, rays_h = jax.device_get((acc, rays_acc))
        out[perm] = acc_h[:n_pixels]
        rays_total = float(np.sum(rays_h[:n_batches], dtype=np.float64))
        drain_pool.shutdown(wait=True)
    else:
        for b in range(0, n_batches, k_group):
            if mesh is None:
                rgb, rays = render_batches_grouped(
                    scene, xs_dev, ys_dev, key, jnp.uint32(b),
                    batch_px=batch_pixels, k_group=k_group, **kw
                )
            else:
                sl = slice(b * batch_pixels, (b + 1) * batch_pixels)
                px = jax.device_put(jnp.asarray(xs[sl]), shard)
                py = jax.device_put(jnp.asarray(ys[sl]), shard)
                rgb, rays = render_batch_sharded(
                    scene, px, py, jax.random.fold_in(key, b),
                    mesh=mesh, **kw
                )
            drain((b, rgb, rays))
        for f in in_flight:
            f.result()
        drain_pool.shutdown(wait=True)
    wall_ms = (time.perf_counter() - t0) * 1e3

    img = out[:n_pixels].reshape(height, width, 3)

    stats = RenderStats(
        wall_ms=wall_ms,
        samples=n_pixels * spp,
        rays_traced=int(rays_total),
        batches=n_batches,
    )
    return img, stats
