"""Headline benchmark: Mrays/s on helmet.glb at 1080p (BASELINE.json).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 500 (the 500 Mrays/s/chip north star from
BASELINE.md). Rays are counted the honest way: every scene intersection
actually executed (samples x bounces taken, including backface re-casts) —
see BASELINE.md's measurement note.

Wall time excludes compilation (persistent cache + warmup batch) and host
image assembly; it measures the steady-state device render loop the way the
reference's timer brackets its render phase (driver.c:791-822).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

HELMET = "/root/reference/models/helmet.glb"
WIDTH, HEIGHT = 1920, 1080
SPP = 16
BOUNCES = 8
BASELINE_MRAYS = 500.0


def main() -> int:
    from raytracing_c_tpu.io.loader import load_scene
    from raytracing_c_tpu.render.renderer import render_batch

    scene = load_scene(HELMET, background_path=None, warn=lambda *a: None)

    # pixel batches (identical shapes -> one compile)
    spp = SPP
    batch_pixels = 16384  # x16 spp = 262144 rays per device program
    n_pixels = WIDTH * HEIGHT
    n_batches = (n_pixels + batch_pixels - 1) // batch_pixels
    xs = np.arange(n_pixels, dtype=np.int32) % WIDTH
    ys = np.arange(n_pixels, dtype=np.int32) // WIDTH
    pad = n_batches * batch_pixels - n_pixels
    xs = np.concatenate([xs, np.zeros(pad, np.int32)])
    ys = np.concatenate([ys, np.zeros(pad, np.int32)])

    key = jax.random.PRNGKey(0)

    def run_batch(b):
        sl = slice(b * batch_pixels, (b + 1) * batch_pixels)
        return render_batch(
            scene, jnp.asarray(xs[sl]), jnp.asarray(ys[sl]),
            jax.random.fold_in(key, b),
            width=WIDTH, height=HEIGHT, spp=spp, max_bounces=BOUNCES,
        )

    # warmup/compile
    rgb, rays = run_batch(0)
    jax.block_until_ready(rgb)

    t0 = time.perf_counter()
    total_rays = 0.0
    outs = []
    for b in range(n_batches):
        rgb, rays = run_batch(b)
        outs.append((rgb, rays))
    jax.block_until_ready(outs[-1][0])
    wall = time.perf_counter() - t0
    total_rays = float(sum(float(r) for _, r in outs))

    mrays = total_rays / 1e6 / wall
    result = {
        "metric": "helmet.glb 1080p Mrays/s (1 chip)",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
    }
    print(json.dumps(result))
    print(
        f"# wall={wall:.2f}s rays={total_rays:.3e} "
        f"samples={n_pixels * spp:.3e} "
        f"samples/s={n_pixels * spp / wall:.3e} device={jax.devices()[0]}",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
