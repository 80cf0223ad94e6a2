"""Headline benchmark: Mrays/s on helmet.glb at 1080p (BASELINE.json).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 500 (the 500 Mrays/s/chip north star from
BASELINE.md). Rays are counted the honest way: every scene intersection
actually executed (samples x bounces taken, including backface re-casts) —
see BASELINE.md's measurement note.

The timed region excludes compilation (persistent cache + a warmup run) and
brackets the render loop the way the reference's timer brackets its render
phase (driver.c:791-822).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

HELMET = "/root/reference/models/helmet.glb"
WIDTH, HEIGHT = 1920, 1080
SPP = 16
BOUNCES = 8
BATCH_PIXELS = 65536  # x16 spp = 1M rays per device program (bucket-compacted)
BASELINE_MRAYS = 500.0


def main() -> int:
    from raytracing_c_tpu.io.loader import load_scene
    from raytracing_c_tpu.render.renderer import render

    scene = load_scene(HELMET, background_path=None, warn=lambda *a: None)

    # warmup: compile the batch program (same static shape as the run)
    render(
        scene, WIDTH, HEIGHT, spp=SPP, max_bounces=BOUNCES, seed=1,
        batch_pixels=BATCH_PIXELS, limit_batches=1,
    )

    t0 = time.perf_counter()
    img, stats = render(
        scene, WIDTH, HEIGHT, spp=SPP, max_bounces=BOUNCES, seed=0,
        batch_pixels=BATCH_PIXELS,
    )
    wall = time.perf_counter() - t0

    mrays = stats.rays_traced / 1e6 / wall
    result = {
        "metric": "helmet.glb 1080p Mrays/s (1 chip)",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
    }
    print(json.dumps(result))
    print(
        f"# wall={wall:.2f}s rays={stats.rays_traced:.3e} "
        f"samples={stats.samples:.3e} samples/s={stats.samples / wall:.3e} "
        f"device={jax.devices()[0]}",
        file=sys.stderr,
    )
    try:
        from raytracing_c_tpu.io.image_io import write_png

        write_png(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "bench_helmet_1080p.png"), img)
    except Exception:
        pass
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
