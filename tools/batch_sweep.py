"""Sweep the render batch size on the bench config.

Larger batches amortize tunnel dispatch + readback latency (~26 ms per
sync) over more work, at the cost of HBM state and coarser early-exit
granularity (a mega-batch mixes sky and helmet tiles, so its bounce
while_loop runs as long as its slowest tile).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/batch_sweep.py
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from raytracing_c_tpu.io.loader import load_scene
from raytracing_c_tpu.render.renderer import render

print("backend:", jax.default_backend())
scene = load_scene(
    "/root/reference/models/helmet.glb", background_path=None,
    warn=lambda *a: None,
)

for bp in (16384, 32768, 65536):
    render(scene, 1920, 1080, spp=16, max_bounces=8, seed=1,
           batch_pixels=bp, limit_batches=1)  # compile
    t0 = time.perf_counter()
    img, stats = render(scene, 1920, 1080, spp=16, max_bounces=8, seed=0,
                        batch_pixels=bp)
    wall = time.perf_counter() - t0
    print(f"batch_pixels={bp:6d}: {wall:6.2f}s "
          f"{stats.rays_traced/1e6/wall:6.2f} Mrays/s "
          f"({stats.batches} batches)")
