"""A/B: direction-octant secondary sort key in the bucket compaction
(VERDICT round-1 item: "ray/material coherence sorting").

On GPUs direction-sorting improves memory coherence of divergent fetches.
On this design the traversal tables live in VMEM (fetches are dense
matmuls, coherence-free) and texture/attr fetches are per-lane row
gathers whose cost is per-row latency regardless of address locality —
so the expected win is ~zero; this measures it honestly.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/octant_ab.py
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from raytracing_c_tpu.io.loader import load_scene
from raytracing_c_tpu.render import integrator
from raytracing_c_tpu.render.renderer import render

print("backend:", jax.default_backend())
scene = load_scene("/root/reference/models/helmet.glb",
                   background_path=None, warn=lambda *a: None)

for octant in (False, True):
    integrator.SORT_OCTANT = octant
    jax.clear_caches()
    render(scene, 1920, 1080, spp=16, max_bounces=8, seed=1,
           batch_pixels=65536, limit_batches=1)
    t0 = time.perf_counter()
    img, stats = render(scene, 1920, 1080, spp=16, max_bounces=8, seed=0,
                        batch_pixels=65536)
    wall = time.perf_counter() - t0
    print(f"octant={int(octant)}: {wall:6.2f}s "
          f"{stats.rays_traced/1e6/wall:6.2f} Mrays/s")
