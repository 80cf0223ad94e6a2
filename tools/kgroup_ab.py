"""On-chip k_group sweep: batches-per-dispatch for the grouped renderer.

k_group amortizes the axon tunnel's per-dispatch latency over k batches
inside one jitted program (renderer.render_batches_grouped). The round-2
value (4) was picked before the round-3 kernel work changed per-batch
time; re-price it. Renders a quarter frame (limit_batches) per config so
the sweep stays minutes, not hours.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/kgroup_ab.py
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from raytracing_c_tpu.io.loader import load_scene
from raytracing_c_tpu.render.renderer import render

print("backend:", jax.default_backend(), flush=True)
scene = load_scene(
    "/root/reference/models/helmet.glb", background_path=None,
    warn=lambda *a: None,
)

W, H, SPP, B = 1920, 1080, 16, 8
BATCH_PX = 65536
LIMIT = 8  # quarter-ish frame: 8 of 32 batches

for kg in (2, 4, 8):
    kw = dict(spp=SPP, max_bounces=B, batch_pixels=BATCH_PX, k_group=kg,
              limit_batches=LIMIT)
    render(scene, W, H, seed=1, **kw)  # warm the exact program
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        _, stats = render(scene, W, H, seed=0, **kw)
        best = min(best, time.perf_counter() - t0)
    print(f"k_group={kg}: {best:6.2f}s  rays={stats.rays_traced:.3e}  "
          f"{stats.rays_traced / best / 1e6:6.2f} Mrays/s", flush=True)
