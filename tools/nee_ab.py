"""Equal-spp variance A/B for the beyond-parity estimators (--nee, --rr)
on the env-lit tower scene, against a high-spp reference render.

Reports PSNR-to-reference and wall time for: plain, +nee, +nee+rr.
Results land in docs/PERF.md.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/nee_ab.py
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from raytracing_c_tpu.io.loader import load_scene
from raytracing_c_tpu.render.renderer import render

SIZE = 512
SPP = 8

print("backend:", jax.default_backend())
scene = load_scene("/root/reference/models/tower.obj",
                   background_path=None, warn=lambda *a: None)


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10.0 * np.log10(255.0**2 / max(mse, 1e-12))


ref, _ = render(scene, SIZE, SIZE, spp=256, max_bounces=6, seed=999)

for label, kw in (
    ("plain   ", {}),
    ("nee     ", dict(nee=True)),
    ("nee+rr  ", dict(nee=True, rr=True)),
    ("rr      ", dict(rr=True)),
):
    render(scene, SIZE, SIZE, spp=SPP, max_bounces=6, seed=1, **kw)  # warm
    t0 = time.perf_counter()
    img, stats = render(scene, SIZE, SIZE, spp=SPP, max_bounces=6, seed=0,
                        **kw)
    wall = time.perf_counter() - t0
    print(f"{label} @ {SPP}spp: PSNR-to-ref {psnr(img, ref):6.2f} dB  "
          f"{wall:5.2f}s  {stats.rays_traced/1e6:.1f} Mrays")
