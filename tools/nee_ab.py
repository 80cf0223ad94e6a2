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


# ---------------------------------------------------------------------------
# HDRI phase (VERDICT r2 #8 "done" bar): the constant-sky A/B above never
# engages the round-3 env-CDF sampler (uniform light everywhere = nothing to
# importance-sample). Synthesize an equirect sun-disk map — dark gradient sky
# + a ~3-texel 255-value sun (linear contrast ~2000:1 after the pure-pow
# decode) — and re-run tower with it as the background/env light. NEE draws
# ride the alias table (ops/env_light.py), so nearly every light sample lands
# on the sun; plain BRDF sampling at 8 spp almost never finds it.
# ---------------------------------------------------------------------------
import os

from PIL import Image

EW, EH = 256, 128
u = (np.arange(EW) + 0.5) / EW
v = (np.arange(EH) + 0.5) / EH
sky = (10.0 + 14.0 * np.sin(np.pi * v)[:, None] * np.ones((1, EW)))
su, sv = 0.70, 0.30  # sun center (u, v)
du = np.minimum(np.abs(u[None, :] - su), 1.0 - np.abs(u[None, :] - su))
dv = np.abs(v[:, None] - sv)
sun = (du * EW) ** 2 + (dv * EH) ** 2 <= 3.0**2
env_u8 = np.where(sun, 255.0, sky).astype(np.uint8)
env_rgb = np.stack([env_u8, env_u8, (0.8 * env_u8).astype(np.uint8)], -1)
hdri_path = "/tmp/nee_ab_sun.png"
Image.fromarray(env_rgb).save(hdri_path)

scene_h = load_scene("/root/reference/models/tower.obj",
                     background_path=hdri_path, warn=lambda *a: None)
assert scene_h.env_light is not None, "env-CDF tables must engage"

print(f"\nHDRI phase (sun-disk equirect {EW}x{EH}):")
ref_h, _ = render(scene_h, SIZE, SIZE, spp=128, max_bounces=6, seed=999,
                  nee=True)

for label, spp, kw in (
    ("plain   ", 8, {}),
    ("plain   ", 16, {}),
    ("nee     ", 8, dict(nee=True)),
):
    render(scene_h, SIZE, SIZE, spp=spp, max_bounces=6, seed=1, **kw)
    t0 = time.perf_counter()
    img, stats = render(scene_h, SIZE, SIZE, spp=spp, max_bounces=6,
                        seed=0, **kw)
    wall = time.perf_counter() - t0
    print(f"{label} @ {spp:3d}spp: PSNR-to-ref {psnr(img, ref_h):6.2f} dB  "
          f"{wall:5.2f}s  {stats.rays_traced/1e6:.1f} Mrays")
