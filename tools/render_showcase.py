"""Render the reference's test scenes into showcase images (the analog of
the reference's checked-in output.png / tower.png golden artifacts).

The flagship is helmet.glb — the fully-textured glTF (4x 2048^2 PBR
textures), not helmet.obj whose MTL is an untextured pink placeholder.
The helmet also gets a noisy/denoised pair showcasing the firefly
denoiser (ops/denoise_pallas.py).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/render_showcase.py
"""

import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")
from raytracing_c_tpu.io.image_io import write_png
from raytracing_c_tpu.io.loader import load_scene
from raytracing_c_tpu.ops.denoise import denoise_u8
from raytracing_c_tpu.render.renderer import render

MODELS = "/root/reference/models"
OUT = "/root/repo/artifacts"
os.makedirs(OUT, exist_ok=True)

CASES = [
    ("helmet.glb", 768, 768, 32, 8, False),
    ("helmet_back.glb", 512, 512, 16, 8, False),
    ("spheres.glb", 512, 512, 16, 8, False),
    ("sheen.glb", 512, 512, 16, 8, False),
    ("tower.obj", 512, 512, 16, 8, True),
    ("fov_test.obj", 512, 512, 8, 4, False),
]

for model, w, h, spp, bounces, denoise in CASES:
    t0 = time.time()
    scene = load_scene(f"{MODELS}/{model}", background_path=None,
                       warn=lambda *a: None)
    img, stats = render(scene, w, h, spp=spp, max_bounces=bounces, seed=0)
    if denoise:
        import jax.numpy as jnp
        import numpy as np

        img = np.asarray(denoise_u8(jnp.asarray(img)))
    name = os.path.splitext(model)[0]
    write_png(f"{OUT}/{name}.png", img)
    print(f"{model}: {time.time()-t0:.1f}s "
          f"({stats.mrays_per_sec:.2f} Mrays/s, {stats.rays_traced} rays)")

# denoiser before/after pair: a deliberately noisy low-spp helmet render
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

scene = load_scene(f"{MODELS}/helmet.glb", background_path=None,
                   warn=lambda *a: None)
noisy, _ = render(scene, 512, 512, spp=2, max_bounces=8, seed=0)
write_png(f"{OUT}/helmet_noisy_2spp.png", noisy)
write_png(f"{OUT}/helmet_denoised_2spp.png",
          np.asarray(denoise_u8(jnp.asarray(noisy))))
print("denoiser before/after pair written")
