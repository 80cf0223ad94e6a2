"""Quick TPU perf probe for the traversal/integrator hot path."""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from raytracing_c_tpu.io.loader import load_scene
from raytracing_c_tpu.render.renderer import render_batch

MODEL = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/models/helmet.glb"
R = int(sys.argv[2]) if len(sys.argv) > 2 else 262144
SPP = int(sys.argv[3]) if len(sys.argv) > 3 else 1
BOUNCES = int(sys.argv[4]) if len(sys.argv) > 4 else 8

print("backend:", jax.default_backend(), jax.devices())
t0 = time.time()
scene = load_scene(MODEL, background_path=None, warn=lambda *a: None)
print("scene load+build:", round(time.time() - t0, 2), "s;",
      "tris:", scene.n_triangles, "depth:", scene.bvh.depth,
      "capacity:", scene.triangles.capacity)

P = R // SPP
W = 1920
H = 1080
xs = (np.arange(P, dtype=np.int32) * 7919) % W
ys = ((np.arange(P, dtype=np.int32) * 104729) // W) % H
px = jnp.asarray(xs)
py = jnp.asarray(ys)

key = jax.random.PRNGKey(0)
t0 = time.time()
METHOD = sys.argv[5] if len(sys.argv) > 5 else "topk"
rgb, rays = render_batch(
    scene, px, py, key, width=W, height=H, spp=SPP, max_bounces=BOUNCES,
    method=METHOD,
)
jax.block_until_ready(rgb)
print("first call:", round(time.time() - t0, 2), "s")

for i in range(3):
    t0 = time.time()
    rgb, rays = render_batch(
        scene, px, py, jax.random.PRNGKey(i + 1),
        width=W, height=H, spp=SPP, max_bounces=BOUNCES,
        method=METHOD,
    )
    jax.block_until_ready(rgb)
    dt = time.time() - t0
    r = float(rays)
    print(
        f"run {i}: {dt*1e3:.1f} ms, rays={r:.0f}, "
        f"Mrays/s={r/1e6/dt:.2f}, samples/s={R/dt/1e6:.2f}M"
    )
