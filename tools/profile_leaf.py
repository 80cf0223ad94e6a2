"""Capture a jax.profiler trace of the leaf stage and dump per-op stats."""

import glob
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from raytracing_c_tpu import BVH_WIDTH as W
from raytracing_c_tpu.io.loader import load_scene
from raytracing_c_tpu.ops.traverse import _leaf_mt
from raytracing_c_tpu.utils.vec3 import Vec3

R = 65536
key = jax.random.PRNGKey(0)
scene = load_scene("/root/reference/models/helmet.glb",
                   background_path=None, warn=lambda *a: None)
tris = scene.triangles
g = jax.random.normal(key, (3, R), jnp.float32)
dirv = Vec3(g[0], g[1], g[2]).normalized()
origin = Vec3(jnp.zeros((R,)), jnp.zeros((R,)), jnp.full((R,), 3.0))
lane = jnp.arange(W, dtype=jnp.int32)
rr = jnp.arange(R)


@jax.jit
def leaf(i):
    o = Vec3(origin.x + i * 1e-7, origin.y, origin.z)
    blocks = jnp.broadcast_to(
        (jnp.arange(16, dtype=jnp.int32) * 17 % 4096)[:, None], (16, R)
    )
    tri_idx = (blocks[None] * W + lane[:, None, None]).reshape(W * 16, R)
    t, u, v = _leaf_mt(o, dirv, tris, tri_idx)
    j = jnp.argmin(t, axis=0)
    return jnp.where(jnp.isfinite(t[j, rr]), t[j, rr], 0.0).sum()


jax.block_until_ready(leaf(jnp.float32(0)))

out_dir = "/tmp/jaxtrace"
os.system(f"rm -rf {out_dir}")
with jax.profiler.trace(out_dir):
    for i in range(3):
        jax.block_until_ready(leaf(jnp.float32(i)))

files = glob.glob(f"{out_dir}/**/*.xplane.pb", recursive=True)
print("trace files:", files)

try:
    from tensorboard_plugin_profile.convert import raw_to_tool_data as r2t

    for tool in ("framework_op_stats", "op_profile"):
        try:
            data, _ = r2t.xspace_to_tool_data(files, tool, {})
            out = f"/tmp/{tool}.out"
            mode = "wb" if isinstance(data, bytes) else "w"
            with open(out, mode) as f:
                f.write(data)
            print("wrote", out, len(data))
        except Exception as e:
            print(tool, "failed:", e)
except Exception as e:
    print("convert failed:", e)
