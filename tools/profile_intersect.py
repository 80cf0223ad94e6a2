"""Trace the verified intersect + full render_batch; dump op aggregates."""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from raytracing_c_tpu.io.loader import load_scene
from raytracing_c_tpu.ops import traverse
from raytracing_c_tpu.render.camera import generate_rays

R = 262144
key = jax.random.PRNGKey(0)
scene = load_scene("/root/reference/models/helmet.glb",
                   background_path=None, warn=lambda *a: None)

px = jnp.asarray((np.arange(R, dtype=np.int32) % 1920))
py = jnp.asarray((np.arange(R, dtype=np.int32) // 1920) % 1080)
ju = jax.random.uniform(key, (2, R))
o_cam, d_cam = generate_rays(scene.camera, 1920, 1080, px, py, ju[0], ju[1])


@jax.jit
def verified():
    return traverse.intersect_bvh_verified(
        o_cam, d_cam, scene.triangles, scene.bvh)["t"].sum()


jax.block_until_ready(verified())

out_dir = "/tmp/jaxtrace2"
os.system(f"rm -rf {out_dir}")
with jax.profiler.trace(out_dir):
    for _ in range(3):
        jax.block_until_ready(verified())

tr = glob.glob(f"{out_dir}/**/*.trace.json.gz", recursive=True)[0]
d = json.load(gzip.open(tr))
evs = d.get("traceEvents", [])
pids = {}
for e in evs:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pids[e["pid"]] = e["args"].get("name", "")
agg = defaultdict(float)
cnt = defaultdict(int)
args_by_name = {}
for e in evs:
    if e.get("ph") == "X" and "TPU" in pids.get(e.get("pid"), ""):
        agg[e["name"]] += e.get("dur", 0) / 1e3
        cnt[e["name"]] += 1
        if e.get("args"):
            args_by_name.setdefault(e["name"], e["args"])
print("TPU total:", round(sum(agg.values()), 1), "ms over 3 runs")
for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:20]:
    extra = args_by_name.get(name, {})
    longname = str(extra.get("long_name", ""))[:140]
    print(f"{ms/3:8.2f} ms x{cnt[name]//3:<4d} {name[:60]:60s} {longname}")
