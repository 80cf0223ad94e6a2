"""Trace one full render_batch on a geometry-heavy tile batch; dump op
aggregates to find the non-intersect time."""

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
from raytracing_c_tpu.render.renderer import render_batch

scene = load_scene("/root/reference/models/helmet.glb",
                   background_path=None, warn=lambda *a: None)

# center tile region (helmet fills it -> full bounce depth)
P = 16384
ids = np.arange(P, dtype=np.int32)
px = jnp.asarray(832 + ids % 256)
py = jnp.asarray(476 + (ids // 256) % 64)
key = jax.random.PRNGKey(0)

kw = dict(width=1920, height=1080, spp=16, max_bounces=8,
          method=os.environ.get("PROFILE_METHOD", "pallas"),
          compact=os.environ.get("PROFILE_COMPACT", "1") == "1")
rgb, rays = render_batch(scene, px, py, key, **kw)
jax.block_until_ready(rgb)
print("rays per batch:", float(rays))

out_dir = "/tmp/jaxtrace3"
os.system(f"rm -rf {out_dir}")
with jax.profiler.trace(out_dir):
    for i in range(2):
        rgb, rays = render_batch(scene, px, py, jax.random.PRNGKey(i), **kw)
    jax.block_until_ready(rgb)

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
tot = sum(agg.values())
print("TPU total:", round(tot, 1), "ms over 2 batches")
for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:28]:
    extra = args_by_name.get(name, {})
    longname = str(extra.get("long_name", ""))[:120]
    print(f"{ms/2:8.2f} ms x{cnt[name]//2:<4d} {name[:40]:40s} {longname}")
