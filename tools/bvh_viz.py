"""BVH inspector (capability parity with bvh_visualizer.c).

The reference is an interactive raylib app drawing wireframe AABB cubes per
tree level (bvh_visualizer.c:22-58). Headless equivalent: dump every level's
child AABBs as wireframe line geometry into a Wavefront OBJ (one `o` object
per depth, so any viewer can toggle levels), skipping the zero ("empty lane")
boxes exactly like the reference (bvh_visualizer.c:44-49).

Usage:
    python tools/bvh_viz.py <model.(obj|glb|gltf|npz)> [out.obj]
"""

from __future__ import annotations

import sys

import numpy as np

# 12 box edges as pairs of corner indices (corners in zyx bit order)
_EDGES = [
    (0, 1), (0, 2), (1, 3), (2, 3),
    (4, 5), (4, 6), (5, 7), (6, 7),
    (0, 4), (1, 5), (2, 6), (3, 7),
]


def dump_bvh_obj(scene, out_path: str) -> dict:
    """Write wireframe AABBs per level; returns {depth: n_boxes}."""
    mins, maxs = scene.bvh.child_boxes_np()  # (n_internal, 8, 3) each
    depth = scene.bvh.depth

    lines = ["# BVH wireframe dump (one object per level)"]
    vert_count = 0
    stats = {}

    level_start = 0
    level_size = 1
    for d in range(depth):
        boxes = []
        for node in range(level_start, level_start + level_size):
            for j in range(8):
                lo = mins[node, j]
                hi = maxs[node, j]
                if (lo == 0).all() and (hi == 0).all():
                    continue  # empty lane (bvh_visualizer.c:44-49)
                boxes.append((lo, hi))
        stats[d] = len(boxes)
        lines.append(f"o level_{d}")
        for lo, hi in boxes:
            corners = [
                [hi[0] if i & 1 else lo[0],
                 hi[1] if i & 2 else lo[1],
                 hi[2] if i & 4 else lo[2]]
                for i in range(8)
            ]
            for c in corners:
                lines.append(f"v {c[0]:.6f} {c[1]:.6f} {c[2]:.6f}")
            for a, b in _EDGES:
                lines.append(f"l {vert_count + a + 1} {vert_count + b + 1}")
            vert_count += 8
        level_start += level_size
        level_size *= 8

    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return stats


def main(argv):
    path = argv[0]
    out = argv[1] if len(argv) > 1 else "bvh_wireframe.obj"
    if path.endswith(".npz"):
        from raytracing_c_tpu.models.serialization import load_scene_cache

        scene = load_scene_cache(path)
    else:
        from raytracing_c_tpu.io.loader import load_scene

        scene = load_scene(path, background_path=None, warn=lambda *a: None)
    stats = dump_bvh_obj(scene, out)
    total = sum(stats.values())
    print(f"wrote {out}: depth={scene.bvh.depth}, "
          + ", ".join(f"level {d}: {n} boxes" for d, n in stats.items())
          + f" ({total} total)")


if __name__ == "__main__":
    main(sys.argv[1:])
