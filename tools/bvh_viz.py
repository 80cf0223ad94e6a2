"""BVH inspector (capability parity with bvh_visualizer.c).

The reference is an interactive raylib app drawing wireframe AABB cubes per
tree level (bvh_visualizer.c:22-58). Headless equivalent: dump every level's
child AABBs as wireframe line geometry into a Wavefront OBJ (one `o` object
per depth, so any viewer can toggle levels), skipping the zero ("empty lane")
boxes exactly like the reference (bvh_visualizer.c:44-49).

Usage:
    python tools/bvh_viz.py <model.(obj|glb|gltf|npz)> [out.obj]
    python tools/bvh_viz.py <model> --overlay <prefix> [size]

--overlay renders the scene once and writes <prefix>_level<d>.png per BVH
level with the level's AABB wireframes projected over the render — the
closest headless analog of the reference app's arrow-key level stepping
(bvh_visualizer.c:60-107).
"""

from __future__ import annotations

import sys

import numpy as np


def _ensure_backend():
    """The harness pins JAX_PLATFORMS=axon; fall back to CPU when the axon
    plugin isn't importable (e.g. plain PYTHONPATH=/root/repo runs)."""
    import importlib.util

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    if importlib.util.find_spec("axon_site") is None and not any(
        "axon" in p for p in sys.path
    ):
        try:
            jax.devices()
        except RuntimeError:
            jax.config.update("jax_platforms", "cpu")

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


def _project(camera, pts, width, height):
    """World points (N, 3) -> (px, py, in_front) under the pinhole model of
    render/camera.generate_rays (raytracer.c:641-698), inverted."""
    m = np.asarray(camera.view_matrix, np.float64)
    rot = m[:3, :3]
    org = m[:3, 3]
    c = (pts - org) @ rot  # R^T (P - origin): camera space, -z forward
    in_front = c[:, 2] < -1e-9
    zi = np.where(in_front, -c[:, 2], 1.0)
    f = float(camera.focal_length)
    aspect = width / height
    u = c[:, 0] * f / zi / aspect
    v = -(c[:, 1] * f / zi)
    px = (u + 1.0) * width / 2.0 - 0.5
    py = (v + 1.0) * height / 2.0 - 0.5
    return px, py, in_front


LEVEL_COLORS = [(255, 80, 80), (80, 220, 80), (90, 140, 255), (255, 200, 60),
                (220, 90, 220)]


def overlay_levels(scene, prefix: str, size: int = 512) -> None:
    """Render once, then write one PNG per level with that level's child
    AABBs drawn as projected wireframes."""
    from PIL import Image, ImageDraw

    from raytracing_c_tpu.render.renderer import render

    img, _ = render(scene, size, size, spp=4, max_bounces=3, seed=0)
    base = Image.fromarray(img)

    mins, maxs = scene.bvh.child_boxes_np()
    level_start, level_size = 0, 1
    for d in range(scene.bvh.depth):
        im = base.copy()
        draw = ImageDraw.Draw(im)
        color = LEVEL_COLORS[d % len(LEVEL_COLORS)]
        n = 0
        for node in range(level_start, level_start + level_size):
            for j in range(8):
                lo, hi = mins[node, j], maxs[node, j]
                if (lo == 0).all() and (hi == 0).all():
                    continue
                corners = np.array([
                    [hi[0] if i & 1 else lo[0],
                     hi[1] if i & 2 else lo[1],
                     hi[2] if i & 4 else lo[2]]
                    for i in range(8)
                ])
                px, py, ok = _project(scene.camera, corners, size, size)
                for a, b in _EDGES:
                    if ok[a] and ok[b]:
                        draw.line(
                            (px[a], py[a], px[b], py[b]), fill=color
                        )
                n += 1
        out = f"{prefix}_level{d}.png"
        im.save(out)
        print(f"{out}: {n} boxes")
        level_start += level_size
        level_size *= 8


def main(argv):
    _ensure_backend()
    path = argv[0]
    if len(argv) >= 3 and argv[1] == "--overlay":
        if path.endswith(".npz"):
            from raytracing_c_tpu.models.serialization import load_scene_cache

            scene = load_scene_cache(path)
        else:
            from raytracing_c_tpu.io.loader import load_scene

            scene = load_scene(path, background_path=None,
                               warn=lambda *a: None)
        size = int(argv[3]) if len(argv) > 3 else 512
        overlay_levels(scene, argv[2], size)
        return
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
