"""Device-resident scene representation.

The reference stores the scene as SoA triangle arrays plus an implicit
complete 8-ary BVH (scene.h:44-97). That layout was designed for 8-wide SIMD
and maps directly onto TPU-resident jnp arrays, so we keep it:

- `Triangles`: flat padded arrays, leaf-block-major (block b owns triangles
  [8b, 8b+8)), mirroring `triangles_init`/`triangles_insert` (scene.c:78-155).
- `BVH`: internal nodes only; node i's children are `8*i + 1 + j`; children
  with index >= `last_row_offset` are leaf blocks at
  `(child - last_row_offset)` (scene.h:72-90, raytracer.c:474-476).
- The reference's per-triangle function-pointer `Shader` (scene.h:30-42)
  becomes a per-triangle `mat_id` into a `MaterialTable` (struct-of-arrays),
  shaded by a single branchless ubershader — no divergence on TPU.
- Textures live in one flat u8 atlas (`TextureAtlas`), sampled by gather.

Everything is a pytree (flax.struct) so a `Scene` can be passed through jit /
shard_map; static ints (tree depth etc.) are pytree aux data.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import struct

from raytracing_c_tpu import BVH_WIDTH

# Shader kinds (reference: disney_shader_proc driver.c:350, debug_shader_proc
# driver.c:411; the debug shader renders shading normals and terminates).
SHADER_DISNEY = 0
SHADER_DEBUG_NORMAL = 1

# Background kinds (reference Background_Proc scene.h:65-70).
BG_CONSTANT = 0
BG_EQUIRECT = 1


class Camera(struct.PyTreeNode):
    """Pinhole camera (reference scene.h:14-17).

    `view_matrix` is camera-to-world: rays are generated in camera space with
    -Z forward and rotated by the upper-left 3x3; the camera position is the
    translation column (raytracer.c:612, 653-685).
    """

    view_matrix: Any  # (4, 4) f32
    fov: Any  # scalar f32 (radians)
    focal_length: Any  # scalar f32 = 1 / tan(fov / 2)

    @staticmethod
    def default() -> "Camera":
        """Reference default: position (0,0,3), identity rotation, 70deg fov
        (driver.c:765-767)."""
        m = np.eye(4, dtype=np.float32)
        m[:3, 3] = [0.0, 0.0, 3.0]
        fov = np.float32(70.0 / 360.0 * 2.0 * np.pi)
        return Camera(
            view_matrix=jnp.asarray(m),
            fov=jnp.float32(fov),
            focal_length=jnp.float32(1.0 / np.tan(fov * 0.5)),
        )


class Triangles(struct.PyTreeNode):
    """Padded SoA triangle store, leaf-block-major (scene.h:44-63).

    `v0/v1/v2` are vertex positions; `e1/e2` are precomputed edges used by the
    Moller-Trumbore kernel (raytracer.c:115-122 computes them per test; we
    compute once at build). Padding slots are all-zero, which the epsilon
    tests naturally reject (SURVEY §3.3).
    """

    v0: Any  # (N, 3) f32
    v1: Any
    v2: Any
    e1: Any  # v1 - v0
    e2: Any  # v2 - v0
    n0: Any  # (N, 3) vertex normals
    n1: Any
    n2: Any
    ng: Any  # (N, 3) geometric (face) normal
    tangent: Any  # (N, 3)
    bitangent: Any  # (N, 3)
    uv0: Any  # (N, 2)
    uv1: Any
    uv2: Any
    mat_id: Any  # (N,) i32, -1 for padding slots

    @property
    def capacity(self) -> int:
        return self.v0.shape[0]


class BVH(struct.PyTreeNode):
    """Implicit complete 8-ary BVH; internal nodes only (scene.h:72-90)."""

    mins: Any  # (n_internal, 8, 3) f32 child AABB minima
    maxs: Any  # (n_internal, 8, 3) f32
    depth: int = struct.field(pytree_node=False)
    last_row_offset: int = struct.field(pytree_node=False)

    @property
    def n_internal(self) -> int:
        return self.mins.shape[0]


class MaterialTable(struct.PyTreeNode):
    """PBR material parameters, struct-of-arrays (reference PBR_Shader_Data,
    driver.c:191-198). Texture ids index the TextureAtlas; -1 means none."""

    base_color: Any  # (M, 3) f32
    emission: Any  # (M, 3) f32
    roughness: Any  # (M,) f32
    metalness: Any  # (M,) f32
    normal_strength: Any  # (M,) f32
    sheen: Any  # (M,) f32
    sheen_tint: Any  # (M,) f32
    anisotropic: Any  # (M,) f32
    tex_albedo: Any  # (M,) i32
    tex_normal: Any  # (M,) i32
    tex_mr: Any  # (M,) i32
    tex_emission: Any  # (M,) i32
    shader_kind: Any  # (M,) i32 (SHADER_DISNEY | SHADER_DEBUG_NORMAL)

    @staticmethod
    def default(n: int = 1) -> "MaterialTable":
        """A single mid-grey diffuse material (MTL defaults, driver.c:549-556)."""
        return MaterialTable(
            base_color=jnp.full((n, 3), 0.8, jnp.float32),
            emission=jnp.zeros((n, 3), jnp.float32),
            roughness=jnp.full((n,), 0.5, jnp.float32),
            metalness=jnp.zeros((n,), jnp.float32),
            normal_strength=jnp.zeros((n,), jnp.float32),
            sheen=jnp.zeros((n,), jnp.float32),
            sheen_tint=jnp.zeros((n,), jnp.float32),
            anisotropic=jnp.zeros((n,), jnp.float32),
            tex_albedo=jnp.full((n,), -1, jnp.int32),
            tex_normal=jnp.full((n,), -1, jnp.int32),
            tex_mr=jnp.full((n,), -1, jnp.int32),
            tex_emission=jnp.full((n,), -1, jnp.int32),
            shader_kind=jnp.zeros((n,), jnp.int32),
        )


class TextureAtlas(struct.PyTreeNode):
    """All textures packed into one flat u8 texel array.

    Texture k owns texels [offset[k], offset[k] + width[k]*height[k]) in
    row-major order; sampling is a flat gather (the TPU-native replacement
    for the reference's pointer-chasing samplers, driver.c:31-93).
    Index 0 is always a 1x1 white dummy so that gathers for "no texture"
    lanes stay in-bounds.
    """

    texels: Any  # (T, 3) u8
    offset: Any  # (K,) i32
    width: Any  # (K,) i32
    height: Any  # (K,) i32

    @staticmethod
    def empty() -> "TextureAtlas":
        return TextureAtlas(
            texels=jnp.full((1, 3), 255, jnp.uint8),
            offset=jnp.zeros((1,), jnp.int32),
            width=jnp.ones((1,), jnp.int32),
            height=jnp.ones((1,), jnp.int32),
        )


class Spheres(struct.PyTreeNode):
    """Analytic sphere primitives (reference raytracer.h:35-42; kept as a
    first-class primitive per SURVEY §2.8c even though the reference driver
    never populates it)."""

    center: Any  # (S, 3) f32
    radius: Any  # (S,) f32
    mat_id: Any  # (S,) i32

    @staticmethod
    def empty() -> "Spheres":
        return Spheres(
            center=jnp.zeros((0, 3), jnp.float32),
            radius=jnp.zeros((0,), jnp.float32),
            mat_id=jnp.zeros((0,), jnp.int32),
        )

    @property
    def count(self) -> int:
        return self.center.shape[0]


class Background(struct.PyTreeNode):
    """Environment light: constant color or equirect env map
    (reference sample_background driver.c:95-104)."""

    kind: int = struct.field(pytree_node=False, default=BG_CONSTANT)
    color: Any = None  # (3,) f32 linear, for BG_CONSTANT
    tex_id: int = struct.field(pytree_node=False, default=-1)  # atlas index

    @staticmethod
    def constant(rgb) -> "Background":
        return Background(
            kind=BG_CONSTANT,
            color=jnp.asarray(rgb, jnp.float32),
            tex_id=-1,
        )

    @staticmethod
    def equirect(tex_id: int) -> "Background":
        return Background(
            kind=BG_EQUIRECT,
            color=jnp.zeros((3,), jnp.float32),
            tex_id=tex_id,
        )


class Scene(struct.PyTreeNode):
    """Full scene: Scene{bvh, camera, triangles, background} (scene.h:92-97)
    plus the material/texture tables and optional spheres."""

    triangles: Triangles
    bvh: BVH
    materials: MaterialTable
    atlas: TextureAtlas
    spheres: Spheres
    background: Background
    camera: Camera
    n_triangles: int = struct.field(pytree_node=False, default=0)  # unpadded


# ---------------------------------------------------------------------------
# Host-side construction helpers (numpy in, pytree out)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class HostMesh:
    """Host-side triangle soup prior to BVH build (the analog of the
    reference's `Triangle_Slice`, scene.h:37-44)."""

    positions: np.ndarray  # (n, 3, 3) f32  [tri, vertex, xyz]
    normals: np.ndarray  # (n, 3, 3) f32
    uvs: np.ndarray  # (n, 3, 2) f32
    mat_id: np.ndarray  # (n,) i32


def compute_tangents(positions: np.ndarray, uvs: np.ndarray):
    """Face normal + per-triangle tangent/bitangent from UV deltas with the
    degenerate-UV clamp, mirroring triangles_insert (scene.c:105-155).

    Returns (ng, tangent, bitangent), each (n, 3) f32.
    """
    p0, p1, p2 = positions[:, 0], positions[:, 1], positions[:, 2]
    e1 = p1 - p0
    e2 = p2 - p0

    ng = np.cross(e1, e2)
    ng_len = np.linalg.norm(ng, axis=-1, keepdims=True)
    ng = ng / np.maximum(ng_len, 1e-30)

    duv1 = uvs[:, 1] - uvs[:, 0]
    duv2 = uvs[:, 2] - uvs[:, 0]
    d = duv1[:, 0] * duv2[:, 1] - duv2[:, 0] * duv1[:, 1]
    # degenerate-UV clamp (scene.c:128-135): |d| < 1e-4 snaps to +/-1e-4
    small = np.abs(d) < 1e-4
    d = np.where(small, np.where(d < 0, -1e-4, 1e-4), d)
    inv_d = (1.0 / d)[:, None]

    tangent = (e1 * duv2[:, 1:2] - e2 * duv1[:, 1:2]) * inv_d
    bitangent = (e2 * duv1[:, 0:1] - e1 * duv2[:, 0:1]) * inv_d

    def _norm(v):
        n = np.linalg.norm(v, axis=-1, keepdims=True)
        return v / np.maximum(n, 1e-30)

    return (
        ng.astype(np.float32),
        _norm(tangent).astype(np.float32),
        _norm(bitangent).astype(np.float32),
    )


def pack_triangles(mesh: HostMesh, slot_map: np.ndarray) -> Triangles:
    """Pack host triangles into the device SoA layout according to the BVH
    build's leaf-slot assignment.

    `slot_map` is (capacity,) int with -1 marking empty padding slots; padding
    slots become all-zero triangles, which the Moller-Trumbore epsilon tests
    naturally reject (SURVEY §3.3).
    """
    capacity = len(slot_map)
    assert capacity % BVH_WIDTH == 0
    valid = slot_map >= 0
    idx = np.where(valid, slot_map, 0)

    def place(a: np.ndarray) -> np.ndarray:
        out = a[idx]
        out[~valid] = 0
        return out

    pos = place(mesh.positions.astype(np.float32))
    nrm = place(mesh.normals.astype(np.float32))
    uv = place(mesh.uvs.astype(np.float32))
    ng, tan, btn = compute_tangents(pos, uv)
    ng[~valid] = 0.0
    tan[~valid] = 0.0
    btn[~valid] = 0.0
    mat = mesh.mat_id.astype(np.int32)[idx]
    mat[~valid] = -1

    v0, v1, v2 = pos[:, 0], pos[:, 1], pos[:, 2]
    return Triangles(
        v0=jnp.asarray(v0),
        v1=jnp.asarray(v1),
        v2=jnp.asarray(v2),
        e1=jnp.asarray(v1 - v0),
        e2=jnp.asarray(v2 - v0),
        n0=jnp.asarray(nrm[:, 0]),
        n1=jnp.asarray(nrm[:, 1]),
        n2=jnp.asarray(nrm[:, 2]),
        ng=jnp.asarray(ng),
        tangent=jnp.asarray(tan),
        bitangent=jnp.asarray(btn),
        uv0=jnp.asarray(uv[:, 0]),
        uv1=jnp.asarray(uv[:, 1]),
        uv2=jnp.asarray(uv[:, 2]),
        mat_id=jnp.asarray(mat),
    )


def build_scene(
    mesh: HostMesh,
    materials: "MaterialTable",
    atlas: "TextureAtlas",
    background: "Background",
    camera: "Camera",
    spheres: "Spheres | None" = None,
) -> "Scene":
    """scene_init (scene.c:416-426): build the BVH and pack the SoA store."""
    from raytracing_c_tpu.models.bvh import build_bvh

    bvh, slot_map, _capacity = build_bvh(mesh)
    triangles = pack_triangles(mesh, slot_map)
    return Scene(
        triangles=triangles,
        bvh=bvh,
        materials=materials,
        atlas=atlas,
        spheres=spheres if spheres is not None else Spheres.empty(),
        background=background,
        camera=camera,
        n_triangles=int(mesh.positions.shape[0]),
    )
