"""Scene -> device-array packing: the SSBO layer reimagined for HBM.

Reference: initializeSSBOs (RayZen/src/main.cpp:897-1120) builds 8 OpenGL SSBOs —
triangle soup, materials, lights, TLAS/BLAS node + index buffers, instances. Here
the same data becomes a ``SceneArrays`` pytree of jnp arrays: geometry, BVH nodes,
materials and lights are *data* leaves (uploaded once, replicated across chips),
while static layout (per-instance node/triangle offsets) is pytree metadata so jit
specializes on it.

Departures from the reference, by design (SURVEY.md §7):
- Shared meshes are packed once and instanced (the reference duplicates triangles
  and BLAS per GameObject in its soup, main.cpp:971-1007).
- Triangles are stored in BVH leaf order, so the per-BLAS index indirection buffer
  (blasTriIndices, fragment_shader.glsl:81-83) is gone: leaves reference
  contiguous triangle ranges.
- Triangles are stored as (v0, edge1, edge2) since Möller–Trumbore consumes edges
  (fragment_shader.glsl:392-393); v1/v2 are reconstructed only when needed.
- Instance world AABBs (transformed 8 corners of each BLAS root, main.cpp:975-993)
  are computed on device from the current transforms — no host TLAS re-upload per
  frame (the reference rebuilds + re-uploads everything each frame,
  main.cpp:1123-1208).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import logging_util as log
from .accel import native
from .accel.builder import BLAS, build_blas, build_tlas
from .config import RenderConfig
from .light import pack_lights
from .material import pack_materials
from .scene import Scene


@dataclasses.dataclass(frozen=True, eq=True)
class InstanceMeta:
    """Static per-instance layout (the BVHInstance POD, RayZen/include/BVH.h:14-21,
    minus the dynamic transforms which live in SceneArrays.transforms)."""

    node_offset: int  # offset into the concatenated BLAS node arrays
    tri_offset: int  # offset into the global triangle soup (globalTriOffset)
    num_nodes: int
    num_triangles: int
    mesh_index: int  # which unique mesh this instance references


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SceneArrays:
    """Device-resident scene. All leaves are arrays; ``instance_meta`` is static."""

    # Triangle soup, BVH-leaf order (T >= 1).
    tri_v0: jax.Array  # (T, 3) f32
    tri_e1: jax.Array  # (T, 3) f32  (v1 - v0)
    tri_e2: jax.Array  # (T, 3) f32  (v2 - v0)
    tri_mat: jax.Array  # (T,) i32
    # Concatenated BLAS nodes (N >= 1).
    node_bounds: jax.Array  # (N, 6) f32 [bmin | bmax]
    node_meta: jax.Array  # (N, 3) i32 [left_first, count, miss]
    # Instances (I >= 1).
    transforms: jax.Array  # (I, 4, 4) f32 — dynamic, updated per frame
    inv_transforms: jax.Array  # (I, 4, 4) f32
    root_bmin: jax.Array  # (I, 3) f32 object-space BLAS root bounds
    root_bmax: jax.Array  # (I, 3) f32
    # Shading tables.
    materials: jax.Array  # (M, 8) f32
    lights: jax.Array  # (L, 8) f32
    # Static layout.
    instance_meta: Tuple[InstanceMeta, ...] = dataclasses.field(
        metadata=dict(static=True)
    )

    @property
    def num_instances(self) -> int:
        return len(self.instance_meta)

    @property
    def num_lights(self) -> int:
        return int(self.lights.shape[0])

    def with_transforms(self, transforms: np.ndarray) -> "SceneArrays":
        """Functional transform update for dynamic scenes: inverse matrices are
        recomputed host-side (cheap, I×4×4), geometry/BVH untouched."""
        transforms = np.asarray(transforms, dtype=np.float32)
        inv = np.linalg.inv(transforms.astype(np.float64)).astype(np.float32)
        return dataclasses.replace(
            self, transforms=jnp.asarray(transforms), inv_transforms=jnp.asarray(inv)
        )


_blas_cache: dict = {}


def _mesh_blas(mesh, cfg: RenderConfig) -> BLAS:
    """Memoized per-mesh BLAS build (the reference memoizes in function-local
    statics, main.cpp:1128-1136, and disk-caches in bvh_cache/v2)."""
    key = (id(mesh), mesh.num_triangles, cfg.leaf_size, cfg.split_method)
    blas = _blas_cache.get(key)
    if blas is None:
        # native C++ builder when available; identical output to the numpy one
        builder = native.build_blas if native.available() else build_blas
        blas = builder(mesh.vertices, cfg.leaf_size, cfg.split_method)
        _blas_cache[key] = blas
    return blas


def pack_scene(scene: Scene, cfg: RenderConfig | None = None) -> SceneArrays:
    cfg = cfg or RenderConfig()
    unique_meshes = []
    mesh_slot = {}
    for go in scene.game_objects:
        if id(go.mesh) not in mesh_slot:
            mesh_slot[id(go.mesh)] = len(unique_meshes)
            unique_meshes.append(go.mesh)

    tri_v0, tri_e1, tri_e2, tri_mat = [], [], [], []
    bounds_list, meta_list = [], []
    mesh_layout = []  # (node_offset, tri_offset, n_nodes, n_tris) per unique mesh
    node_off = tri_off = 0
    for mesh in unique_meshes:
        blas = _mesh_blas(mesh, cfg)
        verts = mesh.vertices[blas.order]  # leaf order
        mats = mesh.material_index[blas.order]
        tri_v0.append(verts[:, 0])
        tri_e1.append(verts[:, 1] - verts[:, 0])
        tri_e2.append(verts[:, 2] - verts[:, 0])
        tri_mat.append(mats)
        bounds_list.append(
            np.concatenate([blas.bounds_min, blas.bounds_max], axis=1)
        )
        meta_list.append(
            np.stack([blas.left_first, blas.count, blas.miss], axis=1)
        )
        mesh_layout.append((node_off, tri_off, blas.num_nodes, blas.num_triangles))
        node_off += blas.num_nodes
        tri_off += blas.num_triangles

    instance_meta = []
    transforms = []
    root_bmin, root_bmax = [], []
    for go in scene.game_objects:
        slot = mesh_slot[id(go.mesh)]
        n_off, t_off, n_nodes, n_tris = mesh_layout[slot]
        instance_meta.append(InstanceMeta(n_off, t_off, n_nodes, n_tris, slot))
        transforms.append(go.transform)
        root_bmin.append(bounds_list[slot][0, :3])
        root_bmax.append(bounds_list[slot][0, 3:])

    def cat(parts, empty_shape, dtype):
        if not parts or sum(p.shape[0] for p in parts) == 0:
            return np.zeros((1,) + empty_shape, dtype=dtype)
        return np.concatenate(parts).astype(dtype)

    tri_v0 = cat(tri_v0, (3,), np.float32)
    tri_e1 = cat(tri_e1, (3,), np.float32)
    tri_e2 = cat(tri_e2, (3,), np.float32)
    tri_mat = cat(tri_mat, (), np.int32)
    node_bounds = cat(bounds_list, (6,), np.float32)
    node_meta = cat(meta_list, (3,), np.int32)

    if transforms:
        transforms = np.stack(transforms).astype(np.float32)
        inv_transforms = np.linalg.inv(transforms.astype(np.float64)).astype(np.float32)
        root_bmin = np.stack(root_bmin).astype(np.float32)
        root_bmax = np.stack(root_bmax).astype(np.float32)
    else:
        transforms = np.eye(4, dtype=np.float32)[None]
        inv_transforms = transforms.copy()
        root_bmin = np.full((1, 3), np.finfo(np.float32).max, dtype=np.float32)
        root_bmax = -root_bmin

    total_tris = sum(m.num_triangles for m in instance_meta)
    log.info(
        f"Packed scene: {len(unique_meshes)} unique meshes, "
        f"{len(instance_meta)} instances, {total_tris} instanced triangles, "
        f"{node_meta.shape[0]} BVH nodes"
    )

    return SceneArrays(
        tri_v0=jnp.asarray(tri_v0),
        tri_e1=jnp.asarray(tri_e1),
        tri_e2=jnp.asarray(tri_e2),
        tri_mat=jnp.asarray(tri_mat),
        node_bounds=jnp.asarray(node_bounds),
        node_meta=jnp.asarray(node_meta),
        transforms=jnp.asarray(transforms),
        inv_transforms=jnp.asarray(inv_transforms),
        root_bmin=jnp.asarray(root_bmin),
        root_bmax=jnp.asarray(root_bmax),
        materials=jnp.asarray(pack_materials(scene.materials)),
        lights=jnp.asarray(pack_lights(scene.lights)),
        instance_meta=tuple(instance_meta),
    )


def instance_world_aabbs(arrays: SceneArrays):
    """World-space AABB per instance: transform the 8 corners of each BLAS root
    by the instance transform and rebound (main.cpp:975-993). Conservative and
    correct for affine transforms. Runs on device from current transforms."""
    bmin, bmax = arrays.root_bmin, arrays.root_bmax  # (I, 3)
    # (8, 3) selector of min/max per axis
    sel = jnp.asarray(
        [[x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)], dtype=jnp.float32
    )
    corners = bmin[:, None, :] * (1.0 - sel)[None] + bmax[:, None, :] * sel[None]
    # apply transform: (I, 4, 4) @ (I, 8, 4)
    r = jnp.einsum("iab,ikb->ika", arrays.transforms[:, :3, :3], corners)
    w = r + arrays.transforms[:, None, :3, 3]
    # Empty meshes keep inverted root bounds here; traversal skips
    # zero-triangle instances statically so these boxes are never ray-tested.
    return w.min(axis=1), w.max(axis=1)


def build_scene_tlas(arrays: SceneArrays):
    """Host-side TLAS over current instance world AABBs (BVH::buildTLAS parity;
    used for the debug wireframe overlay and large-instance-count traversal)."""
    wmin, wmax = instance_world_aabbs(arrays)
    return build_tlas(np.asarray(wmin), np.asarray(wmax))
