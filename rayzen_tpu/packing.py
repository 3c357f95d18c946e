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
import os
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
    inst_mat_override: jax.Array  # (I,) i32 — per-instance material override,
    # -1 keeps the mesh's per-triangle materials (GameObject.material_override)
    # ---- unified world-space BVH (static topology, device-refit bounds) ----
    # The TLAS and every instance's BLAS are stitched into ONE threaded tree:
    # TLAS leaves point at their instance's BLAS root, and BLAS escape links
    # (-1) are remapped to the owning TLAS leaf's miss link. Traversal is then
    # a single world-space walk — no per-instance ray transforms, no scan over
    # instances. Topology is static; bounds/triangles are recomputed on device
    # from the current transforms each frame (world_geometry below).
    uni_meta: jax.Array  # (Nu, 3) i32 [left_or_first, count, miss], stitched
    blas_src: jax.Array  # (Nb,) i32 — source row in node_bounds per BLAS node
    blas_inst: jax.Array  # (Nb,) i32 — owning instance per BLAS node
    tlas_mask: jax.Array  # (Nt, I) bool — instances under each TLAS node
    wtri_src: jax.Array  # (Tw,) i32 — source row in tri_* per world triangle
    wtri_inst: jax.Array  # (Tw,) i32 — owning instance per world triangle
    node_leaf_tri: jax.Array  # (Nu, K) i32 — world-tri ids inlined per leaf
    # BVH2 child-table view of the same tree (for the ordered stack kernels):
    # unary TLAS leaves are elided, children are explicit. child_node = -1
    # marks a padding child (empty box, never hit).
    bvh2_child_node: jax.Array  # (Ni, 2) i32 — unified node id per child
    bvh2_child_ref: jax.Array  # (Ni, 2) i32 — inner index | leaf-table index
    bvh2_child_count: jax.Array  # (Ni, 2) i32 — -1 internal; >=0 leaf count
    bvh2_leaf_node: jax.Array  # (L,) i32 — unified node id per leaf-table row
    # BVH8 wide-node view (collapsed from the BVH2 view at pack time): one
    # traversal step tests 8 children, so packets take ~3x fewer iterations
    # and the per-iteration consensus reduction amortizes 4x. Same leaf table.
    bvh8_child_node: jax.Array  # (N8, 8) i32 — unified node id (-1 = padding)
    bvh8_child_ref: jax.Array  # (N8, 8) i32 — inner index | permuted leaf row
    bvh8_child_count: jax.Array  # (N8, 8) i32 — -1 internal; >=0 leaf count
    # Dedicated wide-leaf layout: each wide node's leaf children are rows
    # [leaf_start, leaf_start + leaf_n) of the PERMUTED leaf table
    # (leaf8_table = leaf_table[bvh8_leaf_perm]), so the wide walk processes
    # one node's leaf hits as a dense contiguous row loop.
    bvh8_leaf_start: jax.Array  # (N8,) i32
    bvh8_leaf_n: jax.Array  # (N8,) i32
    bvh8_leaf_perm: jax.Array  # (L8,) i32 — original leaf row per permuted row
    # Tiered (HBM-streamed treelet) view for scenes whose tables exceed VMEM:
    # the BVH2 tree is cut into treelets of <= TRE_SI inner rows / <= TRE_SL
    # leaf rows each; the small top tree stays VMEM-resident and its treelet
    # children (count == -2) are walked from DMA'd fixed-size HBM blocks.
    # Built only past the single-tree VMEM budget (1-row dummies otherwise;
    # top_child_count[0,0] == 0 marks "absent").
    top_child_node: jax.Array  # (Nt, 2) i32 — unified node id per child
    top_child_ref: jax.Array  # (Nt, 2) i32 — top index | treelet id
    top_child_count: jax.Array  # (Nt, 2) i32 — -1 internal; -2 treelet
    tre_child_node: jax.Array  # (Tt, SI, 2) i32 — unified ids (refit); -1 pad
    tre_child_ref: jax.Array  # (Tt, SI, 2) i32 — local inner row | local leaf slot
    tre_child_count: jax.Array  # (Tt, SI, 2) i32 — -1 internal; >=0 leaf count
    tre_leaf_src: jax.Array  # (Tt, SL) i32 — global leaf-table row per slot (-1 pad)
    # Shading tables.
    materials: jax.Array  # (M, 8) f32
    lights: jax.Array  # (L, 8) f32
    # Static layout.
    instance_meta: Tuple[InstanceMeta, ...] = dataclasses.field(
        metadata=dict(static=True)
    )
    # Measured inner-node depth of the BVH2 ordered-walk tree (pack time,
    # host). 0 = unknown (e.g. reconstructed objects missing it). Used to
    # bound multi-pop walk width (megakernel._pick_pop_n): multi-pop stack
    # occupancy can reach ~pop_n x depth (ADVICE r3).
    tree_depth: int = dataclasses.field(metadata=dict(static=True), default=0)

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
        t_dev, i_dev = jax.device_put((transforms, inv))  # one transfer
        return dataclasses.replace(
            self, transforms=t_dev, inv_transforms=i_dev
        )


# Raw traversal-table bytes one tree may keep VMEM-resident before the pack
# switches to the tiered (HBM-streamed) view and the Renderer to chunked
# trees. With the kernels' Mosaic scoped-VMEM limit raised to 100 MB
# (pallas_call compiler_params), the probe sweep
# (scripts/probe_single_tree.py) compiled and ran single trees up to 37.3 MB
# of tables (the 503k-triangle field) on a real v5e — the old 3.5 MB budget
# was an artifact of the default 16 MB limit. 36 MB default = the largest
# probe-validated size with margin; override with RAYZEN_TREE_BUDGET_MB.
SINGLE_TREE_VMEM_BUDGET = int(
    float(os.environ.get("RAYZEN_TREE_BUDGET_MB", "36")) * 1024 * 1024
)


def single_tree_table_bytes(n_inner: int, n_leaf_rows: int, leaf_size: int) -> int:
    """Raw inner+leaf table bytes for one tree; Mosaic's scoped VMEM working
    set measures ~3.5-4x this, so it must stay under ~4 MB of a 16 MB core."""
    leaf_w = ((11 * leaf_size + 2 + 7) // 8) * 8
    return 4 * (n_inner * 16 + n_leaf_rows * leaf_w)


_blas_cache: dict = {}

_BLAS_FIELDS = ("bounds_min", "bounds_max", "left_first", "count", "miss", "order")


def bvh2_depth(child_ref, child_count) -> int:
    """Inner-node depth of the BVH2 ordered-walk tree (host, pack time): one
    vectorized level-BFS pass per level from the root. Bounds multi-pop walk
    width — multi-pop stack occupancy can reach ~pop_n x depth (ADVICE r3)."""
    ref = np.asarray(child_ref)
    cnt = np.asarray(child_count)
    if ref.shape[0] == 0:
        return 0
    frontier = np.zeros((1,), np.int64)
    depth = 0
    while frontier.size and depth <= ref.shape[0]:
        depth += 1
        r = ref[frontier].ravel()
        c = cnt[frontier].ravel()
        frontier = r[c == -1].astype(np.int64)
    return depth


def _blas_disk_path(mesh, cfg: RenderConfig) -> str:
    """Content-hash keyed per-mesh BLAS cache file. The reference keys its
    bvh_cache/v2/meshN.* files by scene position (main.cpp:951-969), so the
    same mesh rebuilt in another scene misses; hashing the vertex soup lets
    meshes reuse across scenes and configs."""
    import hashlib

    h = hashlib.sha1(mesh.vertices.tobytes()).hexdigest()[:20]
    return os.path.join(
        cfg.cache_dir, "blas", f"{h}_{cfg.leaf_size}_{cfg.split_method}.npz"
    )


def _mesh_blas(mesh, cfg: RenderConfig) -> BLAS:
    """Per-mesh BLAS with two cache tiers: an in-process memo (the reference
    memoizes in function-local statics, main.cpp:1128-1136) and a content-
    hashed disk cache (the bvh_cache/v2 analog, main.cpp:951-969)."""
    key = (id(mesh), mesh.num_triangles, cfg.leaf_size, cfg.split_method)
    blas = _blas_cache.get(key)
    if blas is not None:
        return blas
    path = _blas_disk_path(mesh, cfg) if mesh.num_triangles else None
    if path and not cfg.rebuild_bvh and os.path.exists(path):
        try:
            with np.load(path) as z:
                blas = BLAS(**{f: z[f] for f in _BLAS_FIELDS})
            _blas_cache[key] = blas
            return blas
        except Exception as e:  # corrupt cache -> rebuild
            log.error(f"BLAS cache load failed ({e}); rebuilding")
    # native C++ builder when available; identical output to the numpy one
    builder = native.build_blas if native.available() else build_blas
    blas = builder(mesh.vertices, cfg.leaf_size, cfg.split_method)
    _blas_cache[key] = blas
    if path:
        try:
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = path + ".tmp.npz"
            np.savez(tmp, **{f: getattr(blas, f) for f in _BLAS_FIELDS})
            os.replace(tmp, path)
        except Exception as e:
            log.error(f"BLAS cache write failed: {e}")
    return blas


def pack_scene(scene: Scene, cfg: RenderConfig | None = None) -> SceneArrays:
    """Pack and ship to the device (one batched transfer)."""
    return jax.device_put(pack_scene_host(scene, cfg))


def pack_scene_host(
    scene: Scene, cfg: RenderConfig | None = None
) -> SceneArrays:
    """Pack entirely host-side: the returned SceneArrays has numpy leaves
    (still a valid pytree — jit/device_put treat it like any other), so disk
    caches can persist it without a device readback."""
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
    mat_override = []
    for go in scene.game_objects:
        slot = mesh_slot[id(go.mesh)]
        n_off, t_off, n_nodes, n_tris = mesh_layout[slot]
        instance_meta.append(InstanceMeta(n_off, t_off, n_nodes, n_tris, slot))
        transforms.append(go.transform)
        root_bmin.append(bounds_list[slot][0, :3])
        root_bmax.append(bounds_list[slot][0, 3:])
        mat_override.append(getattr(go, "material_override", -1))

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
        mat_override = np.asarray(mat_override, dtype=np.int32)
    else:
        transforms = np.eye(4, dtype=np.float32)[None]
        inv_transforms = transforms.copy()
        root_bmin = np.full((1, 3), np.finfo(np.float32).max, dtype=np.float32)
        root_bmax = -root_bmin
        mat_override = np.full((1,), -1, dtype=np.int32)

    uni = _build_unified(
        instance_meta, node_meta, transforms, root_bmin, root_bmax,
        leaf_k=cfg.leaf_size,
    )
    tree_depth = bvh2_depth(uni["bvh2_child_ref"], uni["bvh2_child_count"])

    # tiered (HBM-streamed treelet) view when the single tree exceeds VMEM
    n_inner = uni["bvh2_child_node"].shape[0]
    n_leaf_rows = uni["bvh2_leaf_node"].shape[0]
    tiered_on = cfg.tiered == "on" or (
        cfg.tiered == "auto"
        and single_tree_table_bytes(n_inner, n_leaf_rows, cfg.leaf_size)
        > SINGLE_TREE_VMEM_BUDGET
    )
    if tiered_on and cfg.leaf_size <= 11:  # leaf rows must fit 128 f32 lanes
        uni.update(
            _build_treelets(
                uni["bvh2_child_node"], uni["bvh2_child_ref"],
                uni["bvh2_child_count"], cfg.treelet_rows,
            )
        )
    else:
        uni.update(_empty_treelets())

    total_tris = sum(m.num_triangles for m in instance_meta)
    log.info(
        f"Packed scene: {len(unique_meshes)} unique meshes, "
        f"{len(instance_meta)} instances, {total_tris} instanced triangles, "
        f"{node_meta.shape[0]} BVH nodes, {uni['uni_meta'].shape[0]} unified nodes"
    )

    # Host-side (numpy-leaved) SceneArrays: callers that persist the pack
    # (cached_pack_scene) save these directly; pack_scene ships them to the
    # device in ONE batched device_put. One transfer matters on tunneled
    # transports where every dispatch carries fixed staging cost — 35
    # individual jnp.asarray calls here measured 155 s of Renderer startup
    # on the tunneled v5e vs ~1 s batched.
    return SceneArrays(
        uni_meta=uni["uni_meta"],
        blas_src=uni["blas_src"],
        blas_inst=uni["blas_inst"],
        tlas_mask=uni["tlas_mask"],
        wtri_src=uni["wtri_src"],
        wtri_inst=uni["wtri_inst"],
        node_leaf_tri=uni["node_leaf_tri"],
        bvh2_child_node=uni["bvh2_child_node"],
        bvh2_child_ref=uni["bvh2_child_ref"],
        bvh2_child_count=uni["bvh2_child_count"],
        bvh2_leaf_node=uni["bvh2_leaf_node"],
        bvh8_child_node=uni["bvh8_child_node"],
        bvh8_child_ref=uni["bvh8_child_ref"],
        bvh8_child_count=uni["bvh8_child_count"],
        bvh8_leaf_start=uni["bvh8_leaf_start"],
        bvh8_leaf_n=uni["bvh8_leaf_n"],
        bvh8_leaf_perm=uni["bvh8_leaf_perm"],
        top_child_node=uni["top_child_node"],
        top_child_ref=uni["top_child_ref"],
        top_child_count=uni["top_child_count"],
        tre_child_node=uni["tre_child_node"],
        tre_child_ref=uni["tre_child_ref"],
        tre_child_count=uni["tre_child_count"],
        tre_leaf_src=uni["tre_leaf_src"],
        tri_v0=tri_v0,
        tri_e1=tri_e1,
        tri_e2=tri_e2,
        tri_mat=tri_mat,
        node_bounds=node_bounds,
        node_meta=node_meta,
        transforms=transforms,
        inv_transforms=inv_transforms,
        root_bmin=root_bmin,
        root_bmax=root_bmax,
        inst_mat_override=mat_override,
        materials=pack_materials(scene.materials),
        lights=pack_lights(scene.lights),
        instance_meta=tuple(instance_meta),
        tree_depth=tree_depth,
    )


def _build_unified(
    instance_meta, node_meta, transforms, root_bmin, root_bmax, leaf_k: int = 4
):
    """Stitch TLAS + per-instance BLAS copies into one threaded tree (host,
    build-time; numpy). See SceneArrays field docs for the layout.

    TLAS *topology* is built once from the initial instance AABBs and kept
    static; per-frame motion only refits node bounds on device. (The reference
    instead rebuilds the TLAS from scratch every frame on the host and re-
    uploads it, main.cpp:1192-1207 — the fixed-topology refit is the TPU-native
    fix from SURVEY.md §7. Repack if instances drift far enough to degrade the
    topology's quality.)"""
    n_inst = len(instance_meta)
    nonempty = [i for i, m in enumerate(instance_meta) if m.num_triangles > 0]

    # leaf_k = records-inlined triangles per leaf; must cover cfg.leaf_size
    # (the builders never emit leaves bigger than that) so no leaf triangle is
    # silently dropped from the inlined tables. Reference leaf cap: BVH.cpp:115.

    if not nonempty:
        out = dict(
            uni_meta=np.asarray([[0, 0, -1]], dtype=np.int32),
            blas_src=np.zeros((0,), dtype=np.int32),
            blas_inst=np.zeros((0,), dtype=np.int32),
            tlas_mask=np.zeros((1, max(n_inst, 1)), dtype=bool),
            wtri_src=np.zeros((1,), dtype=np.int32),
            wtri_inst=np.zeros((1,), dtype=np.int32),
            node_leaf_tri=np.zeros((1, leaf_k), dtype=np.int32),
        )
        out.update(_build_bvh2(out["uni_meta"], 1))
        return out

    # initial world AABBs (8 transformed corners of each BLAS root)
    init_wmin, init_wmax = [], []
    for i in nonempty:
        corners = np.stack(
            [
                [root_bmin[i][0] if x == 0 else root_bmax[i][0],
                 root_bmin[i][1] if y == 0 else root_bmax[i][1],
                 root_bmin[i][2] if z == 0 else root_bmax[i][2]]
                for x in (0, 1) for y in (0, 1) for z in (0, 1)
            ]
        ).astype(np.float32)
        w = corners @ transforms[i][:3, :3].T + transforms[i][:3, 3]
        init_wmin.append(w.min(axis=0))
        init_wmax.append(w.max(axis=0))
    tlas = build_tlas(np.stack(init_wmin), np.stack(init_wmax))
    n_tlas = tlas.num_nodes

    # layout: world-triangle and unified-BLAS-node offsets per nonempty instance
    wtri_off, blas_off = {}, {}
    cum_t, cum_n = 0, n_tlas
    for i in nonempty:
        wtri_off[i] = cum_t
        blas_off[i] = cum_n
        cum_t += instance_meta[i].num_triangles
        cum_n += instance_meta[i].num_nodes

    uni_meta = np.zeros((cum_n, 3), dtype=np.int32)
    blas_src = np.zeros((cum_n - n_tlas,), dtype=np.int32)
    blas_inst = np.zeros((cum_n - n_tlas,), dtype=np.int32)
    tlas_mask = np.zeros((n_tlas, n_inst), dtype=bool)
    leaf_miss = {}  # instance id -> miss link of its TLAS leaf

    # TLAS section: internal nodes pass through; leaves descend into BLAS roots
    for j in range(n_tlas):
        count = int(tlas.count[j])
        miss = int(tlas.miss[j])
        if count < 0:  # internal
            uni_meta[j] = (int(tlas.left_first[j]), -1, miss)
        else:  # leaf, exactly one instance (BVH.cpp:204)
            inst = nonempty[int(tlas.order[int(tlas.left_first[j])])]
            uni_meta[j] = (blas_off[inst], -1, miss)
            leaf_miss[inst] = miss

    # descendant-instance masks for device-side TLAS bound refit
    # (iterative post-order: children before parents, then union upward)
    desc = [None] * n_tlas
    stack = [(0, False)]
    while stack:
        node, expanded = stack.pop()
        if int(tlas.count[node]) >= 0:
            inst = nonempty[int(tlas.order[int(tlas.left_first[node])])]
            desc[node] = [inst]
        elif not expanded:
            left = int(tlas.left_first[node])
            stack.append((node, True))
            stack.append((left, False))
            stack.append((left + 1, False))
        else:
            left = int(tlas.left_first[node])
            desc[node] = desc[left] + desc[left + 1]
        if desc[node] is not None:
            for i in desc[node]:
                tlas_mask[node, i] = True

    # BLAS sections: remap child/first/miss links into unified space
    wtri_src, wtri_inst = [], []
    node_leaf_tri = np.zeros((cum_n, leaf_k), dtype=np.int32)
    for i in nonempty:
        m = instance_meta[i]
        off = blas_off[i]
        rows = node_meta[m.node_offset : m.node_offset + m.num_nodes]
        for k, (left_first, count, miss) in enumerate(rows):
            new_miss = leaf_miss[i] if miss == -1 else off + int(miss)
            if count < 0:  # internal
                uni_meta[off + k] = (off + int(left_first), -1, new_miss)
            else:  # leaf: first indexes the world-triangle array
                if int(count) > leaf_k:
                    raise ValueError(
                        f"BVH leaf with {int(count)} triangles exceeds the "
                        f"inlined leaf capacity {leaf_k} (cfg.leaf_size)"
                    )
                first = wtri_off[i] + int(left_first)
                uni_meta[off + k] = (first, int(count), new_miss)
                for c in range(min(int(count), leaf_k)):
                    node_leaf_tri[off + k, c] = first + c
            blas_src[off + k - n_tlas] = m.node_offset + k
            blas_inst[off + k - n_tlas] = i
        wtri_src.extend(range(m.tri_offset, m.tri_offset + m.num_triangles))
        wtri_inst.extend([i] * m.num_triangles)

    out = dict(
        uni_meta=uni_meta,
        blas_src=blas_src,
        blas_inst=blas_inst,
        tlas_mask=tlas_mask,
        wtri_src=np.asarray(wtri_src, dtype=np.int32),
        wtri_inst=np.asarray(wtri_inst, dtype=np.int32),
        node_leaf_tri=node_leaf_tri,
    )
    out.update(_build_bvh2(uni_meta, n_tlas))
    return out


def _build_bvh2(uni_meta: np.ndarray, n_tlas: int):
    """Derive the explicit child-table (BVH2) view of the unified tree.

    The threaded layout stores one box per node and relies on miss links; the
    ordered stack kernels instead want each *internal* node to carry both
    children's boxes so a missed child never costs an iteration. Unary TLAS
    leaves (which just forward to their instance's BLAS root and share its
    world box) are elided. A synthetic root is added when the whole tree is a
    single leaf so the kernels always start from an internal node."""

    def resolve(node):
        """Elide unary TLAS leaves: a TLAS leaf's meta is (blas_root, -1, miss)
        with blas_root >= n_tlas while real TLAS internals point inside the
        TLAS section."""
        while node < n_tlas and uni_meta[node][1] < 0 and uni_meta[node][0] >= n_tlas:
            node = int(uni_meta[node][0])
        return node

    root = resolve(0)
    inner_child_node, inner_child_ref, inner_child_count = [], [], []
    leaf_node = []

    def add_leaf(node):
        leaf_node.append(node)
        return len(leaf_node) - 1

    if uni_meta[root][1] >= 0:
        # whole tree is one leaf: synthetic root with a padding right child
        li = add_leaf(root)
        inner_child_node.append((root, -1))
        inner_child_ref.append((li, 0))
        inner_child_count.append((int(uni_meta[root][1]), 0))
    else:
        # BFS; children of an internal node are (left, left+1) in both the
        # TLAS and BLAS sections (builder adjacency), then TLAS-leaf-elided
        index_of = {root: 0}
        queue = [root]
        inner_child_node = [None]
        inner_child_ref = [None]
        inner_child_count = [None]
        while queue:
            node = queue.pop(0)
            slot = index_of[node]
            left = int(uni_meta[node][0])
            kids_node, kids_ref, kids_count = [], [], []
            for child in (resolve(left), resolve(left + 1)):
                count = int(uni_meta[child][1])
                if count >= 0:
                    kids_ref.append(add_leaf(child))
                    kids_count.append(count)
                else:
                    if child not in index_of:
                        index_of[child] = len(inner_child_node)
                        inner_child_node.append(None)
                        inner_child_ref.append(None)
                        inner_child_count.append(None)
                        queue.append(child)
                    kids_ref.append(index_of[child])
                    kids_count.append(-1)
                kids_node.append(child)
            inner_child_node[slot] = tuple(kids_node)
            inner_child_ref[slot] = tuple(kids_ref)
            inner_child_count[slot] = tuple(kids_count)

    if not leaf_node:
        leaf_node.append(0)
    out = dict(
        bvh2_child_node=np.asarray(inner_child_node, dtype=np.int32),
        bvh2_child_ref=np.asarray(inner_child_ref, dtype=np.int32),
        bvh2_child_count=np.asarray(inner_child_count, dtype=np.int32),
        bvh2_leaf_node=np.asarray(leaf_node, dtype=np.int32),
    )
    out.update(
        _collapse_bvh8(
            out["bvh2_child_node"], out["bvh2_child_ref"], out["bvh2_child_count"]
        )
    )
    return out


def _build_treelets(child_node: np.ndarray, child_ref: np.ndarray,
                    child_count: np.ndarray, max_rows: int):
    """Cut the BVH2 child-table tree into treelets of at most ``max_rows``
    inner rows and ``max_rows`` leaf rows each, plus the remaining small top
    tree (see SceneArrays tiered-field docs).

    Top-tree children: count -1 = top internal (ref = top row), -2 = treelet
    (ref = treelet id). Treelet-local children: count -1 = local inner row,
    count >= 0 = leaf with ``ref`` = local leaf SLOT (the slot's global
    leaf-table row lives in tre_leaf_src)."""
    ni = child_node.shape[0]

    # subtree sizes per inner node (iterative reverse-BFS accumulation)
    order, seen, stack = [], set(), [0]
    while stack:
        n = stack.pop()
        if n in seen:
            continue
        seen.add(n)
        order.append(n)
        for c in range(2):
            if child_count[n, c] < 0:
                stack.append(int(child_ref[n, c]))
    inner_cnt = np.ones(ni, dtype=np.int64)
    leaf_cnt = np.zeros(ni, dtype=np.int64)
    for n in reversed(order):
        for c in range(2):
            if child_count[n, c] < 0:
                r = int(child_ref[n, c])
                inner_cnt[n] += inner_cnt[r]
                leaf_cnt[n] += leaf_cnt[r]
            elif child_node[n, c] >= 0:
                leaf_cnt[n] += 1

    def cuttable(idx):
        return inner_cnt[idx] <= max_rows and leaf_cnt[idx] <= max_rows

    treelets = []  # per treelet: (local child tables, leaf_src)

    def make_treelet(entry):
        """entry = ('inner', bvh2 idx) or ('leaf', leaf_ref, count, node_id).
        Returns the treelet id."""
        t_node, t_ref, t_cnt, leaf_src = [], [], [], []
        if entry[0] == "leaf":
            # synthetic root: one real leaf child + inert padding child
            _, lref, lcount, lnode = entry
            leaf_src.append(int(lref))
            t_node.append((int(lnode), -1))
            t_ref.append((0, 0))
            t_cnt.append((int(lcount), 0))
        else:
            root = entry[1]
            index_of = {root: 0}
            queue = [root]
            t_node, t_ref, t_cnt = [None], [None], [None]
            while queue:
                n = queue.pop(0)
                slot = index_of[n]
                kn, kr, kc = [], [], []
                for c in range(2):
                    cnt = int(child_count[n, c])
                    if cnt < 0:  # internal child -> local inner row
                        r = int(child_ref[n, c])
                        if r not in index_of:
                            index_of[r] = len(t_node)
                            t_node.append(None)
                            t_ref.append(None)
                            t_cnt.append(None)
                            queue.append(r)
                        kr.append(index_of[r])
                        kc.append(-1)
                    else:  # leaf child -> local leaf slot
                        kr.append(len(leaf_src))
                        leaf_src.append(int(child_ref[n, c]))
                        kc.append(cnt)
                    kn.append(int(child_node[n, c]))
                t_node[slot] = tuple(kn)
                t_ref[slot] = tuple(kr)
                t_cnt[slot] = tuple(kc)
        treelets.append((t_node, t_ref, t_cnt, leaf_src))
        return len(treelets) - 1

    # top tree: BFS over un-cut inner nodes; the root is always a top node
    # (a fully-cuttable tree gets a synthetic top root with one treelet child)
    top_node, top_ref, top_cnt = [], [], []
    if cuttable(0):
        tid = make_treelet(("inner", 0))
        top_node.append((0, -1))
        top_ref.append((tid, 0))
        top_cnt.append((-2, 0))
    else:
        index_of = {0: 0}
        queue = [0]
        top_node, top_ref, top_cnt = [None], [None], [None]
        while queue:
            n = queue.pop(0)
            slot = index_of[n]
            kn, kr, kc = [], [], []
            for c in range(2):
                cnt = int(child_count[n, c])
                if cnt < 0:
                    r = int(child_ref[n, c])
                    if cuttable(r):
                        kr.append(make_treelet(("inner", r)))
                        kc.append(-2)
                    else:
                        if r not in index_of:
                            index_of[r] = len(top_node)
                            top_node.append(None)
                            top_ref.append(None)
                            top_cnt.append(None)
                            queue.append(r)
                        kr.append(index_of[r])
                        kc.append(-1)
                elif child_node[n, c] >= 0:  # bare leaf above the cuts
                    kr.append(
                        make_treelet(
                            ("leaf", int(child_ref[n, c]), cnt,
                             int(child_node[n, c]))
                        )
                    )
                    kc.append(-2)
                else:  # padding child
                    kr.append(0)
                    kc.append(0)
                kn.append(int(child_node[n, c]))
            top_node[slot] = tuple(kn)
            top_ref[slot] = tuple(kr)
            top_cnt[slot] = tuple(kc)

    # pack treelets to fixed (Tt, max_rows, ...) blocks
    tt = len(treelets)
    tre_node = np.full((tt, max_rows, 2), -1, dtype=np.int32)
    tre_ref = np.zeros((tt, max_rows, 2), dtype=np.int32)
    tre_cnt = np.zeros((tt, max_rows, 2), dtype=np.int32)
    tre_leaf = np.full((tt, max_rows), -1, dtype=np.int32)
    for t, (t_node, t_ref, t_cnt, leaf_src) in enumerate(treelets):
        assert len(t_node) <= max_rows and len(leaf_src) <= max_rows
        for i in range(len(t_node)):
            tre_node[t, i] = t_node[i]
            tre_ref[t, i] = t_ref[i]
            tre_cnt[t, i] = t_cnt[i]
        tre_leaf[t, : len(leaf_src)] = leaf_src
    return dict(
        top_child_node=np.asarray(top_node, dtype=np.int32),
        top_child_ref=np.asarray(top_ref, dtype=np.int32),
        top_child_count=np.asarray(top_cnt, dtype=np.int32),
        tre_child_node=tre_node,
        tre_child_ref=tre_ref,
        tre_child_count=tre_cnt,
        tre_leaf_src=tre_leaf,
    )


def _empty_treelets():
    """1-row dummies marking "tiered view absent" (top_child_count[0,0]=0)."""
    return dict(
        top_child_node=np.full((1, 2), -1, dtype=np.int32),
        top_child_ref=np.zeros((1, 2), dtype=np.int32),
        top_child_count=np.zeros((1, 2), dtype=np.int32),
        tre_child_node=np.full((1, 1, 2), -1, dtype=np.int32),
        tre_child_ref=np.zeros((1, 1, 2), dtype=np.int32),
        tre_child_count=np.zeros((1, 1, 2), dtype=np.int32),
        tre_leaf_src=np.full((1, 1), -1, dtype=np.int32),
    )


def _collapse_bvh8(child_node: np.ndarray, child_ref: np.ndarray,
                   child_count: np.ndarray):
    """Collapse the BVH2 child table into 8-wide nodes.

    Classic BVH2 -> BVH8 collapse: each wide node starts from a binary node's
    two children and greedily expands the internal child with the largest
    leaf-subtree until 8 slots are filled (largest-first keeps the tree
    balanced, minimizing depth). Children that stay internal become new wide
    nodes. Padding slots carry node id -1 (inverted box on device — never
    hit).

    Dedicated wide-leaf layout (round-3): every BVH2 leaf is a child of
    exactly one wide node, so the leaf table can be PERMUTED so each wide
    node's leaf children occupy a contiguous row range [leaf_start,
    leaf_start + leaf_n). The wide walk then processes one node's leaf hits
    as a single dense row loop under the union of the hit leaf children's
    masks — no per-child leaf refs, no per-child conds (the round-2 BVH8
    loss mode). Emits bvh8_leaf_perm (original leaf row per permuted row)
    plus per-node start/count."""
    ni = child_node.shape[0]

    # leaf counts per inner node (iterative reverse-BFS accumulation)
    sizes = np.ones(ni, dtype=np.int64)
    order = []
    stack = [0]
    seen = set()
    while stack:
        n = stack.pop()
        if n in seen:
            continue
        seen.add(n)
        order.append(n)
        for c in range(2):
            if child_count[n, c] < 0:
                stack.append(int(child_ref[n, c]))
    for n in reversed(order):
        s = 0
        for c in range(2):
            if child_node[n, c] < 0:
                continue
            if child_count[n, c] < 0:
                s += sizes[int(child_ref[n, c])]
            else:
                s += 1
        sizes[n] = max(s, 1)

    w_node, w_ref, w_count = [], [], []
    leaf_start, leaf_n = [], []  # per wide node, into the permuted leaf table
    leaf_perm = []  # permuted row -> original leaf-table row
    index_of = {0: 0}
    w_node.append(None)
    w_ref.append(None)
    w_count.append(None)
    leaf_start.append(0)
    leaf_n.append(0)
    queue = [0]
    while queue:
        b2 = queue.pop(0)
        slot = index_of[b2]
        # entries: (unified_node_id, bvh2_ref_or_leaf_ref, count)
        entries = [
            (int(child_node[b2, c]), int(child_ref[b2, c]), int(child_count[b2, c]))
            for c in range(2)
            if child_node[b2, c] >= 0
        ]
        while len(entries) < 8:
            internal = [e for e in entries if e[2] < 0]
            if not internal:
                break
            # expand the internal entry with the largest subtree
            pick = max(internal, key=lambda e: sizes[e[1]])
            entries.remove(pick)
            for c in range(2):
                if child_node[pick[1], c] >= 0:
                    entries.append(
                        (int(child_node[pick[1], c]), int(child_ref[pick[1], c]),
                         int(child_count[pick[1], c]))
                    )
            if len(entries) > 8:  # over-expanded: revert and stop
                for c in range(2):
                    if child_node[pick[1], c] >= 0:
                        entries.pop()
                entries.append(pick)
                break
        # leaf children first (contiguous rows in the permuted leaf table),
        # then internal children
        nodes8, refs8, counts8 = [], [], []
        leaf_start[slot] = len(leaf_perm)
        for node_id, ref, count in entries:
            if count >= 0:  # leaf: claim the next permuted row
                refs8.append(len(leaf_perm))
                leaf_perm.append(ref)
                nodes8.append(node_id)
                counts8.append(count)
        leaf_n[slot] = len(leaf_perm) - leaf_start[slot]
        for node_id, ref, count in entries:
            if count < 0:  # stays internal: becomes a wide node
                if ref not in index_of:
                    index_of[ref] = len(w_node)
                    w_node.append(None)
                    w_ref.append(None)
                    w_count.append(None)
                    leaf_start.append(0)
                    leaf_n.append(0)
                    queue.append(ref)
                refs8.append(index_of[ref])
                nodes8.append(node_id)
                counts8.append(count)
        while len(nodes8) < 8:  # padding
            nodes8.append(-1)
            refs8.append(0)
            counts8.append(0)
        w_node[slot] = nodes8
        w_ref[slot] = refs8
        w_count[slot] = counts8

    if not leaf_perm:  # degenerate single-leaf tree: keep shapes nonempty
        leaf_perm = [0]
    return dict(
        bvh8_child_node=np.asarray(w_node, dtype=np.int32),
        bvh8_child_ref=np.asarray(w_ref, dtype=np.int32),
        bvh8_child_count=np.asarray(w_count, dtype=np.int32),
        bvh8_leaf_start=np.asarray(leaf_start, dtype=np.int32),
        bvh8_leaf_n=np.asarray(leaf_n, dtype=np.int32),
        bvh8_leaf_perm=np.asarray(leaf_perm, dtype=np.int32),
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class WorldArrays:
    """Per-frame world-space scene: what traversal/shading actually consume.

    Produced on device by ``world_geometry`` from SceneArrays + current
    transforms. Triangles are pre-transformed to world space and node bounds
    refit, so the hot loops do no matrix math and no per-instance logic; world-
    space t falls out of Möller–Trumbore directly (the reference recovers it as
    |worldHit - origin|, glsl:485 — geometrically identical)."""

    tri_v0: jax.Array  # (Tw, 3) f32 world space
    tri_e1: jax.Array  # (Tw, 3) f32
    tri_e2: jax.Array  # (Tw, 3) f32
    tri_mat: jax.Array  # (Tw,) i32
    tri_inst: jax.Array  # (Tw,) i32
    tri_nsign: jax.Array  # (Tw,) f32 — +-1: orientation of the owning
    # instance transform. World-space cross(e1, e2) flips under mirroring
    # (det < 0); the reference's inverse-transpose normal (glsl:489) does not,
    # so the sign restores parity for mirrored instances.
    # Packed per-node records: ONE row gather serves a whole traversal step.
    # Layout (f32): [0:3] bmin | [3:6] bmax | [6:9] float-encoded (left_first,
    # count, miss) | [9:9+9K] K leaf triangles as (v0, e1, e2) | [..+K]
    # per-triangle transparency | pad. Internal nodes carry zero triangles;
    # the count field masks the unused lanes.
    records: jax.Array  # (Nu, W) f32
    # BVH2 ordered-traversal tables (pallas stack kernels):
    # inner_table row: [lmin(3) lmax(3) rmin(3) rmax(3) lref rref lcnt rcnt]
    # (refs/counts float-encoded; leaf_table row: [K tris x 9 | K transp |
    # first | count | pad]).
    inner_table: jax.Array  # (Ni, 16) f32
    leaf_table: jax.Array  # (L, W2) f32
    # BVH8 wide-node table: row = [8 x (bmin(3) bmax(3)) | 8 refs | 8 counts |
    # leaf_start | leaf_n | pad] = 72 f32 columns. Leaf children live in
    # leaf8_table rows [leaf_start, leaf_start + leaf_n) — the dedicated
    # wide-leaf layout: one contiguous dense row loop per node, no per-child
    # leaf refs or conds.
    inner8_table: jax.Array  # (N8, 72) f32
    leaf8_table: jax.Array  # (L8, W2) f32 — leaf_table rows permuted so each
    # wide node's leaf children are contiguous
    # Tiered view (HBM-streamed treelets): top tree in inner_table format with
    # count -2 children referencing treelets; fixed-size per-treelet blocks
    # padded to 128 lanes, DMA'd into VMEM scratch by the tiered walks.
    top_table: jax.Array  # (Nt, 16) f32
    tre_inner: jax.Array  # (Tt, SI, 128) f32 — cols 0-15 = inner_table row
    tre_leaf: jax.Array  # (Tt, SL, 128) f32 — cols 0..W2 = leaf_table row
    materials: jax.Array  # (M, 8) f32
    lights: jax.Array  # (L, 8) f32
    leaf_k: int = dataclasses.field(metadata=dict(static=True), default=4)
    # static marker: tiered treelet view populated (scenes past the VMEM
    # budget); selects the DMA-streaming walks in the megakernel
    tiered: bool = dataclasses.field(metadata=dict(static=True), default=False)
    # pack-time BVH2 inner depth (0 = unknown, e.g. the deform path's
    # device-built LBVH) — bounds multi-pop walk width (_pick_pop_n)
    tree_depth: int = dataclasses.field(metadata=dict(static=True), default=0)

    @property
    def num_lights(self) -> int:
        return int(self.lights.shape[0])

    @property
    def num_triangles(self) -> int:
        return int(self.tri_v0.shape[0])


def world_geometry(arrays: SceneArrays) -> WorldArrays:
    """Refit the unified BVH and transform triangles to world space (device,
    inside jit, once per frame). Dense vectorized ops, cost ~O(T + N) — replaces
    the reference's per-frame host rebuild + full re-upload
    (updateDynamicBVHAndSSBOs, main.cpp:1123-1208)."""
    # triangles -> world space (edges use the rotation part only)
    src = arrays.wtri_src
    rot = arrays.transforms[arrays.wtri_inst][:, :3, :3]  # (Tw, 3, 3)
    trans = arrays.transforms[arrays.wtri_inst][:, :3, 3]
    v0 = jnp.einsum("tij,tj->ti", rot, arrays.tri_v0[src]) + trans
    e1 = jnp.einsum("tij,tj->ti", rot, arrays.tri_e1[src])
    e2 = jnp.einsum("tij,tj->ti", rot, arrays.tri_e2[src])
    # orientation sign per instance (mirroring flips cross products)
    inst_det = jnp.linalg.det(arrays.transforms[:, :3, :3])  # (I,)
    tri_nsign = jnp.where(inst_det[arrays.wtri_inst] < 0.0, -1.0, 1.0)

    # BLAS node bounds -> conservative world AABBs (8 transformed corners)
    b = arrays.node_bounds[arrays.blas_src]  # (Nb, 6) object space
    sel = jnp.asarray(
        [[x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)],
        dtype=jnp.float32,
    )
    corners = b[:, None, :3] * (1.0 - sel)[None] + b[:, None, 3:] * sel[None]
    m_rot = arrays.transforms[arrays.blas_inst][:, :3, :3]
    m_trans = arrays.transforms[arrays.blas_inst][:, :3, 3]
    wc = jnp.einsum("nij,nkj->nki", m_rot, corners) + m_trans[:, None, :]
    blas_bounds = jnp.concatenate([wc.min(axis=1), wc.max(axis=1)], axis=-1)

    # TLAS node bounds from descendant instance AABBs (static masks)
    wmin, wmax = instance_world_aabbs(arrays)  # (I, 3)
    mask = arrays.tlas_mask[..., None]  # (Nt, I, 1)
    inf = jnp.float32(3.4e38)
    tmin = jnp.min(jnp.where(mask, wmin[None], inf), axis=1)
    tmax = jnp.max(jnp.where(mask, wmax[None], -inf), axis=1)
    tlas_bounds = jnp.concatenate([tmin, tmax], axis=-1)

    node_bounds = jnp.concatenate([tlas_bounds, blas_bounds], axis=0)  # (Nu, 6)

    # pack node records: bounds | meta | inlined leaf triangles | pad.
    # Meta ints are stored as float *values* (exact below 2^24), NOT bitcast:
    # -1 bitcast to f32 is a NaN payload, and NaN canonicalization anywhere on
    # the load path would corrupt the links (observed as a TPU kernel fault).
    meta_f = arrays.uni_meta.astype(jnp.float32)  # (Nu, 3)
    tris9 = jnp.concatenate([v0, e1, e2], axis=1)  # (Tw, 9)
    leaf_block = tris9[arrays.node_leaf_tri]  # (Nu, K, 9)
    n_nodes, leaf_k = arrays.node_leaf_tri.shape
    leaf_block = leaf_block.reshape(n_nodes, leaf_k * 9)
    # per-leaf-triangle transparency (0 for opaque): lets the shadow kernels
    # accumulate transmission without a material lookup (shadowVisibility
    # semantics, glsl:517-523)
    # per-instance material override (-1 = keep the mesh's materials)
    ov = arrays.inst_mat_override[arrays.wtri_inst]
    tri_mat = jnp.where(ov >= 0, ov, arrays.tri_mat[src])
    wtri_transp = arrays.materials[tri_mat, 6]  # TRANSPARENCY column
    transp_block = wtri_transp[arrays.node_leaf_tri]  # (Nu, K)
    # per-leaf-triangle material id, sign-encoding the instance orientation:
    # enc = (mat + 1) * nsign — lets closest-hit kernels emit shading
    # attributes directly (no post-traversal gathers)
    wtri_mat_enc = (tri_mat.astype(jnp.float32) + 1.0) * tri_nsign
    mat_block = wtri_mat_enc[arrays.node_leaf_tri]  # (Nu, K)
    records = jnp.concatenate(
        [node_bounds, meta_f, leaf_block, transp_block, mat_block], axis=1
    )
    pad = (-records.shape[1]) % 8
    if pad:
        records = jnp.pad(records, ((0, 0), (0, pad)))

    # ---- BVH2 tables for the ordered stack kernels ----
    # child world bounds gathered from the refit node bounds; padding children
    # (node id -1) get an inverted box plus count 0 so they are inert
    cn = arrays.bvh2_child_node  # (Ni, 2)
    cn_safe = jnp.maximum(cn, 0)
    cb = node_bounds[cn_safe]  # (Ni, 2, 6)
    inverted = jnp.asarray([inf, inf, inf, -inf, -inf, -inf], jnp.float32)
    cb = jnp.where((cn >= 0)[..., None], cb, inverted)
    cref = arrays.bvh2_child_ref.astype(jnp.float32)  # (Ni, 2)
    ccnt = arrays.bvh2_child_count.astype(jnp.float32)
    inner_table = jnp.concatenate(
        [cb[:, 0, :], cb[:, 1, :], cref, ccnt], axis=1
    )  # (Ni, 16)

    # ---- BVH8 wide-node table (dedicated wide-leaf layout) ----
    cn8 = arrays.bvh8_child_node  # (N8, 8)
    cb8 = node_bounds[jnp.maximum(cn8, 0)]  # (N8, 8, 6)
    cb8 = jnp.where((cn8 >= 0)[..., None], cb8, inverted)
    inner8_table = jnp.concatenate(
        [
            cb8.reshape(cn8.shape[0], 48),
            arrays.bvh8_child_ref.astype(jnp.float32),
            arrays.bvh8_child_count.astype(jnp.float32),
            arrays.bvh8_leaf_start.astype(jnp.float32)[:, None],
            arrays.bvh8_leaf_n.astype(jnp.float32)[:, None],
        ],
        axis=1,
    )  # (N8, 66)
    pad8 = (-inner8_table.shape[1]) % 8
    if pad8:
        inner8_table = jnp.pad(inner8_table, ((0, 0), (0, pad8)))

    leaf_nodes = arrays.bvh2_leaf_node  # (L,)
    leaf_tri_block = leaf_block[leaf_nodes]  # (L, 9K)
    leaf_transp = transp_block[leaf_nodes]  # (L, K)
    leaf_first = arrays.uni_meta[leaf_nodes, 0].astype(jnp.float32)[:, None]
    leaf_count = arrays.uni_meta[leaf_nodes, 1].astype(jnp.float32)[:, None]
    leaf_mat = mat_block[leaf_nodes]  # (L, K)
    leaf_table = jnp.concatenate(
        [leaf_tri_block, leaf_transp, leaf_first, leaf_count, leaf_mat], axis=1
    )
    pad2 = (-leaf_table.shape[1]) % 8
    if pad2:
        leaf_table = jnp.pad(leaf_table, ((0, 0), (0, pad2)))
    # wide-leaf view: same rows, permuted so each wide node's leaf children
    # are contiguous (one device gather per frame; rows carry global tri ids,
    # so contents are permutation-invariant)
    leaf8_table = leaf_table[arrays.bvh8_leaf_perm]

    # ---- tiered (HBM-streamed treelet) tables ----
    # presence is a SHAPE property (jit-safe): dummies are (1, 1, 2)
    tiered = int(arrays.tre_child_node.shape[1]) > 1
    tcn = arrays.top_child_node  # (Nt, 2)
    tbnd = node_bounds[jnp.maximum(tcn, 0)]  # (Nt, 2, 6)
    tbnd = jnp.where((tcn >= 0)[..., None], tbnd, inverted)
    top_table = jnp.concatenate(
        [tbnd[:, 0, :], tbnd[:, 1, :],
         arrays.top_child_ref.astype(jnp.float32),
         arrays.top_child_count.astype(jnp.float32)],
        axis=1,
    )  # (Nt, 16)
    tn = arrays.tre_child_node  # (Tt, SI, 2)
    tb2 = node_bounds[jnp.maximum(tn, 0)]  # (Tt, SI, 2, 6)
    tb2 = jnp.where((tn >= 0)[..., None], tb2, inverted)
    tre_inner16 = jnp.concatenate(
        [tb2[..., 0, :], tb2[..., 1, :],
         arrays.tre_child_ref.astype(jnp.float32),
         arrays.tre_child_count.astype(jnp.float32)],
        axis=-1,
    )  # (Tt, SI, 16)
    tre_inner = jnp.pad(
        tre_inner16, ((0, 0), (0, 0), (0, 128 - tre_inner16.shape[-1]))
    )
    lsrc = jnp.maximum(arrays.tre_leaf_src, 0)  # (Tt, SL)
    tre_leaf = leaf_table[lsrc]  # (Tt, SL, W2)
    if tre_leaf.shape[-1] < 128:
        tre_leaf = jnp.pad(
            tre_leaf, ((0, 0), (0, 0), (0, 128 - tre_leaf.shape[-1]))
        )

    return WorldArrays(
        tri_v0=v0,
        tri_e1=e1,
        tri_e2=e2,
        tri_mat=tri_mat,
        tri_inst=arrays.wtri_inst,
        tri_nsign=tri_nsign.astype(jnp.float32),
        records=records,
        inner_table=inner_table,
        inner8_table=inner8_table,
        leaf8_table=leaf8_table,
        top_table=top_table,
        tre_inner=tre_inner,
        tre_leaf=tre_leaf,
        leaf_table=leaf_table,
        materials=arrays.materials,
        lights=arrays.lights,
        leaf_k=int(leaf_k),
        tiered=tiered,
        tree_depth=int(arrays.tree_depth),
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
