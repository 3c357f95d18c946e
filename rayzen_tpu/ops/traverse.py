"""Wavefront TLAS/BLAS traversal.

Reference: traverseTLAS / traverseBLAS (fragment_shader.glsl:419-503) — per-pixel
stack-based (int stack[64]) tree walks inside a divergent megakernel. That shape is
wrong for a vector machine, so this module restructures it (SURVEY.md §7):

- BLAS traversal is *stackless*: nodes carry precomputed miss links
  (accel/builder.py), so each ray's traversal state is one int. All rays advance in
  lockstep inside a single ``lax.while_loop``; finished rays (cur == -1) idle under
  masks until every ray in the wave is done.
- The TLAS is handled densely: with instance counts this small (the reference demo
  has 7; TLAS leaves hold exactly 1 instance, BVH.cpp:204), testing each instance's
  world AABB against every ray and sweeping instances sequentially beats a second
  tree walk — each sweep step is a dense masked BLAS traversal of the whole wave.
  Matches the reference's traversal semantics: ray transformed to object space by
  the instance inverse transform with *normalized* local direction (glsl:476-478),
  world-space t recovered as |worldHit - origin| (glsl:485), TLAS-level pruning via
  the world AABB (glsl:468).

Node/triangle fetches are row gathers from HBM/VMEM-resident arrays; leaf
triangle tests are unrolled ``leaf_size`` wide (leaf size <= 4, BVH.cpp:115) and
masked by the leaf's actual count.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..packing import SceneArrays, instance_world_aabbs
from .intersect import T_FAR, face_normal, moller_trumbore, normalize, slab_test


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Hit:
    """Closest-hit record for a wave of rays."""

    t: jax.Array  # (R,) world-space distance, T_FAR if none
    point: jax.Array  # (R, 3) world-space hit point
    tri: jax.Array  # (R,) global triangle index, -1 if none
    inst: jax.Array  # (R,) instance index, -1 if none
    found: jax.Array  # (R,) bool

    @property
    def num_rays(self) -> int:
        return int(self.t.shape[0])


def traverse_blas(
    arrays: SceneArrays,
    origin,  # (R, 3) object space
    direction,  # (R, 3) object space, normalized
    active,  # (R,) bool
    node_offset: int,
    tri_offset: int,
    leaf_size: int = 4,
):
    """Stackless BLAS walk. Returns (t_local (R,), tri (R,) global index or -1)."""
    inv_dir = 1.0 / direction
    cur0 = jnp.where(active, 0, -1).astype(jnp.int32)
    # derive loop carries from ``direction`` (data-dependence, not just shape)
    # so they inherit shard_map varying-ness; ``origin`` can be an unvarying
    # broadcast of the camera position, ``direction`` always varies per ray
    t0 = direction[:, 0] * 0.0 + jnp.float32(T_FAR)
    tri0 = cur0 * 0 - 1

    def cond(state):
        cur, _, _ = state
        return jnp.any(cur >= 0)

    def body(state):
        cur, t_best, tri_best = state
        alive = cur >= 0
        idx = node_offset + jnp.maximum(cur, 0)
        bounds = arrays.node_bounds[idx]  # (R, 6) row gather
        meta = arrays.node_meta[idx]  # (R, 3) row gather
        tmin, _, box_hit = slab_test(origin, inv_dir, bounds[:, :3], bounds[:, 3:])
        # prune when the box entry is beyond the best hit (glsl:430)
        box_ok = alive & box_hit & (tmin <= t_best)
        left_first = meta[:, 0]
        count = meta[:, 1]
        miss = meta[:, 2]
        # internal nodes have count == -1; count == 0 is the empty-mesh root
        # leaf, which must fall through to the miss link, not descend
        is_leaf = count >= 0
        leaf_ok = box_ok & is_leaf
        base = tri_offset + left_first
        for k in range(leaf_size):
            lane = leaf_ok & (k < count)
            tid = base + k  # contiguous leaf range (triangles in leaf order)
            t, h = moller_trumbore(
                origin,
                direction,
                arrays.tri_v0[tid],
                arrays.tri_e1[tid],
                arrays.tri_e2[tid],
            )
            better = lane & h & (t < t_best)
            t_best = jnp.where(better, t, t_best)
            tri_best = jnp.where(better, tid, tri_best)
        nxt = jnp.where(box_ok & ~is_leaf, left_first, miss)
        cur = jnp.where(alive, nxt, cur)
        return cur, t_best, tri_best

    _, t_best, tri_best = jax.lax.while_loop(cond, body, (cur0, t0, tri0))
    return t_best, tri_best


def traverse_scene(
    arrays: SceneArrays,
    origin,  # (R, 3) world space
    direction,  # (R, 3) world space, normalized
    active,  # (R,) bool
    leaf_size: int = 4,
) -> Hit:
    """Closest hit over all instances (traverseTLAS semantics, glsl:457-503)."""
    n_rays = origin.shape[0]
    best_t = jnp.full((n_rays,), T_FAR, dtype=jnp.float32)
    best_point = jnp.zeros((n_rays, 3), dtype=jnp.float32)
    best_tri = jnp.full((n_rays,), -1, dtype=jnp.int32)
    best_inst = jnp.full((n_rays,), -1, dtype=jnp.int32)

    wmin, wmax = instance_world_aabbs(arrays)  # (I, 3) on device
    inv_dir_w = 1.0 / direction

    for i, meta in enumerate(arrays.instance_meta):
        if meta.num_triangles == 0:
            continue  # empty mesh (e.g. the reference's missing car.obj)
        tmin_w, _, hit_w = slab_test(origin, inv_dir_w, wmin[i], wmax[i])
        a_i = active & hit_w & (tmin_w <= best_t)
        inv_t = arrays.inv_transforms[i]
        o_l = origin @ inv_t[:3, :3].T + inv_t[:3, 3]
        d_l = normalize(direction @ inv_t[:3, :3].T, eps=1e-20)
        t_l, tri = traverse_blas(
            arrays, o_l, d_l, a_i, meta.node_offset, meta.tri_offset, leaf_size
        )
        got = tri >= 0
        hit_l = o_l + d_l * t_l[:, None]
        fwd = arrays.transforms[i]
        hit_w_pt = hit_l @ fwd[:3, :3].T + fwd[:3, 3]
        delta = hit_w_pt - origin
        t_w = jnp.sqrt(jnp.sum(delta * delta, axis=-1))  # world t (glsl:485)
        better = got & (t_w < best_t)
        best_t = jnp.where(better, t_w, best_t)
        best_point = jnp.where(better[:, None], hit_w_pt, best_point)
        best_tri = jnp.where(better, tri, best_tri)
        best_inst = jnp.where(better, jnp.int32(i), best_inst)

    return Hit(
        t=best_t,
        point=best_point,
        tri=best_tri,
        inst=best_inst,
        found=best_tri >= 0,
    )


def hit_shading_data(arrays: SceneArrays, hit: Hit):
    """Resolve the winning triangle into (world normal, material row).

    Normal = normalized geometric normal transformed by the inverse-transpose of
    the instance transform (glsl:489-490); NOT flipped toward the ray, faithful to
    hitTriangle (glsl:411)."""
    tid = jnp.maximum(hit.tri, 0)
    e1 = arrays.tri_e1[tid]
    e2 = arrays.tri_e2[tid]
    n_local = face_normal(e1, e2)
    inst = jnp.maximum(hit.inst, 0)
    inv_t = arrays.inv_transforms[inst]  # (R, 4, 4) gather; instance count is small
    # normalMatrix = transpose(inverseTransform) => n_w = n_l @ invT[:3,:3]
    n_world = normalize(
        jnp.einsum("rk,rkj->rj", n_local, inv_t[:, :3, :3]), eps=1e-20
    )
    mat_idx = arrays.tri_mat[tid]
    material = arrays.materials[mat_idx]  # (R, 8)
    return n_world, material, mat_idx


def brute_force_scene(
    arrays: SceneArrays, origin, direction, active
) -> Hit:
    """BVH-free oracle: intersect every instanced triangle of every instance.

    This is the ground truth the reference never had (SURVEY.md §4) — used by the
    golden-image tests to validate the BVH path, and by tiny scenes where
    traversal overhead dominates."""
    n_rays = origin.shape[0]
    best_t = jnp.full((n_rays,), T_FAR, dtype=jnp.float32)
    best_point = jnp.zeros((n_rays, 3), dtype=jnp.float32)
    best_tri = jnp.full((n_rays,), -1, dtype=jnp.int32)
    best_inst = jnp.full((n_rays,), -1, dtype=jnp.int32)

    for i, meta in enumerate(arrays.instance_meta):
        if meta.num_triangles == 0:
            continue
        inv_t = arrays.inv_transforms[i]
        o_l = origin @ inv_t[:3, :3].T + inv_t[:3, 3]
        d_l = normalize(direction @ inv_t[:3, :3].T, eps=1e-20)
        sl = slice(meta.tri_offset, meta.tri_offset + meta.num_triangles)
        # (R, T_i) pairwise Möller–Trumbore
        t, h = moller_trumbore(
            o_l[:, None, :],
            d_l[:, None, :],
            arrays.tri_v0[sl][None, :, :],
            arrays.tri_e1[sl][None, :, :],
            arrays.tri_e2[sl][None, :, :],
        )
        t = jnp.where(h, t, T_FAR)
        k = jnp.argmin(t, axis=1)
        t_l = jnp.take_along_axis(t, k[:, None], axis=1)[:, 0]
        got = active & (t_l < T_FAR)
        hit_l = o_l + d_l * t_l[:, None]
        fwd = arrays.transforms[i]
        hit_w_pt = hit_l @ fwd[:3, :3].T + fwd[:3, 3]
        delta = hit_w_pt - origin
        t_w = jnp.sqrt(jnp.sum(delta * delta, axis=-1))
        better = got & (t_w < best_t)
        best_t = jnp.where(better, t_w, best_t)
        best_point = jnp.where(better[:, None], hit_w_pt, best_point)
        best_tri = jnp.where(better, (meta.tri_offset + k).astype(jnp.int32), best_tri)
        best_inst = jnp.where(better, jnp.int32(i), best_inst)

    return Hit(
        t=best_t,
        point=best_point,
        tri=best_tri,
        inst=best_inst,
        found=best_tri >= 0,
    )
