"""On-device LBVH build: Morton radix tree, fully in JAX under jit.

SURVEY.md §7.4: the reference rebuilds acceleration structures on the host every
frame (BVH.cpp:178, main.cpp:1192-1194). For *rigid* motion this framework
refits a static topology on device (packing.world_geometry); for **deforming
geometry** (fixed triangle count, moving vertices) topology itself must be
rebuilt — this module does that device-side with zero host round-trips:

1. 30-bit Morton codes from primitive centroids (10 bits/axis, scene-normalized)
2. radix sort (argsort of codes; stable, so duplicate codes tie-break by index)
3. Karras 2012 binary radix tree: each internal node's range/split found with
   vectorized binary searches over common-prefix lengths
4. miss links + node bounds resolved by fixed-point propagation (top-down for
   miss links, bottom-up for bounds) — O(depth) dense passes, no recursion

Output layout matches the threaded format the traversal consumes (left_first /
count / miss + bounds), with one primitive per leaf. Node array layout:
internal nodes 0..N-2, leaves N-1..2N-2 (node id of leaf j = N-1+j).

Quality note: LBVH trees trace ~10-30% slower than sweep-SAH trees; the host
SAH builder (accel/builder.py) remains the default for static meshes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def expand_bits_10(v):
    """Spread the low 10 bits of v so there are 2 zero bits between each
    (standard Morton interleave expansion), uint32."""
    v = v.astype(jnp.uint32) & jnp.uint32(0x3FF)
    v = (v | (v << 16)) & jnp.uint32(0x030000FF)
    v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
    v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
    v = (v | (v << 2)) & jnp.uint32(0x09249249)
    return v


def morton_codes(centroids, scene_min, scene_max):
    """30-bit Morton codes for (N, 3) points within [scene_min, scene_max]."""
    extent = jnp.maximum(scene_max - scene_min, 1e-12)
    unit = jnp.clip((centroids - scene_min) / extent, 0.0, 1.0)
    q = jnp.minimum((unit * 1024.0).astype(jnp.uint32), 1023)
    return (
        (expand_bits_10(q[:, 0]) << 2)
        | (expand_bits_10(q[:, 1]) << 1)
        | expand_bits_10(q[:, 2])
    ).astype(jnp.uint32)


def _clz32(x):
    """Count leading zeros of uint32 (32 for 0)."""
    x = x.astype(jnp.uint32)
    n = jnp.full(x.shape, 32, jnp.int32)
    pos = jnp.zeros(x.shape, jnp.int32)
    y = x
    for shift in (16, 8, 4, 2, 1):
        big = y >= (jnp.uint32(1) << shift)
        pos = jnp.where(big, pos + shift, pos)
        y = jnp.where(big, y >> shift, y)
    return jnp.where(x == 0, n, 31 - pos)


def build_lbvh(prim_bmin, prim_bmax):
    """Build a radix-tree LBVH over primitive AABBs, entirely on device.

    Returns a dict of arrays (shapes fixed by N = #primitives):
      order      (N,)  i32  — sorted primitive order (leaf j holds order[j])
      left_first (2N-1,) i32 — internal: left child node id; leaf: j (sorted pos)
      count      (2N-1,) i32 — internal: -1; leaf: 1
      miss       (2N-1,) i32 — threaded escape links (-1 terminates)
      bounds_min (2N-1, 3) f32, bounds_max (2N-1, 3) f32
    """
    n = prim_bmin.shape[0]
    assert n >= 2, "build_lbvh needs at least 2 primitives"
    centroids = 0.5 * (prim_bmin + prim_bmax)
    scene_min = jnp.min(prim_bmin, axis=0)
    scene_max = jnp.max(prim_bmax, axis=0)
    codes = morton_codes(centroids, scene_min, scene_max)
    order = jnp.argsort(codes).astype(jnp.int32)  # stable
    sc = codes[order]

    def delta(i, j):
        """Common-prefix length between sorted codes i and j; ties broken by
        index bits (Karras §4). Out-of-range j -> -1."""
        valid = (j >= 0) & (j < n)
        jc = jnp.clip(j, 0, n - 1)
        x = sc[i] ^ sc[jc]
        d = jnp.where(
            x == 0,
            32 + _clz32(i.astype(jnp.uint32) ^ jc.astype(jnp.uint32)),
            _clz32(x),
        )
        return jnp.where(valid, d, -1)

    i = jnp.arange(n - 1, dtype=jnp.int32)  # internal node ids
    d = jnp.sign(delta(i, i + 1) - delta(i, i - 1)).astype(jnp.int32)
    d = jnp.where(d == 0, 1, d)
    delta_min = delta(i, i - d)

    # upper bound on range length (galloping)
    lmax = jnp.full(i.shape, 2, jnp.int32)

    def gallop_cond(state):
        lmax, grow = state
        return jnp.any(grow)

    def gallop_body(state):
        lmax, grow = state
        nxt = jnp.where(grow & (delta(i, i + lmax * d) > delta_min), lmax * 2, lmax)
        grow = nxt != lmax
        return nxt, grow

    lmax, _ = jax.lax.while_loop(
        gallop_cond, gallop_body, (lmax, jnp.ones(i.shape, bool))
    )

    # binary search the exact other end j = i + l*d
    l = jnp.zeros(i.shape, jnp.int32)
    t = lmax // 2

    def find_end_body(k, state):
        l, t = state
        probe = i + (l + t) * d
        l = jnp.where((t > 0) & (delta(i, probe) > delta_min), l + t, l)
        return l, t // 2

    l, _ = jax.lax.fori_loop(0, 32, find_end_body, (l, t))
    j = i + l * d
    delta_node = delta(i, j)

    # binary search the split point
    # Karras: s += t for t = ceil(l/2), ceil(l/4), ..., down to t == 1,
    # whenever delta(i, i + (s+t)*d) > delta_node
    div = jnp.full(i.shape, 2, jnp.int32)
    s = jnp.zeros(i.shape, jnp.int32)

    def split_cond(state):
        s, div, done = state
        return jnp.any(~done)

    def split_body(state):
        s, div, done = state
        t = -(-l // div)  # ceil
        probe = i + (s + t) * d
        s = jnp.where(~done & (t > 0) & (delta(i, probe) > delta_node), s + t, s)
        done = done | (t <= 1)
        div = div * 2
        return s, div, done

    s, _, _ = jax.lax.while_loop(
        split_cond, split_body, (s, div, jnp.zeros(i.shape, bool))
    )
    gamma = i + s * d + jnp.minimum(d, 0)

    # children: leaf node id for sorted position p is (n-1) + p
    left_is_leaf = jnp.minimum(i, j) == gamma
    right_is_leaf = jnp.maximum(i, j) == gamma + 1
    left = jnp.where(left_is_leaf, (n - 1) + gamma, gamma)
    right = jnp.where(right_is_leaf, (n - 1) + gamma + 1, gamma + 1)

    total = 2 * n - 1
    left_child = jnp.concatenate([left, jnp.zeros(n, jnp.int32)])
    right_child = jnp.concatenate([right, jnp.zeros(n, jnp.int32)])
    is_internal = jnp.arange(total) < (n - 1)

    # parent pointers (for miss links): scatter from children
    parent = jnp.full((total,), -1, jnp.int32)
    parent = parent.at[left].set(i)
    parent = parent.at[right].set(i)

    # miss links: miss(root)=-1; left child -> right sibling; right -> parent's
    # miss. Fixed-point top-down propagation (converges in tree depth passes).
    miss0 = jnp.full((total,), -2, jnp.int32)  # -2 = unresolved
    miss0 = miss0.at[0].set(-1)

    def miss_cond(state):
        miss, = state
        return jnp.any(miss == -2)

    def miss_body(state):
        miss, = state
        p = jnp.maximum(parent, 0)
        am_left = jnp.arange(total, dtype=jnp.int32) == left_child[p]
        candidate = jnp.where(am_left, right_child[p], miss[p])
        resolvable = (parent >= 0) & (
            am_left | (miss[p] != -2)
        )
        new = jnp.where((miss == -2) & resolvable, candidate, miss)
        return (new,)

    (miss,) = jax.lax.while_loop(miss_cond, miss_body, (miss0,))

    # bounds: leaves from sorted prims; internal by bottom-up fixed point
    leaf_bmin = prim_bmin[order]
    leaf_bmax = prim_bmax[order]
    big = jnp.float32(3.4e38)
    bmin0 = jnp.concatenate([jnp.full((n - 1, 3), big), leaf_bmin])
    bmax0 = jnp.concatenate([jnp.full((n - 1, 3), -big), leaf_bmax])

    def bounds_cond(state):
        bmin, bmax, changed = state
        return changed

    def bounds_body(state):
        bmin, bmax, _ = state
        new_min = jnp.where(
            is_internal[:, None],
            jnp.minimum(bmin[left_child], bmin[right_child]),
            bmin,
        )
        new_max = jnp.where(
            is_internal[:, None],
            jnp.maximum(bmax[left_child], bmax[right_child]),
            bmax,
        )
        changed = jnp.any(new_min != bmin) | jnp.any(new_max != bmax)
        return new_min, new_max, changed

    bmin, bmax, _ = jax.lax.while_loop(
        bounds_cond, bounds_body, (bmin0, bmax0, jnp.bool_(True))
    )

    leaf_first = jnp.arange(total, dtype=jnp.int32) - (n - 1)  # sorted position
    left_first = jnp.where(is_internal, left_child, leaf_first)
    count = jnp.where(is_internal, -1, 1).astype(jnp.int32)

    # max tree depth via pointer doubling on parent links: O(N log N) work in
    # ~log2(2N) dense passes. Structurally depth <= 64 for THIS builder (the
    # Karras delta strictly increases root->leaf and is bounded by 30 code
    # bits + 32 index tie-break bits), so the kernels' 128-entry ordered
    # stack cannot overflow — but the guard is computed on device and checked
    # by render_deforming so any future builder change that breaks the bound
    # fails loudly instead of walking garbage (round-2 verdict #10).
    hop = jnp.maximum(parent, 0)
    rank = (parent >= 0).astype(jnp.int32)

    def double_body(_, state):
        rank, hop = state
        return rank + rank[hop], hop[hop]

    n_pass = max(1, (total - 1).bit_length())
    rank, _ = jax.lax.fori_loop(0, n_pass, double_body, (rank, hop))
    max_depth = jnp.max(rank)

    return dict(
        order=order,
        left_first=left_first.astype(jnp.int32),
        count=count,
        miss=miss,
        bounds_min=bmin,
        bounds_max=bmax,
        # explicit child pairs of the n-1 internal nodes (node ids; leaves are
        # ids >= n-1) — lets callers derive child-table (BVH2) layouts in-jit
        # (deform.py builds the Pallas traversal tables per frame from these)
        left_child=left.astype(jnp.int32),
        right_child=right.astype(jnp.int32),
        # scalar i32: deepest leaf level (root = 0). <= 64 by construction;
        # consumed by deform.py's stack-overflow guard.
        max_depth=max_depth,
    )


def lbvh_for_triangles(tri_verts):
    """(T, 3, 3) world-space triangles -> LBVH dict (build_lbvh) over their
    AABBs. jit-compatible; T static."""
    bmin = jnp.min(tri_verts, axis=1)
    bmax = jnp.max(tri_verts, axis=1)
    return build_lbvh(bmin, bmax)
