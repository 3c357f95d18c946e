"""Deforming geometry: per-frame on-device LBVH rebuild, end to end.

Rigid motion needs only the device refit of a static topology
(packing.world_geometry); *deforming* meshes (fixed triangle count, vertices
moving arbitrarily — cloth, skinning, waves) invalidate topology itself. The
reference would rebuild its BVH on the host and re-upload (BVH.cpp:99,
main.cpp:1123-1208); here the whole pipeline stays on device and inside one
jit: world-space triangles -> Morton/Karras radix tree (accel/lbvh.py) ->
traversal tables -> path trace. No host round-trips, no recompilation across
frames (vertex positions are ordinary traced inputs).

Tables are built in the exact layouts the traversal consumes (records for the
miss-link XLA walk, inner/leaf child tables for the Pallas packet kernels and
the sample megakernel) with one triangle per leaf (leaf_k = 1).

Depth safety: for this builder the Karras tree depth is structurally <= 64
(the common-prefix length delta strictly increases along any root-to-leaf
path and is bounded by 30 Morton code bits + 32 index tie-break bits), so
the kernels' 128-entry ordered stack cannot overflow. Defense-in-depth
anyway: the LBVH computes its actual max depth on device (pointer doubling,
accel/lbvh.py) and render_deforming poisons the frame with NaN + prints a
diagnostic if a future builder change ever exceeded the stack — a loud
error, never a silent bad walk.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .accel.lbvh import lbvh_for_triangles
from .config import RenderConfig
from .packing import WorldArrays


def world_from_deforming(
    tri_verts,  # (T, 3, 3) world-space vertices — traced, deforms per frame
    tri_mat,  # (T,) i32 material ids
    materials,  # (M, 8) f32
    lights,  # (L, 8) f32
    with_depth: bool = False,
):
    """Build a complete WorldArrays from deforming world-space triangles with
    an on-device LBVH — jit-compatible, topology rebuilt every call.

    with_depth=True additionally returns the tree's max depth (scalar i32,
    computed on device) for the traversal-stack guard."""
    n = tri_verts.shape[0]
    lb = lbvh_for_triangles(tri_verts)
    order = lb["order"]  # leaf j holds triangle order[j]

    v0 = tri_verts[:, 0]
    e1 = tri_verts[:, 1] - v0
    e2 = tri_verts[:, 2] - v0
    tris9 = jnp.concatenate([v0, e1, e2], axis=1)  # (T, 9)
    transp = materials[tri_mat, 6]  # TRANSPARENCY column
    menc = tri_mat.astype(jnp.float32) + 1.0  # world verts: orientation +1

    total = 2 * n - 1
    node_is_leaf = jnp.arange(total) >= (n - 1)
    bounds = jnp.concatenate([lb["bounds_min"], lb["bounds_max"]], axis=1)

    # ---- records (miss-link walk): [bounds|meta|tri9|transp|menc] ----
    leaf_tri = jnp.where(
        node_is_leaf, order[jnp.clip(jnp.arange(total) - (n - 1), 0, n - 1)], 0
    )
    first = jnp.where(node_is_leaf, leaf_tri, lb["left_first"])
    meta_f = jnp.stack(
        [first.astype(jnp.float32),
         lb["count"].astype(jnp.float32),
         lb["miss"].astype(jnp.float32)],
        axis=1,
    )
    records = jnp.concatenate(
        [bounds, meta_f, tris9[leaf_tri], transp[leaf_tri][:, None],
         menc[leaf_tri][:, None]],
        axis=1,
    )
    pad = (-records.shape[1]) % 8
    if pad:
        records = jnp.pad(records, ((0, 0), (0, pad)))

    # ---- BVH2 child tables (packet kernels / megakernel), leaf_k = 1 ----
    lc, rc = lb["left_child"], lb["right_child"]  # (n-1,) node ids

    def child_cols(c):
        is_leaf_c = c >= (n - 1)
        ref = jnp.where(is_leaf_c, c - (n - 1), c).astype(jnp.float32)
        cnt = jnp.where(is_leaf_c, 1.0, -1.0)
        return bounds[c], ref, cnt

    lb6, lref, lcnt = child_cols(lc)
    rb6, rref, rcnt = child_cols(rc)
    inner_table = jnp.concatenate(
        [lb6, rb6, lref[:, None], rref[:, None], lcnt[:, None], rcnt[:, None]],
        axis=1,
    )  # (n-1, 16)

    ltri = order  # leaf-table row j -> triangle order[j]
    leaf_table = jnp.concatenate(
        [tris9[ltri], transp[ltri][:, None],
         ltri.astype(jnp.float32)[:, None],  # first = global tri id
         jnp.ones((n, 1), jnp.float32),  # count = 1
         menc[ltri][:, None]],
        axis=1,
    )
    pad2 = (-leaf_table.shape[1]) % 8
    if pad2:
        leaf_table = jnp.pad(leaf_table, ((0, 0), (0, pad2)))

    ws = WorldArrays(
        tri_v0=v0,
        tri_e1=e1,
        tri_e2=e2,
        tri_mat=tri_mat,
        tri_inst=jnp.zeros((n,), jnp.int32),
        tri_nsign=jnp.ones((n,), jnp.float32),
        records=records,
        inner_table=inner_table,
        inner8_table=jnp.zeros((1, 72), jnp.float32),  # no wide-node collapse
        leaf8_table=jnp.zeros((1, leaf_table.shape[1]), jnp.float32),
        top_table=jnp.zeros((1, 16), jnp.float32),  # no tiered view either:
        tre_inner=jnp.zeros((1, 1, 128), jnp.float32),  # deforming meshes are
        tre_leaf=jnp.zeros((1, 1, 128), jnp.float32),  # VMEM-sized live data
        leaf_table=leaf_table,
        materials=materials,
        lights=lights,
        leaf_k=1,
    )
    if with_depth:
        return ws, lb["max_depth"]
    return ws


def render_deforming(
    tri_verts,  # (T, 3, 3) traced world-space vertices
    tri_mat,  # (T,) i32
    materials,  # (M, 8)
    lights,  # (L, 8)
    camera_params: dict,
    cfg: RenderConfig,
    max_bounces: Optional[int] = None,
    rng_key: int = 0,
    with_stats: bool = False,
):
    """Path-trace deforming geometry: LBVH rebuild + render, one jit. Uses the
    full-sample megakernel (interpret on CPU) unless cfg.kernels == "xla"."""
    from .integrator import _make_sampler, _swizzled_grid, trace_wave
    from .ops import camera_rays

    max_bounces = max_bounces or cfg.max_bounces
    ws, tree_depth = world_from_deforming(
        tri_verts, tri_mat, materials, lights, with_depth=True
    )
    frag, uv, inv = _swizzled_grid(cfg)

    # Stack-overflow guard: single-pop ordered-stack walks push at most one
    # NET entry per descent level (occupancy <= depth + 1), but multi-pop
    # walks can reach ~pop_n x depth (ADVICE r3) — so the guard must use the
    # pop width the megakernel will actually select for this tree. The LBVH's
    # depth is device-computed (traced), so the static _pick_pop_n clamp
    # can't apply here; this runtime check covers it.
    from .ops.megakernel import _pick_pop_n
    from .ops.pallas_traverse import STACK_DEPTH

    pop_n = _pick_pop_n(ws, cfg) if cfg.kernels != "xla" else 1
    # same occupancy bound _pick_pop_n enforces statically (ADVICE r4):
    # pop_n * (depth + 1) <= STACK_DEPTH - 2, not depth <= (S-2)//pop_n,
    # which admitted boundary depths one level past the kernel clamp's sizing
    depth_ok = (tree_depth + 1) * pop_n <= STACK_DEPTH - 2
    jax.lax.cond(
        depth_ok,
        lambda: None,
        lambda: jax.debug.print(
            "rayzen_tpu.deform: LBVH depth {d} exceeds the {s}-entry "
            "traversal stack at pop width " + str(pop_n) +
            " — frame poisoned with NaN",
            d=tree_depth, s=STACK_DEPTH,
        ),
    )

    if cfg.kernels != "xla":
        from .ops import megakernel

        act = jnp.ones((frag.shape[0],), bool)
        on_cpu = jax.default_backend() == "cpu"

        def one_sample(samp):
            return megakernel.sample_wave(
                ws, cfg, uv, act, camera_params, samp, rng_key, max_bounces,
                interpret=on_cpu,
            )

    else:
        sampler = _make_sampler(cfg, frag, uv, cfg.width, cfg.height, rng_key)

        def one_sample(samp):
            if cfg.rng == "reference":
                # same progressive keying as the megakernel branch (which keys
                # samp via rng_key inside sample_wave) — keeps kernels="xla"
                # and kernels="pallas" drawing identical sample sequences for
                # every rng_key, not just key 0.
                samp = jnp.asarray(samp, jnp.float32) + (
                    jnp.asarray(rng_key, jnp.float32) * float(cfg.spp)
                )
            sampler.start_sample(samp)
            jitter = sampler.camera_jitter()
            origin, direction = camera_rays.generate_rays(
                uv, jitter, camera_params["inv_proj"],
                camera_params["inv_view"], camera_params["position"],
            )
            return trace_wave(
                ws, origin, direction, camera_params["position"], cfg,
                sampler, samp, max_bounces,
            )

    total = jnp.zeros((frag.shape[0], 3), dtype=jnp.float32)
    rays_traced = jnp.int32(0)
    if cfg.spp <= 2:
        for samp in range(cfg.spp):
            radiance, rays = one_sample(samp)
            total = total + radiance
            rays_traced = rays_traced + rays
    else:

        def body(samp, carry):
            t, r = carry
            radiance, rays = one_sample(samp)
            return t + radiance, r + rays

        total, rays_traced = jax.lax.fori_loop(
            0, cfg.spp, body, (total, rays_traced)
        )

    color = jnp.clip(total / float(cfg.spp), 0.0, 1.0)
    color = jnp.where(depth_ok, color, jnp.float32(jnp.nan))
    if inv is not None:
        color = color[inv]
    img = color.reshape(cfg.height, cfg.width, 3)
    if with_stats:
        return img, rays_traced
    return img
