"""Large-scene rendering: chunked trees so scenes beyond VMEM stay on the fast
Pallas path.

The packet kernels keep the whole scene's traversal tables resident in VMEM
(~16 MB/core), which caps a single tree at roughly 150k world triangles. The
reference renders arbitrary OBJ scenes (Mesh.cpp:6-50) limited only by GPU
memory, so parity demands a usable big-scene path: round 1 fell back to the
XLA gather walk (~0.4 Mrays/s — minutes per frame). Here instead the scene is
*partitioned* into chunks that each fit VMEM, every chunk gets its own unified
world-space BVH (the existing packing machinery, unchanged), and per wave the
integrator walks each chunk's tree with the ordered-stack packet kernels,
merging closest hits elementwise (shadow queries multiply per-chunk
transmission — order-independent, ops/traverse.shadow_walk's argument).
Cost is K x a demo-scene walk, with full t-pruning carried across chunks
(chunk k+1's walk starts from the best hit so far... via the merge; packets
whose rays already terminated still enter later chunks but prune at the root).

Partitioning: whole instances are packed greedily into chunks; a single mesh
too big for one chunk is split into Morton-ordered triangle runs (spatially
compact sub-meshes) that share the owning instance's transform. Lights,
materials, and camera replicate into every chunk.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import logging_util as log
from .config import RenderConfig
from .mesh import Mesh
from .scene import GameObject, Scene

# Per-chunk world-triangle budget, derived from the single-tree VMEM table
# budget (packing.SINGLE_TREE_VMEM_BUDGET, overridable via
# RAYZEN_TREE_BUDGET_MB): table bytes measure ~74-80 B per world triangle
# (probe sweep, scripts/probe_single_tree.py), so at the 36 MB default a
# chunk holds ~471k tris (one 503k-tri scene fits ~one chunk). The chunk
# size is capped at the probe-validated table budget (37.3 MB measured
# resident, scripts/probe_single_tree.py) independently of the env
# override, so a budget experiment can't silently over-size chunks past
# what Mosaic's scoped-VMEM limit was ever validated to hold (ADVICE r3).
from .packing import SINGLE_TREE_VMEM_BUDGET

_PROBE_VALIDATED_TABLE_BYTES = int(37.3 * 2**20)
DEFAULT_CHUNK_TRIS = min(SINGLE_TREE_VMEM_BUDGET,
                         _PROBE_VALIDATED_TABLE_BYTES) // 80


def _morton3(cent: np.ndarray) -> np.ndarray:
    """30-bit Morton codes for (T, 3) centroids (host, numpy)."""
    lo = cent.min(axis=0)
    span = np.maximum(cent.max(axis=0) - lo, 1e-12)
    q = np.clip(((cent - lo) / span) * 1023.0, 0, 1023).astype(np.uint64)

    def spread(x):
        x = (x | (x << 16)) & np.uint64(0x030000FF)
        x = (x | (x << 8)) & np.uint64(0x0300F00F)
        x = (x | (x << 4)) & np.uint64(0x030C30C3)
        x = (x | (x << 2)) & np.uint64(0x09249249)
        return x

    return (
        (spread(q[:, 0]) << np.uint64(2))
        | (spread(q[:, 1]) << np.uint64(1))
        | spread(q[:, 2])
    )


def split_mesh(mesh: Mesh, max_tris: int) -> List[Mesh]:
    """Split an oversized mesh into Morton-ordered triangle runs — each run is
    spatially compact, so per-run BVH quality stays close to the whole-mesh
    build."""
    t = mesh.num_triangles
    if t <= max_tris:
        return [mesh]
    order = np.argsort(_morton3(mesh.vertices.mean(axis=1)), kind="stable")
    parts = []
    for s in range(0, t, max_tris):
        idx = order[s : s + max_tris]
        parts.append(
            Mesh(
                vertices=mesh.vertices[idx],
                material_index=mesh.material_index[idx],
            )
        )
    return parts


def partition_scene(
    scene: Scene, max_tris: int = DEFAULT_CHUNK_TRIS
) -> List[Scene]:
    """Partition into chunk scenes of <= max_tris *world* (instanced)
    triangles each. Returns [scene] unchanged when it already fits."""
    total = sum(go.mesh.num_triangles for go in scene.game_objects)
    if total <= max_tris:
        return [scene]

    # explode oversized meshes once (shared across their instances); each
    # exploded object remembers which original scene.game_objects index it
    # came from so transform updates can be routed back (origin_indices below)
    split_cache: dict = {}
    exploded: List[GameObject] = []
    exploded_origin: List[int] = []
    for oi, go in enumerate(scene.game_objects):
        if go.mesh.num_triangles > max_tris:
            if id(go.mesh) not in split_cache:
                split_cache[id(go.mesh)] = split_mesh(go.mesh, max_tris)
            for part in split_cache[id(go.mesh)]:
                exploded.append(
                    GameObject(
                        mesh=part, transform=go.transform, name=go.name,
                        material_override=go.material_override,
                    )
                )
                exploded_origin.append(oi)
        else:
            exploded.append(go)
            exploded_origin.append(oi)

    # greedy bin-packing of instances in spatial (transform-origin Morton)
    # order so chunks stay spatially coherent
    origins = np.stack([np.asarray(go.transform)[:3, 3] for go in exploded])
    order = np.argsort(_morton3(origins), kind="stable")
    chunks: List[List[GameObject]] = [[]]
    chunk_origins: List[List[int]] = [[]]
    load = 0
    for i in order:
        go = exploded[int(i)]
        n = go.mesh.num_triangles
        if load and load + n > max_tris:
            chunks.append([])
            chunk_origins.append([])
            load = 0
        chunks[-1].append(go)
        chunk_origins[-1].append(exploded_origin[int(i)])
        load += n

    out = []
    for part, part_origins in zip(chunks, chunk_origins):
        s = Scene(camera=scene.camera, materials=scene.materials,
                  lights=scene.lights, game_objects=part)
        # per-chunk map: instance slot -> original scene.game_objects index
        # (split-mesh parts repeat their owner's index). Renderer.
        # update_transforms uses this to route a full (I, 4, 4) stack indexed
        # by the ORIGINAL scene order into each chunk's transform slots.
        s.origin_indices = np.asarray(part_origins, dtype=np.int64)
        out.append(s)

    # near-to-far from the camera: the per-chunk walks carry the best hit so
    # far as a t bound (t_init), so walking likely-nearest chunks first lets
    # later chunks prune against an already-tight bound
    cam = np.asarray(scene.camera.position, np.float32)

    def cam_dist(s):
        origins = np.stack([np.asarray(g.transform)[:3, 3] for g in s.game_objects])
        return float(np.linalg.norm(origins.mean(axis=0) - cam))

    out.sort(key=cam_dist)
    log.info(
        f"Partitioned scene: {total} world triangles -> {len(out)} chunks "
        f"(<= {max_tris} each)"
    )
    return out


def merge_hits(a, b):
    """Elementwise closest-hit merge of two per-chunk Hit records."""
    from .ops.traverse import Hit

    better = b.found & (b.t < a.t)
    bm = better[:, None]
    return Hit(
        t=jnp.where(better, b.t, a.t),
        point=jnp.where(bm, b.point, a.point),
        tri=jnp.where(better, b.tri, a.tri),
        inst=jnp.where(better, b.inst, a.inst),
        found=a.found | b.found,
        normal=jnp.where(bm, b.normal, a.normal),
        mat=jnp.where(better, b.mat, a.mat),
    )


def render_radiance_chunked(
    arrays_list,  # List[SceneArrays], one per chunk
    camera_params: dict,
    cfg: RenderConfig,
    max_bounces: Optional[int] = None,
    rng_key: int = 0,
    with_stats: bool = False,
):
    """Full-frame render over chunked trees (staged wavefront pipeline; each
    wave walks every chunk's tree with the packet kernels and merges).

    The single-tree fast path fuses the whole sample into one kernel
    (ops/megakernel.py); chunked scenes instead run the staged integrator —
    for scenes this size traversal dominates the stage-boundary costs."""
    from .integrator import _swizzled_grid  # shared pixel order
    from .ops import pallas_traverse as ptv
    from .packing import world_geometry

    max_bounces = max_bounces or cfg.max_bounces
    on_cpu = jax.default_backend() == "cpu"
    use_pallas = cfg.kernels != "xla"
    ws_list = [world_geometry(a) for a in arrays_list]
    ws0 = ws_list[0]

    def chunk_trace(ws_all, origin, direction, active):
        from .ops.traverse import traverse_world

        hit = None
        for ws in ws_all:
            if use_pallas:
                # carry the best t across chunks: later (farther) chunks prune
                # their walks against hits already found in nearer chunks
                h = ptv.pallas_closest_hit_bvh2(
                    ws, origin, direction, active, interpret=on_cpu,
                    t_init=None if hit is None else hit.t,
                )
            else:
                h = traverse_world(ws, origin, direction, active)
            hit = h if hit is None else merge_hits(hit, h)
        return hit

    def trace_fn(_ws, origin, direction, active):
        return chunk_trace(ws_list, origin, direction, active)

    def shadow_fn(_ws, origin, direction, max_dist, active, **kw):
        from .ops.traverse import shadow_walk

        min_vis = kw.get("min_visibility", cfg.shadow_min_visibility)
        vis_total, rays = None, None
        act = active
        for ws in ws_list:
            if use_pallas:
                vis, r = ptv.pallas_shadow_walk_bvh2(
                    ws, origin, direction, max_dist, act,
                    interpret=on_cpu, **kw,
                )
            else:
                vis, r = shadow_walk(ws, origin, direction, max_dist, act, **kw)
            vis_total = vis if vis_total is None else vis_total * vis
            # rays already extinguished skip the remaining chunk walks
            act = act & (vis_total > min_vis)
            rays = r if rays is None else rays  # one query per ray, not per chunk
        return vis_total, rays

    from .integrator import _make_sampler, trace_wave
    from .ops import camera_rays

    frag, uv, inv = _swizzled_grid(cfg)
    sampler = _make_sampler(cfg, frag, uv, cfg.width, cfg.height, rng_key)

    def one_sample(samp):
        if cfg.rng == "reference":
            # progressive keying, identical to integrator.render_rays: the
            # sin-hash sampler is a pure function of (pixel, sample index), so
            # key k continues at sample k*spp — without this, chunked frames
            # are bit-identical for every rng_key and accumulation stalls.
            samp = jnp.asarray(samp, jnp.float32) + (
                jnp.asarray(rng_key, jnp.float32) * float(cfg.spp)
            )
        sampler.start_sample(samp)
        jitter = sampler.camera_jitter()
        origin, direction = camera_rays.generate_rays(
            uv, jitter, camera_params["inv_proj"], camera_params["inv_view"],
            camera_params["position"],
        )
        return trace_wave(
            ws0, origin, direction, camera_params["position"], cfg, sampler,
            samp, max_bounces, trace_fn=trace_fn, shadow_fn=shadow_fn,
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

        total, rays_traced = jax.lax.fori_loop(0, cfg.spp, body, (total, rays_traced))

    color = jnp.clip(total / float(cfg.spp), 0.0, 1.0)
    if inv is not None:
        color = color[inv]
    img = color.reshape(cfg.height, cfg.width, 3)
    if with_stats:
        return img, rays_traced
    return img
