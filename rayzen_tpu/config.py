"""Render configuration.

The reference hardcodes nearly everything (RayZen/src/main.cpp:35-36 resolution,
RayZen/shaders/fragment_shader.glsl:673-675 bounces/spp, RayZen/src/BVH.cpp:115 leaf
size, fragment_shader.glsl:764 Russian-roulette start). SURVEY.md §5 calls for
promoting those constants to a config object; this dataclass is that object, plus the
reference's actual CLI flags (--log, --rebuild-bvh, --warmup-frames,
--path-tracer-only; RayZen/src/main.cpp:141-160).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static rendering parameters. Hashable so it can key jit specializations."""

    # Framebuffer (reference default 800x600: RayZen/src/main.cpp:35-36).
    width: int = 800
    height: int = 600

    # Sampling (reference: numSamples=1, maxBounces=5, frame 0 uses bounce budget 1;
    # fragment_shader.glsl:673-675, main.cpp:600).
    spp: int = 1
    max_bounces: int = 5
    first_frame_bounces: int = 1

    # Russian roulette kicks in for bounce indices > rr_start_bounce
    # (fragment_shader.glsl:764).
    rr_start_bounce: int = 2

    # BVH build (SAH default: BVH.h:34). The reference caps leaves at 4
    # triangles (BVH.cpp:115); leaf_size=8 measured ~9% faster end-to-end on
    # v5e (fatter leaves trade cheap dense vector MT tests for fewer
    # latency-bound traversal iterations) and produces identical images —
    # tree shape never changes closest hits. Set 4 for build-structure parity.
    leaf_size: int = 8
    split_method: str = "sah"  # "sah" | "midpoint"

    # RNG: "reference" reproduces the sin-hash sampling flow of
    # fragment_shader.glsl:188-190 for image parity; "threefry" uses
    # counter-based hashing (better distributed, still deterministic).
    rng: str = "reference"

    # Shading constants (fragment_shader.glsl:110 ambient; :707-708 sky gradient;
    # :511 shadow iterations; :511,527 visibility floor).
    ambient: Tuple[float, float, float] = (0.05, 0.05, 0.05)
    sky_horizon: Tuple[float, float, float] = (0.15, 0.25, 0.45)
    sky_zenith: Tuple[float, float, float] = (0.5, 0.7, 1.0)
    shadow_max_iters: int = 32
    shadow_min_visibility: float = 0.05

    # Extension over the reference: progressive accumulation across frames
    # (the reference hardcodes 1 spp with no history; SURVEY.md §7 flags this
    # as a deliberate extension).
    accumulate: bool = False

    # Ray-wave tiling: rays per traversal wave. 0 = whole frame in one wave.
    wave_size: int = 0

    # Traversal backend: "auto" picks the full-sample Pallas megakernel on TPU
    # (raygen + traversal + lighting + bounces in one kernel) and the portable
    # XLA while_loop path on CPU; force with "pallas" / "xla". Variants for
    # comparison: "pallas-nomega" (staged per-wave packet kernels),
    # "pallas-bvh2" / "pallas-ml" (single kernel family, XLA bounce loop).
    # ("pallas*" on CPU runs the kernels in interpreter mode — tests only.)
    kernels: str = "auto"

    # Pixel-tile swizzle edge for packet coherence (0 = scanline order). Rays
    # are traced in tile x tile blocks so each traversal packet covers a
    # compact screen region; 64x64 = 4096 pixels = one Pallas packet.
    packet_tile: int = 64

    # Tiered (HBM-streamed treelet) traversal: scenes whose single-tree tables
    # exceed the VMEM budget keep a small top tree resident and DMA fixed-size
    # treelet blocks on demand (packing._build_treelets, ops/pallas_traverse
    # tiered walks). "auto" enables it past the budget; "on" forces it (tests);
    # "off" disables (falls back to chunked/bigscene or the XLA path).
    tiered: str = "auto"
    # Rows per treelet block (both inner rows and leaf rows; block bytes =
    # 2 * rows * 512). 64 -> ~64 KB of scratch, ~512 triangles per treelet.
    treelet_rows: int = 64

    # Megakernel sample fusion: trace this many samples of the same pixel
    # tile TOGETHER per packet walk (stacked sub-blocks carrying consecutive
    # sample indices). Same-pixel samples are traversal-coherent, so a fused
    # walk takes roughly one sample's iterations while serving all of them —
    # amortizing the per-iteration scalar/reduction overhead that bounds
    # packet throughput (docs/PERFORMANCE.md). Effective fuse is the largest
    # divisor of the per-dispatch sample count <= this value; 1 disables.
    sample_fuse: int = 1

    # Megakernel bounce 0 (primary rays + the direct-lighting shadow fan)
    # through the frustum-interval walks: internal nodes tested with pure
    # scalar interval math instead of per-ray vector slabs + reductions.
    # Exact same hits (leaves still run per-ray Moller-Trumbore); only the
    # traversal pruning is conservative. Geometry-dense scenes (every screen
    # tile covered) gain the most. BVH2 single-tree scenes only.
    frustum_primary: bool = False

    # BVH2 walks pop N stack entries per while_loop trip: the nodes' row
    # fetches, slab tests and packed consensus reductions are independent so
    # Mosaic overlaps their latencies — on LONG walks (big trees) an extra
    # node's work is nearly free, so this amortizes the per-trip overhead
    # N-fold (measured +29% on the 503k field at N=2; -14% on the small demo
    # tree, whose short walks pay for the dummy slots). 0 = auto: 1 for
    # small trees, multi-pop past walk_pop_auto_rows inner rows.
    walk_pop: int = 0
    walk_pop_auto_rows: int = 16384
    walk_pop_auto_n: int = 2
    # Back-compat alias: forces N=2 when walk_pop is 0.
    dual_pop: bool = False

    # Megakernel BVH2 leaf handling: process both children's leaf triangles
    # masked-dense every traversal step instead of gating on lax.conds (a
    # Mosaic cond costs ~2 us; 2*leaf_size masked Moller-Trumbore tests ~1 us).
    dense_leaves: bool = False

    # Wide (BVH8) traversal nodes in the megakernel: the BVH2 tree is
    # collapsed 8-wide at pack time (packing._collapse_bvh8); one traversal
    # step tests 8 children with a single cheap two-stage consensus reduction.
    wide_nodes: bool = False

    # Megakernel bounce traversal as 8 octant-masked sub-walks per packet:
    # shrinks the consensus node set for incoherent bounce waves (the in-VMEM
    # analog of octant ray sorting). Measured SLOWER on the demo scene (89-102
    # vs 57 ms/sample: real bounce waves die fast and are coherent enough that
    # eight root descents cost more than the consensus they save) — kept as a
    # knob for scenes with long-lived incoherent waves.
    octant_bounce_walks: bool = False

    # Split-bounce continuation: trace bounces 0..split_bounce-1 in the
    # phase-1 megakernel (which also emits per-ray continuation state),
    # stream-compact the surviving rays at the XLA level (cumsum ranks + one
    # permutation gather — NO sort; the argsort re-binning measured ~400
    # ms/sample), then finish bounces split_bounce..N-1 in a phase-2
    # continuation kernel. Late bounce waves run at single-digit alive
    # fractions but cost 11-16 ms each (docs/PERFORMANCE.md round 3) because
    # survivors scatter one-per-packet and every live packet pays a full
    # consensus walk; compaction concentrates them into few dense packets
    # while all-dead packets exit their bounce loop immediately. 0 disables
    # (the single fused megakernel). Reference-RNG single-tree scenes only.
    split_bounce: int = 0
    # Ordering of the compacted survivors: "rank" keeps pixel order among
    # them; "octant" buckets by direction octant first (a sort-free 9-bucket
    # stable partition), giving each phase-2 packet directionally tight rays.
    split_rebin: str = "rank"
    # Re-compact (and re-bin) before EVERY bounce from split_bounce on,
    # chaining one continuation kernel per late bounce — the cross-packet
    # re-binning experiment for big scenes, where each diffuse bounce
    # decorrelates the wave again. Permutations compose on an index vector;
    # the 13 state tiles are permuted once per phase.
    split_every: bool = False

    # Cross-packet bounce-wave re-binning (staged pipelines only: chunked big
    # scenes and kernels="pallas-nomega"): argsort each bounce wave by origin
    # Morton cell + direction octant at the XLA level so every Pallas packet
    # gets spatially/directionally tight rays — consensus walks then visit
    # their own region instead of the union of an incoherent pixel tile
    # (dead rays sort to the back, compacting for free). The fused megakernel
    # ignores this (its bounce loop never leaves the kernel).
    bounce_rebin: bool = False

    # Compact bounce waves (stream-compact alive rays to the front) before
    # traversal so packets of dead rays exit after one step. Pallas path only.
    # Off by default: measured on v5e with the demo scene, the prefix-sum +
    # permutation gathers cost more than the saved packet work (983 ms vs
    # 1625 ms per 1080p frame); enable for scenes where waves die fast.
    compact_rays: bool = False

    # Debug overlays (fragment_shader.glsl uniforms :99-105).
    debug_show_lights: bool = False
    debug_show_bvh: bool = False
    debug_bvh_mode: int = 0  # 0 = TLAS, 1 = BLAS
    debug_selected_blas: int = 0
    debug_selected_tri: int = 0
    show_fps_overlay: bool = False

    # Per-chunk world-triangle budget for the chunked big-scene path
    # (bigscene.partition_scene); 0 = bigscene.DEFAULT_CHUNK_TRIS. Scenes at
    # or under the budget stay on the single-tree fast path. Small values
    # force chunking on small scenes (tests / experiments).
    chunk_tris: int = 0

    # Automatic acceleration-structure maintenance: when an instance's
    # translation since the last topology build exceeds this fraction of the
    # scene's world diagonal, Renderer.update_transforms triggers
    # refresh_topology() — the on-demand analog of the reference's per-frame
    # TLAS rebuild (main.cpp:1192-1194), so traversal quality never decays
    # under sustained motion without paying a rebuild every frame. 0 disables.
    auto_refresh_drift: float = 0.25

    # Host-side knobs (not part of the jit key in practice, but harmless).
    cache_dir: str = ".rayzen_cache"
    compile_cache_dir: Optional[str] = None
    log_level: str = "info"
    warmup_frames: int = 0
    path_tracer_only: bool = False
    rebuild_bvh: bool = False

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)

    @property
    def resolution(self) -> Tuple[int, int]:
        return (self.width, self.height)

    @property
    def num_rays(self) -> int:
        return self.width * self.height
