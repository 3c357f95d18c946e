"""Chunked-scene runtime: transform updates, topology refresh (the round-2
staleness bug), progressive RNG keying, cross-chunk picking, auto topology
refresh under drift.

Reference behaviors covered: per-frame TLAS rebuild keeps dynamic scenes
correct (RayZen/src/main.cpp:1123-1208); CPU picking over every object
(main.cpp:502-552).

Chunked renders in interpret mode are expensive; the dynamic-scene coverage
is therefore one sequential journey over a single compiled renderer, and the
tests that never render (auto-refresh bookkeeping, picking) build theirs with
async_compile="lazy" so nothing compiles at all."""

import numpy as np
import jax.numpy as jnp
import pytest

from rayzen_tpu.bigscene import partition_scene, render_radiance_chunked
from rayzen_tpu.config import RenderConfig
from rayzen_tpu.demo import build_small_scene
from rayzen_tpu.packing import pack_scene
from rayzen_tpu.picking import pick, pick_chunks
from rayzen_tpu.renderer import Renderer


W, H = 32, 24


def chunked_cfg(**kw):
    # a chunk budget below the small scene's 184 triangles forces the chunked
    # path (tiered off, 2 chunks) at test size
    kw.setdefault("auto_refresh_drift", 0.0)
    kw.setdefault("chunk_tris", 92)
    return RenderConfig(
        width=W, height=H, spp=1, max_bounces=2, tiered="off", **kw
    )


@pytest.fixture(scope="module")
def norender_renderer():
    """For tests that never call render_frame: skip waiting on compiles."""
    scene = build_small_scene(W, H)
    r = Renderer(scene, chunked_cfg(chunk_tris=40), async_compile="lazy",
                 use_cache=False)
    assert r.arrays_list is not None and len(r.arrays_list) >= 2
    return r


class TestChunkedKeying:
    def test_rng_key_changes_chunked_image(self):
        """ADVICE r2 (medium): the chunked path must key the reference
        sampler progressively — otherwise every rng_key renders the same
        image and accumulation stalls."""
        scene = build_small_scene(W, H)
        cfg = chunked_cfg()
        chunks = partition_scene(scene, max_tris=92)
        arrays_list = [pack_scene(c, cfg) for c in chunks]
        cam = {k: jnp.asarray(v)
               for k, v in scene.camera.device_params().items()}
        img0 = np.asarray(render_radiance_chunked(arrays_list, cam, cfg,
                                                  rng_key=0))
        img1 = np.asarray(render_radiance_chunked(arrays_list, cam, cfg,
                                                  rng_key=1))
        assert not np.allclose(img0, img1)
        # key 0 still reproduces the single-tree reference sequence
        from rayzen_tpu.integrator import render_radiance

        xcfg = cfg.replace(kernels="xla")
        single = np.asarray(
            render_radiance(pack_scene(scene, xcfg), cam, xcfg, rng_key=0)
        )
        assert np.abs(single - img0).max() < 1e-4


class TestChunkedDynamic:
    def test_dynamic_journey(self):
        """One compiled chunked renderer, driven through the whole dynamic
        lifecycle (compiling chunked programs in interpret mode is the
        expensive part, so the coverage is sequential on purpose):

        1. update_transforms moves geometry (round-2 verdict: it raised
           NotImplementedError on chunked scenes),
        2. refresh_topology actually changes the render (round-2 weak #3,
           failing first: the jitted closures kept the original chunk tuple
           baked in, so refreshes silently rendered stale geometry),
        3. after refresh, the image matches a from-scratch renderer on the
           moved scene."""
        scene = build_small_scene(W, H)
        r = Renderer(scene, chunked_cfg(), async_compile=False,
                     use_cache=False)
        assert r.arrays_list is not None and len(r.arrays_list) >= 2
        base = r.render_frame(mode="pt")

        # 1. traced transform update, no rebuild
        t = scene.transforms()
        t[1][1, 3] += 1.5  # raise the ball
        r.update_transforms(t)
        moved = r.render_frame(mode="pt")
        assert not np.allclose(base, moved)

        # 2. topology refresh must not render stale geometry
        scene.game_objects[2].transform[0, 3] += 6.0
        r.refresh_topology()
        refreshed = r.render_frame(mode="pt")
        assert not np.allclose(moved, refreshed)

        # 3. equivalence with a fresh build on the moved scene (same chunk
        # partition -> same jit shapes -> reuses the compiled program).
        # Frame 0 of a fresh renderer uses the reduced first-frame bounce
        # budget (main.cpp:600) — compare its second frame.
        fresh = Renderer(scene, r.cfg, async_compile=False, use_cache=False)
        fresh.render_frame(mode="pt")
        b = fresh.render_frame(mode="pt")
        assert np.abs(refreshed - b).max() < 1e-4

    def test_auto_refresh_triggers(self, norender_renderer):
        r = norender_renderer
        topo0 = r._topo_transforms.copy()
        r.cfg = r.cfg.replace(auto_refresh_drift=0.05)
        try:
            t = r.scene.transforms()
            t[1][0, 3] += 100.0  # drift far beyond 5% of the scene diagonal
            r.update_transforms(t)
            # the auto refresh re-recorded the topology reference transforms
            assert not np.allclose(r._topo_transforms, topo0)
            assert np.allclose(r._topo_transforms[1][0, 3], t[1][0, 3])
        finally:
            r.cfg = r.cfg.replace(auto_refresh_drift=0.0)

    def test_small_motion_does_not_refresh(self, norender_renderer):
        r = norender_renderer
        r.cfg = r.cfg.replace(auto_refresh_drift=0.5)
        try:
            topo0 = r._topo_transforms.copy()
            t = r.scene.transforms()
            t[1][0, 3] += 1e-3
            r.update_transforms(t)
            assert np.allclose(r._topo_transforms, topo0)
        finally:
            r.cfg = r.cfg.replace(auto_refresh_drift=0.0)


class TestChunkedPicking:
    def test_pick_finds_other_chunks(self, norender_renderer):
        """ADVICE r2 (low): picking must see geometry outside chunk 0."""
        r = norender_renderer
        cam = r._camera_params()
        res = (r.cfg.width, r.cfg.height)
        found_chunks = set()
        for x in range(2, W, 4):
            for y in range(2, H, 4):
                hit = pick_chunks(r.arrays_list, cam, (x, y), res)
                if hit is not None:
                    found_chunks.add(hit["chunk"])
        # the small scene spans several chunks at chunk_tris=40; a sweep of
        # the frame must hit geometry in more than chunk 0
        assert len(found_chunks) >= 2

    def test_pick_closest_across_chunks(self, norender_renderer):
        """The cross-chunk pick must agree with a single-tree pick (closest
        hit wins regardless of which chunk holds it)."""
        r = norender_renderer
        cam = r._camera_params()
        res = (r.cfg.width, r.cfg.height)
        single = pack_scene(r.scene, r.cfg)
        for xy in [(W // 2, H // 2), (W // 3, H // 3), (3, 3)]:
            a = pick_chunks(r.arrays_list, cam, xy, res)
            b = pick(single, cam, xy, res)
            assert (a is None) == (b is None)
            if a is not None:
                assert abs(a["t"] - b["t"]) < 1e-4
