"""Tiered (HBM-streamed treelet) traversal: partition invariants and render
parity with the XLA path (interpret-mode DMA on CPU; Mosaic-compiled on TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from rayzen_tpu.config import RenderConfig
from rayzen_tpu.demo import build_small_scene
from rayzen_tpu.integrator import render_radiance
from rayzen_tpu.packing import pack_scene, world_geometry


@pytest.fixture(scope="module")
def tiered_setup():
    scene = build_small_scene(32, 24)
    cfg = RenderConfig(width=32, height=24, spp=1, max_bounces=3,
                       tiered="on", treelet_rows=8)
    arrays = pack_scene(scene, cfg)
    cam = {k: jnp.asarray(v) for k, v in scene.camera.device_params().items()}
    return scene, cfg, arrays, cam


class TestPartition:
    def test_treelets_cover_all_leaves(self, tiered_setup):
        _, _, arrays, _ = tiered_setup
        cnt = np.asarray(arrays.tre_child_count)
        node = np.asarray(arrays.tre_child_node)
        ref = np.asarray(arrays.tre_child_ref)
        src = np.asarray(arrays.tre_leaf_src)
        n_leaf_rows = int(arrays.bvh2_leaf_node.shape[0])
        used = set()
        for t in range(cnt.shape[0]):
            for i in range(cnt.shape[1]):
                for c in range(2):
                    if node[t, i, c] >= 0 and cnt[t, i, c] >= 0:
                        used.add(int(src[t, ref[t, i, c]]))
        assert used == set(range(n_leaf_rows))

    def test_block_bounds(self, tiered_setup):
        _, cfg, arrays, _ = tiered_setup
        assert arrays.tre_child_node.shape[1] == cfg.treelet_rows
        assert arrays.tre_leaf_src.shape[1] == cfg.treelet_rows
        assert arrays.tre_child_node.shape[0] >= 2  # small scene still splits

    def test_world_tables_shapes(self, tiered_setup):
        _, _, arrays, _ = tiered_setup
        ws = world_geometry(arrays)
        assert ws.tiered
        assert ws.tre_inner.shape[-1] == 128
        assert ws.tre_leaf.shape[-1] == 128
        assert ws.top_table.shape[-1] == 16


class TestTieredRender:
    def test_matches_xla(self, tiered_setup):
        _, cfg, arrays, cam = tiered_setup
        xla = np.asarray(
            render_radiance(arrays, cam, cfg.replace(kernels="xla"))
        )
        mega = np.asarray(
            render_radiance(arrays, cam, cfg.replace(kernels="pallas"))
        )
        assert np.abs(xla - mega).max() < 1e-4

    def test_five_bounces_with_shadows(self, tiered_setup):
        scene, cfg, _, cam = tiered_setup
        cfg5 = cfg.replace(max_bounces=5)
        arrays = pack_scene(scene, cfg5)
        xla = np.asarray(
            render_radiance(arrays, cam, cfg5.replace(kernels="xla"))
        )
        mega = np.asarray(
            render_radiance(arrays, cam, cfg5.replace(kernels="pallas"))
        )
        assert np.abs(xla - mega).max() < 1e-4
