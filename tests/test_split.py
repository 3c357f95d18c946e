"""Split-bounce continuation (config.split_bounce): image parity vs the fused
megakernel, across split points, rebin modes, and non-packet-multiple waves.

The split path must be image-identical to the single fused kernel — per-ray
math and RNG draws are unchanged (both follow fragment_shader.glsl:695-770);
rays are only permuted between phase 1 and phase 2 — so these assert exact
equality, not SSIM."""

import numpy as np
import jax.numpy as jnp
import pytest

from rayzen_tpu import RenderConfig, pack_scene
from rayzen_tpu.demo import build_demo_scene, build_small_scene
from rayzen_tpu.integrator import render_radiance, render_radiance_with_stats


def _render(scene, cfg, with_stats=False):
    arrays = pack_scene(scene, cfg)
    cam = {k: jnp.asarray(v) for k, v in scene.camera.device_params().items()}
    if with_stats:
        img, rays = render_radiance_with_stats(arrays, cam, cfg)
        return np.asarray(img), int(rays)
    return np.asarray(render_radiance(arrays, cam, cfg))


@pytest.mark.parametrize("split_b", [1, 2, 3, 4])
def test_split_matches_fused(split_b):
    scene = build_small_scene(64, 48)
    base = RenderConfig(width=64, height=48, spp=1, kernels="pallas")
    fused, rays_fused = _render(scene, base, with_stats=True)
    split, rays_split = _render(
        scene, base.replace(split_bounce=split_b), with_stats=True
    )
    np.testing.assert_array_equal(split, fused)
    assert rays_split == rays_fused  # same honest traced-ray tally


def test_split_octant_rebin_matches():
    scene = build_small_scene(64, 48)
    base = RenderConfig(width=64, height=48, spp=1, kernels="pallas")
    fused = _render(scene, base)
    split = _render(
        scene, base.replace(split_bounce=2, split_rebin="octant")
    )
    np.testing.assert_array_equal(split, fused)


def test_split_octcell_rebin_matches():
    # composed radix partition (origin cell pass, then octant pass)
    scene = build_small_scene(64, 48)
    base = RenderConfig(width=64, height=48, spp=1, kernels="pallas")
    fused = _render(scene, base)
    split = _render(
        scene, base.replace(split_bounce=2, split_rebin="octcell")
    )
    np.testing.assert_array_equal(split, fused)


def test_split_every_matches():
    # per-bounce compaction chain (split_every): 3 continuation phases
    scene = build_small_scene(64, 48)
    base = RenderConfig(width=64, height=48, spp=1, kernels="pallas")
    fused, rays_fused = _render(scene, base, with_stats=True)
    split, rays_split = _render(
        scene,
        base.replace(split_bounce=2, split_every=True, split_rebin="octant"),
        with_stats=True,
    )
    np.testing.assert_array_equal(split, fused)
    assert rays_split == rays_fused


def test_split_non_packet_multiple_and_spp():
    # 40x36 = 1440 rays: not a multiple of the 4096-ray packet, exercising
    # the padded tail through compaction; spp=2 exercises the XLA sample loop
    scene = build_small_scene(40, 36)
    base = RenderConfig(width=40, height=36, spp=2, kernels="pallas")
    fused = _render(scene, base)
    split = _render(scene, base.replace(split_bounce=2))
    np.testing.assert_array_equal(split, fused)


def test_split_demo_scene_progressive_key():
    # real demo geometry + a nonzero rng_key (progressive accumulation path)
    scene = build_demo_scene(48, 32)
    base = RenderConfig(width=48, height=32, spp=1, kernels="pallas")
    arrays = pack_scene(scene, base)
    cam = {k: jnp.asarray(v) for k, v in scene.camera.device_params().items()}
    fused = np.asarray(render_radiance(arrays, cam, base, rng_key=3))
    split = np.asarray(
        render_radiance(
            arrays, cam, base.replace(split_bounce=3), rng_key=3
        )
    )
    np.testing.assert_array_equal(split, fused)
    # keying still works on the split path: a different key changes the image
    other = np.asarray(
        render_radiance(
            arrays, cam, base.replace(split_bounce=3), rng_key=4
        )
    )
    assert np.any(other != split)
