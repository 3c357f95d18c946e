"""Golden-image regression: the demo scene must keep rendering the same image
(SSIM >= 0.98 against the stored golden; BASELINE.md acceptance style). The
golden was produced by this framework's own brute-force-validated renderer —
the oracle the reference never shipped (SURVEY.md §4)."""

import os

import numpy as np
import jax.numpy as jnp

from rayzen_tpu import RenderConfig, pack_scene
from rayzen_tpu.demo import build_demo_scene
from rayzen_tpu.image_io import ssim
from rayzen_tpu.integrator import render_radiance

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "demo_48x32.npz")


def _render(kernels: str):
    cfg = RenderConfig(width=48, height=32, spp=1, max_bounces=5, kernels=kernels)
    scene = build_demo_scene(48, 32)
    arrays = pack_scene(scene, cfg)
    cam = {k: jnp.asarray(v) for k, v in scene.camera.device_params().items()}
    return np.asarray(render_radiance(arrays, cam, cfg))


def test_demo_matches_golden_xla():
    golden = np.load(GOLDEN)["image"]
    img = _render("xla")
    s = ssim(img, golden)
    assert s >= 0.98, f"SSIM {s} < 0.98 vs golden"
    # stochastic paths aside, the deterministic pipeline should be near-exact
    assert np.abs(img - golden).mean() < 5e-3


def test_demo_matches_golden_pallas_interpret():
    golden = np.load(GOLDEN)["image"]
    img = _render("pallas")
    assert ssim(img, golden) >= 0.98
