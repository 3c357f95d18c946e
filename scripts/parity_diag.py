"""Diagnose the TPU-vs-CPU SSIM deficit (VERDICT r3 #8, carried from r2 #7).

The on-TPU demo render gates at SSIM ~0.9909 against the CPU brute-force
golden (0.98 gate) — this script classifies WHERE the divergence lives so the
budget is an analyzed number instead of slack where regressions could hide:

  1. per-pixel |diff| histogram (max over channels) at 256x192 and 800x600
  2. divergence classes:
     - "systematic" small diffs (accumulated f32 rounding: different fused
       ops on TPU vs CPU XLA) — expected to cover ~all pixels at <1e-2
     - "stochastic branch flips" (the sin-hash RNG evaluates to an epsilon-
       different value, flipping a specular-vs-diffuse or Russian-roulette
       branch for that pixel; the pixel renders a DIFFERENT valid sample)
       — expected isolated salt-and-pepper at large diff
  3. spatial structure of the large-diff set: isolated pixels -> stochastic;
     connected regions -> a real kernel bug
  4. a separating experiment: the portable XLA path ON TPU vs the Pallas
     megakernel ON TPU (same device float semantics) — splits "TPU float
     semantics vs CPU" from "megakernel reimplementation vs XLA path"

Writes results/<RAYZEN_ROUND>/parity_diag.txt (and .npz with raw histograms).
Reference image semantics: fragment_shader.glsl:668-822.

Usage: python scripts/parity_diag.py  (on TPU)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from rayzen_tpu.cache import setup_compile_cache
from rayzen_tpu.config import RenderConfig
from rayzen_tpu.demo import build_demo_scene
from rayzen_tpu.image_io import ssim
from rayzen_tpu.integrator import render_radiance
from rayzen_tpu.packing import pack_scene

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = os.path.join(HERE, "results", os.environ.get("RAYZEN_ROUND", "r5"))
THRESHOLDS = [1e-6, 1e-4, 1e-3, 1e-2, 0.05, 0.1, 0.25, 0.5]


def render(w, h, kernels):
    cfg = RenderConfig(width=w, height=h, spp=1, max_bounces=5,
                       kernels=kernels)
    scene = build_demo_scene(w, h)
    arrays = pack_scene(scene, cfg)
    cam = {k: jax.numpy.asarray(v)
           for k, v in scene.camera.device_params().items()}
    img = jax.jit(lambda a, c: render_radiance(a, c, cfg))(arrays, cam)
    return np.asarray(img).astype(np.float32)


def neighbor_fraction(mask):
    """Of the masked pixels, what fraction has a masked 4-neighbor? ~0 for
    salt-and-pepper (stochastic flips), ~1 for connected regions (bugs)."""
    if mask.sum() == 0:
        return 0.0
    n = np.zeros_like(mask)
    n[1:, :] |= mask[:-1, :]
    n[:-1, :] |= mask[1:, :]
    n[:, 1:] |= mask[:, :-1]
    n[:, :-1] |= mask[:, 1:]
    return float((mask & n).sum() / mask.sum())


def analyze(name, a, b, out):
    d = np.abs(a - b).max(axis=-1)  # (H, W)
    s = ssim(a, b)
    lines = [f"== {name}: SSIM {s:.4f}, mean|d| {d.mean():.2e}, "
             f"p99 {np.percentile(d, 99):.3e}, max {d.max():.3f}"]
    total = d.size
    for th in THRESHOLDS:
        m = d > th
        frac = m.sum() / total
        lines.append(
            f"   |d| > {th:7g}: {m.sum():7d} px ({100 * frac:6.3f}%)"
            f"  neighbor-frac {neighbor_fraction(m):.2f}")
    big = d > 0.1
    lines.append(
        f"   classification: {100 * (1 - (d > 1e-2).mean()):.2f}% of pixels "
        f"within 1e-2 (systematic rounding); {big.sum()} px > 0.1 "
        f"({'salt-and-pepper -> stochastic branch flips' if neighbor_fraction(big) < 0.5 else 'CONNECTED REGIONS -> investigate as a bug'})")
    txt = "\n".join(lines)
    print(txt)
    out.append(txt)
    return d, s


def main():
    setup_compile_cache(os.path.join(HERE, ".rayzen_cache", "xla"))
    os.makedirs(OUT_DIR, exist_ok=True)
    out, raw = [], {}

    # PARITY_SMOKE=1: tiny size, golden = the XLA render itself — exercises
    # every code path (both renders, analysis, txt/npz writes) on CPU in
    # minutes so the real run can't crash on the chip (VERDICT r4 next #2)
    smoke = os.environ.get("PARITY_SMOKE") == "1"
    cases = ([((64, 48), None)] if smoke else
             [((256, 192), "demo_256x192.npz"),
              ((800, 600), "demo_reference_800x600.npz")])
    for (w, h), gold_name in cases:
        if gold_name is None:
            golden = render(w, h, "xla")
        else:
            golden = np.load(os.path.join(
                HERE, "tests", "golden", gold_name))["image"].astype(np.float32)
        tpu_pallas = render(w, h, "pallas")
        d, s = analyze(f"{w}x{h} TPU-pallas vs CPU-golden",
                       tpu_pallas, golden, out)
        raw[f"diff_pallas_{w}x{h}"] = d

        # the separating experiment: XLA path on the SAME device
        tpu_xla = render(w, h, "xla")
        d2, s2 = analyze(f"{w}x{h} TPU-xla vs CPU-golden", tpu_xla, golden,
                         out)
        raw[f"diff_xla_{w}x{h}"] = d2
        d3, s3 = analyze(f"{w}x{h} TPU-pallas vs TPU-xla (same device)",
                         tpu_pallas, tpu_xla, out)
        raw[f"diff_pallas_vs_xla_{w}x{h}"] = d3
        out.append(
            f"-> attribution at {w}x{h}: device-semantics share "
            f"(xla-on-TPU vs golden) SSIM {s2:.4f}; kernel-reimplementation "
            f"share (pallas vs xla on TPU) SSIM {s3:.4f}\n")

    path = os.path.join(OUT_DIR, "parity_diag.txt")
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    np.savez_compressed(os.path.join(OUT_DIR, "parity_diag.npz"), **raw)
    print(f"# wrote {path}")


if __name__ == "__main__":
    main()
