"""Probe WHY pipelined interactive frames measure slower than synchronous
ones on the tunneled transport (docs/PERFORMANCE.md round-5 interactive
decision; both 1080p sessions reproduced pipelined >= sync).

Hypothesis under test: bench.py's frames-in-flight gain re-dispatches
IDENTICAL device-resident buffers, while the interactive loop ships NEW
camera parameters each frame — small host->device uploads interleaving
with in-flight dispatches serialize the tunnel.

Four modes, same jitted 1-spp render (the real frame function), N
dispatches each, hard-synced by materializing every output:

  A  identical device-resident camera, all dispatches in flight (bench mode)
  B  fresh HOST-numpy camera per dispatch, all in flight (interactive mode)
  C  fresh host camera, strictly synchronous (the interactive sync loop)
  D  distinct but PRE-STAGED device cameras (device_put before the timed
     window), all in flight — separates "upload during flight" from
     "distinct buffer identity"

Pre-registered interpretation (written before the chip run): the
serialization hypothesis is CONFIRMED if B >= 2x A per dispatch while
D ~ A (uploads are the poison, buffer identity is not); it is REFUTED if
B ~ A (the interactive slowdown lives elsewhere — e.g. in the resolve
path); "D slow too" means dispatch-argument identity itself breaks the
transport's pipelining, a narrower but still structural negative.

Smoke: TP_W/TP_H/TP_N env knobs + JAX_PLATFORMS=cpu run the whole script
tiny (tests/test_campaign_smoke.py::TestTransportProbeSmoke).
"""

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import jax

from rayzen_tpu.cache import setup_compile_cache
from rayzen_tpu.config import RenderConfig
from rayzen_tpu.demo import build_demo_scene
from rayzen_tpu.integrator import render_radiance_with_stats
from rayzen_tpu.packing import pack_scene

W = int(os.environ.get("TP_W", 1920))
H = int(os.environ.get("TP_H", 1080))
N = int(os.environ.get("TP_N", 12))

setup_compile_cache(os.path.join(HERE, ".rayzen_cache", "xla"))
cfg = RenderConfig(width=W, height=H, spp=1, max_bounces=5)
scene = build_demo_scene(W, H)
arrays = pack_scene(scene, cfg)
fn = jax.jit(lambda a, c: render_radiance_with_stats(a, c, cfg))

base = {k: np.asarray(v) for k, v in scene.camera.device_params().items()}


def perturbed(i):
    """N distinct camera payloads (tiny float nudge — timing only; the
    image is irrelevant and the nudge cannot change traversal shape)."""
    out = {}
    for k, v in base.items():
        v = np.array(v, copy=True)
        if np.issubdtype(v.dtype, np.floating):
            v.flat[0] = v.flat[0] + 1e-6 * i
        out[k] = v
    return out


def run_mode(name, cams, in_flight):
    t0 = time.perf_counter()
    if in_flight:
        results = [fn(arrays, cams[i]) for i in range(N)]
        for img, _ in results:
            np.asarray(img)
    else:
        for i in range(N):
            img, _ = fn(arrays, cams[i])
            np.asarray(img)
    wall = time.perf_counter() - t0
    ms = wall / N * 1e3
    print(f"mode {name}: {ms:8.1f} ms/dispatch  ({wall:.2f} s / {N})")
    return ms


# warmup: compile + one steady dispatch
img, _ = fn(arrays, base)
np.asarray(img)
img, _ = fn(arrays, base)
np.asarray(img)

cam_dev = jax.device_put(base)
ms_a = run_mode("A identical-device, in flight ", [cam_dev] * N, True)

host_cams = [perturbed(i) for i in range(N)]
ms_b = run_mode("B fresh-host,       in flight ", host_cams, True)

ms_c = run_mode("C fresh-host,       synchronous", host_cams, False)

dev_cams = [jax.device_put(perturbed(i + N)) for i in range(N)]
for c in dev_cams:  # force staging to finish before the timed window
    jax.block_until_ready(c)
ms_d = run_mode("D distinct-device,  in flight ", dev_cams, True)

verdict = (
    "CONFIRMED: in-flight host uploads serialize the tunnel"
    if ms_b >= 2 * ms_a and ms_d < 1.5 * ms_a else
    "REFUTED: fresh host args track identical args; slowdown lives elsewhere"
    if ms_b < 1.5 * ms_a else
    "PARTIAL: distinct dispatch arguments themselves break pipelining"
    if ms_d >= 1.5 * ms_a else
    "MIXED: see table"
)
print(f"# interpretation (pre-registered rule): {verdict}")
print(json.dumps({"probe": "transport_camera_uploads", "n": N,
                  "ms_identical_inflight": round(ms_a, 1),
                  "ms_freshhost_inflight": round(ms_b, 1),
                  "ms_freshhost_sync": round(ms_c, 1),
                  "ms_distinctdev_inflight": round(ms_d, 1),
                  "verdict": verdict.split(":")[0]}))
