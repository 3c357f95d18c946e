"""Batched device-rate pass: K scripted frames per dispatch (VERDICT r4 #7
follow-on; docs/INTERACTIVE_1080p.md "device-rate pass").

The round-5 device-rate record (24 moving frames in flight, single readback)
sustains 149 ms/frame at 1080p — but the renderer's device compute per 1-spp
frame is ~40 ms (bench.py's 64-spp dispatches measure 27–47 ms per 1-spp
frame equivalent), so ~100 ms/frame of the device-rate number is still the
tunneled transport's per-dispatch serial staging, which a directly-attached
chip (the reference's vsync'd GLFW loop, main.cpp:637-654) does not pay.

Renderer.render_batch amortizes that staging K-fold by scanning K stacked
camera param sets inside ONE jitted program (frames semantically identical
to the sync loop's — CPU parity test pins this). This script measures the
same 24-frame fly-through three ways on the chip:

  A. K=1  — one dispatch per frame, frames in flight (reproduces the 149)
  B. K=6  — 4 batched dispatches in flight
  C. K=12 — 2 batched dispatches in flight

and gates B/C against a sync render at the same final camera before any
number is reported. Larger K → per-frame rate asymptotes to pure dispatch +
device compute: the directly-attached frame rate estimate this transport
can actually demonstrate. Writes results to RESULT_OUT (default
results/r5/devrate_batched.txt).

CPU-smokeable end to end: ISESS_W/H shrink the frame, DEVRATE_FRAMES the
fly-through (tests/test_campaign_smoke.py runs W=64 H=48 FRAMES=4).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rayzen_tpu.cache import setup_compile_cache
from rayzen_tpu.config import RenderConfig
from rayzen_tpu.demo import build_demo_scene
from rayzen_tpu.renderer import Renderer, stack_camera_params

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
setup_compile_cache(os.path.join(HERE, ".rayzen_cache", "xla"))

W = int(os.environ.get("ISESS_W", 1920))
H = int(os.environ.get("ISESS_H", 1080))
N = int(os.environ.get("DEVRATE_FRAMES", 24))
OUT = os.environ.get(
    "RESULT_OUT", os.path.join(HERE, "results", "r5", "devrate_batched.txt"))

cfg = RenderConfig(
    width=W, height=H, spp=1, max_bounces=5,
    show_fps_overlay=True, debug_show_lights=True,
    cache_dir=os.environ.get(
        "ISESS_CACHE", os.path.join(HERE, ".rayzen_cache")),
)
scene = build_demo_scene(W, H)
r = Renderer(scene, cfg, async_compile=False)
r.warmup(2)

# the device-rate motion script (scripts/interactive_1080p.py), pre-applied
# so every pass renders the identical camera trajectory
_MOVES = [
    ("move_forward", 0.05), ("rotate", (5.0, 0.0)),
    ("move_right", 0.05), ("rotate", (-5.0, 0.0)),
]
cams = []
for i in range(N):
    op, arg = _MOVES[i % len(_MOVES)]
    if op == "rotate":
        scene.camera.rotate(*arg)
    else:
        getattr(scene.camera, op)(arg)
    cams.append({k: np.asarray(v)
                 for k, v in scene.camera.device_params().items()})

lines = [f"# batched device-rate, {W}x{H} 1 spp 5 bounces, {N}-frame "
         f"fly-through, overlays on"]
results = {}


# Pass A uses the captured cam dicts directly through the jitted program so
# the trajectory is bit-identical to the batches (camera attribute replay
# would re-derive matrices). One dispatch per frame, all in flight.
import jax.numpy as jnp

fps_pin = float(r.profiler.fps_ema or 0.0)
ops, flags = r._overlay_operands()


def dispatch_one(cam):
    return r._render_full_overlay(
        r._trace_arrays,
        {k: jnp.asarray(v) for k, v in cam.items()},
        jnp.uint32(0), *ops, jnp.float32(fps_pin), **flags,
    )


dispatch_one(cams[0])[0].block_until_ready()  # compile outside the timing
t0 = time.perf_counter()
outs = [dispatch_one(c) for c in cams]
last_a, rays_a = outs[-1]
last_a = np.asarray(last_a)
ms_a = (time.perf_counter() - t0) / N * 1e3
results["k1_ms_per_frame"] = round(ms_a, 1)
lines.append(f"A: K=1, {N} dispatches in flight, single readback: "
             f"{ms_a:.0f} ms/frame ({1e3 / ms_a:.1f} fps)")

# correctness gate for the batch program: last batched frame must equal the
# one-dispatch program's frame at the same final camera
for k in (6, 12):
    if N % k:
        continue
    d = N // k
    stacks = [stack_camera_params(cams[j * k:(j + 1) * k]) for j in range(d)]
    img, rays = r.render_batch(stacks[0], fps=fps_pin)  # compile
    img.block_until_ready()
    t0 = time.perf_counter()
    outs = [r.render_batch(s, fps=fps_pin) for s in stacks]
    last_img, _ = outs[-1]
    last = np.asarray(last_img)
    ms = (time.perf_counter() - t0) / N * 1e3
    err = float(np.max(np.abs(last - last_a)))
    gate = "PASS" if err < 1e-5 else f"FAIL (max abs {err:.2e})"
    rays_tot = int(sum(int(np.asarray(o[1])) for o in outs))
    mrays = rays_tot / (ms * N / 1e3) / 1e6
    results[f"k{k}_ms_per_frame"] = round(ms, 1)
    results[f"k{k}_gate"] = gate
    lines.append(
        f"K={k}, {d} batched dispatches in flight, single readback/batch: "
        f"{ms:.0f} ms/frame ({1e3 / ms:.1f} fps), {mrays:.1f} Mrays/s, "
        f"parity vs K=1 frame: {gate}")

results["frames"] = N
results["w"], results["h"] = W, H
results["utc"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
lines.append(json.dumps(results))
os.makedirs(os.path.dirname(OUT), exist_ok=True)
with open(OUT, "w") as f:
    f.write("\n".join(lines) + "\n")
print("\n".join(lines))
