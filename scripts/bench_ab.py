"""Quick A/B of kernel configurations on the 1080p demo scene (min-of-reps).

Per spec, prints one human line and one machine-readable JSON line
(scripts/ab_contract.py::format_result) — the JSON line is the stable
contract consumed by scripts/marginal_session.py
(tests/test_campaign_smoke.py pins it).
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from rayzen_tpu.cache import setup_compile_cache
from rayzen_tpu.config import RenderConfig
from rayzen_tpu.demo import build_demo_scene
from rayzen_tpu.integrator import render_radiance_with_stats

setup_compile_cache(".rayzen_cache/xla")

# RAYZEN_AB_* envs shrink the run for CPU smoke tests (defaults = the
# on-chip measurement shape; tests/test_campaign_smoke.py pins the smoke).
W = int(os.environ.get("RAYZEN_AB_W", "1920"))
H = int(os.environ.get("RAYZEN_AB_H", "1080"))
variants = sys.argv[1:] or ["pallas", "pallas-nomega"]

scene = build_demo_scene(W, H)
cam = {k: jnp.asarray(v) for k, v in scene.camera.device_params().items()}

_packs = {}


def pack_cached(scene_, cfg):
    # pack output depends only on these cfg fields — reuse across specs/spp
    key = (cfg.leaf_size, cfg.split_method, cfg.tiered, cfg.treelet_rows)
    if key not in _packs:
        from rayzen_tpu.packing import pack_scene

        _packs[key] = pack_scene(scene_, cfg)
    return _packs[key]


def timed(fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.tree_util.tree_map(lambda a: np.asarray(a), out)
    return time.perf_counter() - t0, out


for spec in variants:
    # "kern", "kern:mb" (bounce budget), "+oct" (octant bounce walks),
    # "+w8" (wide BVH8 nodes)
    base = spec
    oct_walks = "+oct" in base
    wide = "+w8" in base
    dense = "+dl" in base
    pop = 4 if "+p4" in base else (2 if "+p2" in base else 0)
    rebin = "+rebin" in base
    frus = "+fr" in base
    base = (base.replace("+oct", "").replace("+w8", "").replace("+rebin", "")
            .replace("+dl", "").replace("+p2", "").replace("+p4", "")
            .replace("+fr", ""))
    fuse = 1
    if "+f" in base:
        pre, _, fv = base.partition("+f")
        digits = ""
        while fv and fv[0].isdigit():
            digits, fv = digits + fv[0], fv[1:]
        fuse = int(digits)
        base = pre + fv  # keep any further suffixes (e.g. ":5")
    rng = "reference"
    if "+hash" in base:
        base = base.replace("+hash", "")
        rng = "threefry"
    split, split_rebin, split_every = 0, "rank", False
    if "+s" in base and not base.partition("+s")[2][:1].isalpha():
        # "+s3" split-bounce at 3 (rank order), "+s3o" octant-bucketed,
        # "+s3c" octant+origin-cell, trailing "e" = re-compact every bounce
        pre, _, sv = base.partition("+s")
        digits = ""
        while sv and sv[0].isdigit():
            digits, sv = digits + sv[0], sv[1:]
        split = int(digits)
        if sv[:1] == "o":
            split_rebin, sv = "octant", sv[1:]
        elif sv[:1] == "c":
            split_rebin, sv = "octcell", sv[1:]
        if sv[:1] == "e":
            split_every, sv = True, sv[1:]
        base = pre + sv
    leaf = 8
    if "+l" in base:
        pre, _, lv = base.partition("+l")
        digits = ""
        while lv and lv[0].isdigit():
            digits, lv = digits + lv[0], lv[1:]
        leaf = int(digits)
        base = pre + lv
    kern, _, mb = base.partition(":")
    mb = int(mb) if mb else 5

    # marginal per-sample cost: (t(spp_hi) - t(spp_lo)) / (hi - lo) cancels
    # the fixed per-dispatch transport staging. Blocks of PIPE dispatches stay
    # in flight (bench.py methodology) so staging overlaps compute; lo/hi
    # blocks are INTERLEAVED so shared-chip drift brackets both sides, and
    # each side takes its own min (contention only ever ADDS time, so the min
    # is the uncontended envelope — never difference single noisy pairs).
    lo, hi = (16, 64) if fuse <= 16 else (fuse, fuse * 4)
    if os.environ.get("RAYZEN_AB_LO"):
        lo = int(os.environ["RAYZEN_AB_LO"])
        hi = int(os.environ.get("RAYZEN_AB_HI", str(lo * 4)))
    PIPE = int(os.environ.get("RAYZEN_AB_PIPE", "3"))
    REPS = int(os.environ.get("RAYZEN_AB_REPS", "4"))
    fns = {}
    rays_per_sample = 0
    for spp in (lo, hi):
        cfg = RenderConfig(width=W, height=H, spp=spp, max_bounces=mb,
                           kernels=kern, octant_bounce_walks=oct_walks,
                           wide_nodes=wide, dense_leaves=dense,
                           leaf_size=leaf, rng=rng, sample_fuse=fuse,
                           walk_pop=pop, bounce_rebin=rebin,
                           frustum_primary=frus, split_bounce=split,
                           split_rebin=split_rebin, split_every=split_every)
        arrays = pack_cached(scene, cfg)
        fn = jax.jit(lambda a, c, cfg=cfg: render_radiance_with_stats(a, c, cfg))
        _, (_, rays) = timed(fn, arrays, cam)  # compile + warm
        fns[spp] = (fn, arrays, cam)
        rays_per_sample = int(rays) / spp

    def block(spp):  # PIPE dispatches in flight, wall per dispatch
        fn, arrays, c = fns[spp]
        t0 = time.perf_counter()
        outs = [fn(arrays, c) for _ in range(PIPE)]
        for o in outs:
            jax.tree_util.tree_map(lambda a: np.asarray(a), o)
        return (time.perf_counter() - t0) / PIPE

    t_lo, t_hi = [], []
    for _ in range(REPS):
        t_lo.append(block(lo))
        t_hi.append(block(hi))
    ms = (min(t_hi) - min(t_lo)) / (hi - lo) * 1e3
    mrays = rays_per_sample / ms / 1e3
    from ab_contract import format_result

    print(format_result(spec, ms, mrays, rays_per_sample / 1e6), flush=True)
