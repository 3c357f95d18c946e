"""Per-bounce alive-occupancy probe for the split-bounce compaction decision.

Measures, per bounce wave of a demo-scene sample, (a) the alive-ray fraction,
(b) how those alive rays distribute over megakernel packets (PACKET_ROWS x 128
rays in tile-swizzled order), and (c) the projected packet count if the wave
were compacted (alive rays made contiguous). The gap between live-packet count
and compacted-packet count bounds the win available to a split-bounce
continuation kernel (docs/PERFORMANCE.md round-3: bounce waves 3-5 are ~70% of
the frame at single-digit alive fractions).

Runs the portable XLA path on CPU (bounce-by-bounce, unrolled) with the same
sampler flow the megakernel inlines. Reference bounce semantics:
fragment_shader.glsl:695-770.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from rayzen_tpu import demo, integrator
from rayzen_tpu.config import RenderConfig
from rayzen_tpu.ops import camera_rays
from rayzen_tpu.ops.intersect import dot3
from rayzen_tpu.ops.shade import sky_color
from rayzen_tpu.ops.traverse import hit_shading_data, traverse_world
from rayzen_tpu.packing import pack_scene, world_geometry
from rayzen_tpu.ops.pallas_traverse import PACKET_ROWS


def main(width=960, height=544, samples=4):
    cfg = RenderConfig(width=width, height=height, spp=1, kernels="xla")
    scene = demo.build_demo_scene(width=width, height=height)
    arrays = pack_scene(scene, cfg)
    ws = world_geometry(arrays)
    cam = scene.camera.device_params()

    frag, uv, _inv = integrator._swizzled_grid(cfg)
    sampler = integrator._make_sampler(cfg, frag, uv, width, height, 0)
    pkt = PACKET_ROWS * 128

    @jax.jit
    def one_sample_masks(samp):
        sampler.start_sample(samp)
        jitter = sampler.camera_jitter()
        origin, direction = camera_rays.generate_rays(
            uv, jitter, cam["inv_proj"], cam["inv_view"], cam["position"]
        )
        alive = jnp.ones((uv.shape[0],), bool)
        throughput = jnp.ones((uv.shape[0], 3), jnp.float32)
        cur_ior = jnp.ones((uv.shape[0],), jnp.float32)
        masks = []
        for bounce in range(cfg.max_bounces):
            masks.append(alive)
            hit = traverse_world(ws, origin, direction, alive)
            alive = alive & hit.found
            normal, material, _ = hit_shading_data(ws, hit)
            rand_val, hemi_u, hemi_v = sampler.bounce_draws(samp, bounce)
            new_dir, factor, cur_ior = integrator._scatter(
                direction, normal, material, cur_ior, rand_val, hemi_u, hemi_v
            )
            throughput = throughput * factor
            push = jnp.where(dot3(new_dir, normal) > 0.0, 1.0, -1.0)
            origin = hit.point + normal * (push * 0.003)[:, None]
            direction = new_dir
            apply_rr = bounce > cfg.rr_start_bounce
            if apply_rr:
                p = jnp.max(throughput, axis=-1)
                alive = alive & ~(rand_val > p)
                throughput = throughput / jnp.maximum(p, 1e-12)[:, None]
        return jnp.stack(masks)

    n = uv.shape[0]
    n_pkts = (n + pkt - 1) // pkt
    print(f"{width}x{height}: {n} rays, {n_pkts} packets of {pkt}")
    print(f"{'bounce':>6} {'alive%':>7} {'livepkt%':>9} {'alive/livepkt':>13} "
          f"{'compact-pkt%':>12} {'pkt-win':>8}")
    agg = np.zeros((cfg.max_bounces, 4))
    for s in range(samples):
        masks = np.asarray(one_sample_masks(jnp.float32(s)))
        for b in range(cfg.max_bounces):
            m = masks[b]
            pm = np.pad(m, (0, n_pkts * pkt - n)).reshape(n_pkts, pkt)
            live = pm.any(axis=1)
            alive_total = m.sum()
            compact_pkts = int(np.ceil(alive_total / pkt))
            agg[b] += [alive_total, live.sum(), compact_pkts,
                       alive_total / max(live.sum(), 1)]
    agg /= samples
    for b in range(cfg.max_bounces):
        alive_total, live_pkts, compact_pkts, per_pkt = agg[b]
        win = live_pkts / max(compact_pkts, 1e-9)
        print(f"{b:>6} {100*alive_total/n:>6.2f}% {100*live_pkts/n_pkts:>8.1f}% "
              f"{per_pkt:>13.1f} {100*compact_pkts/n_pkts:>11.1f}% {win:>7.1f}x")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
