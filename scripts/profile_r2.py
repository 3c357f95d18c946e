"""Round-2 performance probes (run on the real TPU chip).

Measures, on the 1080p demo scene:
  1. sustained per-sample frame time at several bounce budgets (marginal cost
     of each bounce wave);
  2. traversal-kernel time for a coherent vs incoherent vs octant-sorted
     incoherent wave (the direct A/B for bounce-wave ray sorting);
  3. the cost of one (R, W) row-gather permutation (the sort glue);
  4. per-bounce alive-ray counts (how fast waves die).

Usage: python scripts/profile_r2.py [probe ...]   (default: all)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from rayzen_tpu.cache import setup_compile_cache
from rayzen_tpu.config import RenderConfig
from rayzen_tpu.demo import build_demo_scene
from rayzen_tpu.integrator import render_radiance_with_stats, select_kernels
from rayzen_tpu.packing import pack_scene, world_geometry

setup_compile_cache(".rayzen_cache/xla")

W, H = 1920, 1080


def sync(x):
    jax.tree_util.tree_map(lambda a: np.asarray(a), x)


def timeit(fn, *args, reps=5):
    """Min-of-reps dispatch time: the tunneled transport shows multi-hundred-ms
    contention spikes, so the minimum is the honest kernel-side number."""
    out = fn(*args)
    sync(out)  # compile + 1 warm dispatch
    out = fn(*args)
    sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def probe_bounces():
    print("== probe 1: frame time vs bounce budget (spp=8 on-device) ==")
    scene = build_demo_scene(W, H)
    spp = 8
    prev = None
    for mb in (1, 2, 3, 4, 5):
        cfg = RenderConfig(width=W, height=H, spp=spp, max_bounces=mb)
        arrays = pack_scene(scene, cfg)
        cam = {k: jnp.asarray(v) for k, v in scene.camera.device_params().items()}
        fn = jax.jit(lambda a, c, cfg=cfg: render_radiance_with_stats(a, c, cfg))
        dt, (_, rays) = timeit(fn, arrays, cam)
        ms = dt / spp * 1e3
        marg = "" if prev is None else f"  (+{ms - prev:.1f} ms marginal)"
        print(f"  bounces={mb}: {ms:7.1f} ms/sample  rays/dispatch={int(rays)}{marg}")
        prev = ms


def _bounce_like_wave(key, ws, scene, n):
    """Synthesize a realistic bounce wave: primary-hit points as origins,
    hash-random hemisphere directions around the hit normals."""
    from rayzen_tpu.ops import camera_rays
    from rayzen_tpu.ops.shade import hemisphere_direction

    cfg = RenderConfig(width=W, height=H, spp=1, max_bounces=1)
    frag, uv = camera_rays.pixel_grid(W, H)
    perm, _ = camera_rays.tile_permutation(W, H, cfg.packet_tile)
    frag, uv = frag[perm], uv[perm]
    cam = {k: jnp.asarray(v) for k, v in scene.camera.device_params().items()}
    o, d = camera_rays.generate_rays(
        uv, jnp.zeros((uv.shape[0], 2)), cam["inv_proj"], cam["inv_view"],
        cam["position"],
    )
    trace, _, trace_primary, _mega = select_kernels(cfg)
    hit = (trace_primary or trace)(ws, o, d, jnp.ones(o.shape[0], bool))
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    u = jax.random.uniform(k1, (o.shape[0],))
    v = jax.random.uniform(k2, (o.shape[0],))
    nd = hemisphere_direction(hit.normal, u, v)
    origin = hit.point + hit.normal * 0.003
    return origin[:n], nd[:n], hit.found[:n]


def _marginal(trace, ws, o, d, a, reps=(2, 26)):
    """Marginal in-jit cost of one traversal over the wave: run it K times
    inside one jit (inputs perturbed so XLA cannot CSE) and difference two K
    values — removes the ~0.3-0.6 s fixed per-dispatch transport staging."""

    def many(o, d, a, k):
        def body(i, acc):
            # bounded accumulator (hit count, not t: t includes T_FAR=1e30 and
            # would overflow to inf, poisoning the perturbed origins)
            h = trace(ws, o + acc * 1e-30 + i * 0.0, d, a)
            return acc + jnp.sum((h.tri >= 0).astype(jnp.float32))

        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    times = []
    for k in reps:
        f = jax.jit(lambda o, d, a, k=k: many(o, d, a, k))
        dt, _ = timeit(f, o, d, a, reps=4)
        times.append(dt)
    return (times[1] - times[0]) / (reps[1] - reps[0])


def probe_sorting():
    print("== probe 2: traversal kernel (in-jit marginal ms per 2M-ray wave) ==")
    cfg = RenderConfig(width=W, height=H, spp=1, max_bounces=5)
    scene = build_demo_scene(W, H)
    arrays = pack_scene(scene, cfg)
    ws = jax.jit(world_geometry)(arrays)
    trace, _, trace_primary, _mega = select_kernels(cfg)
    n = 506 * 4096  # whole packets, within the 1080p ray count

    make = jax.jit(lambda: _bounce_like_wave(0, ws, scene, n))
    origin, direction, act = make()
    sync((origin, direction, act))

    def report(tag, fn, o, d, a):
        dt = _marginal(fn, ws, o, d, a)
        print(f"  {tag:36s} {dt*1e3:7.1f} ms -> {n/dt/1e6:7.1f} Mrays/s")

    report("incoherent bounce wave (bvh2):", trace, origin, direction, act)

    octant = (
        (direction[:, 0] > 0).astype(jnp.int32)
        + 2 * (direction[:, 1] > 0).astype(jnp.int32)
        + 4 * (direction[:, 2] > 0).astype(jnp.int32)
    )
    # key: octant within groups of 8 tiles (position-preserving)
    group = jnp.arange(n, dtype=jnp.int32) // (4096 * 8)
    order = jnp.argsort(group * 8 + octant)
    report("octant in 8-tile groups (bvh2):", trace,
           origin[order], direction[order], act[order])
    report("octant in 8-tile groups (frustum):", trace_primary,
           origin[order], direction[order], act[order])

    order2 = jnp.argsort(octant * (n // 4096) + group)
    report("octant-major global (bvh2):", trace,
           origin[order2], direction[order2], act[order2])

    # finer: 16 direction bins (octant + dominant axis) in 8-tile groups
    ax = jnp.argmax(jnp.abs(direction), axis=1).astype(jnp.int32)
    fine = octant * 3 + ax
    order3 = jnp.argsort(group * 24 + fine)
    report("oct*axis in 8-tile groups (bvh2):", trace,
           origin[order3], direction[order3], act[order3])
    report("oct*axis groups (frustum):", trace_primary,
           origin[order3], direction[order3], act[order3])

    # coherent reference: primary rays
    from rayzen_tpu.ops import camera_rays
    frag, uv = camera_rays.pixel_grid(W, H)
    perm, _ = camera_rays.tile_permutation(W, H, cfg.packet_tile)
    uv = uv[perm]
    cam = {k: jnp.asarray(v) for k, v in scene.camera.device_params().items()}
    o, d = camera_rays.generate_rays(
        uv, jnp.zeros((uv.shape[0], 2)), cam["inv_proj"], cam["inv_view"],
        cam["position"],
    )
    o, d = o[:n], d[:n]
    ones = jnp.ones(n, bool)
    report("coherent primary (bvh2):", trace, o, d, ones)
    report("coherent primary (frustum):", trace_primary, o, d, ones)


def probe_gather():
    print("== probe 3: (R, W) row-gather permutation cost ==")
    n = 2048 * 1024
    for w in (8, 16):
        x = jnp.arange(n * w, dtype=jnp.float32).reshape(n, w)
        order = jax.random.permutation(jax.random.PRNGKey(0), n)
        f = jax.jit(lambda x, o: x[o])
        dt, _ = timeit(f, x, order)
        print(f"  gather f32[{n},{w}][perm]: {dt*1e3:7.2f} ms")
    # counting-sort key -> order cost (cumsum + scatter)
    octant = jax.random.randint(jax.random.PRNGKey(1), (n,), 0, 8)

    def order_of(key):
        iota = jnp.arange(n, dtype=jnp.int32)
        sort_key = key * n + iota  # stable
        return jnp.argsort(sort_key)

    f = jax.jit(order_of)
    dt, _ = timeit(f, octant)
    print(f"  argsort stable key (n={n}):  {dt*1e3:7.2f} ms")

    def counting_order(key):
        onehot = jax.nn.one_hot(key, 8, dtype=jnp.int32)  # (n, 8)
        pref = jnp.cumsum(onehot, axis=0) - onehot
        base = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                jnp.cumsum(jnp.sum(onehot, 0))[:-1]])
        pos = jnp.sum(onehot * (pref + base[None, :]), axis=1)
        return jnp.zeros(n, jnp.int32).at[pos].set(
            jnp.arange(n, dtype=jnp.int32)
        )

    f = jax.jit(counting_order)
    dt, _ = timeit(f, octant)
    print(f"  counting-sort order (8 buckets): {dt*1e3:7.2f} ms")


def probe_alive():
    print("== probe 4: per-bounce alive counts (spp=1) ==")
    cfg = RenderConfig(width=W, height=H, spp=1, max_bounces=5)
    scene = build_demo_scene(W, H)
    arrays = pack_scene(scene, cfg)
    cam = {k: jnp.asarray(v) for k, v in scene.camera.device_params().items()}
    prev_rays = 0
    for mb in (1, 2, 3, 4, 5):
        c = RenderConfig(width=W, height=H, spp=1, max_bounces=mb)
        fn = jax.jit(lambda a, cc, c=c: render_radiance_with_stats(a, cc, c))
        _, rays = fn(arrays, cam)
        rays = int(rays)
        print(f"  bounces={mb}: rays={rays}  (wave {mb}: {rays - prev_rays})")
        prev_rays = rays


PROBES = dict(bounces=probe_bounces, sorting=probe_sorting,
              gather=probe_gather, alive=probe_alive)

if __name__ == "__main__":
    names = sys.argv[1:] or list(PROBES)
    for nm in names:
        PROBES[nm]()
