"""Counted calibration of the MXU Plücker leaf-phase candidates (VERDICT r3 #3).

The round-3 walk calibration (scripts/calibrate_walk.py) pinned leaf
Möller–Trumbore VECTOR work at ~63% of a bounce-wave packet walk (~71 ns per
triangle-test over a 32x128 packet) with ILP already exhausted — and named
"edge tests as (rays,6)@(6,edges) MXU matmuls" the one unexplored design with
>1.5x headroom (docs/PERFORMANCE.md round-3). Whether that headroom is real
depends on numbers no public doc states precisely for v5e under Mosaic:

  1. what a small-k matmul actually costs in-kernel — k=16 features against
     n=128 triangle columns at m=4096 rays: does k-padding (16/128) burn time
     or pipeline away? does f32 (3x bf16 passes) kill it?
  2. what the once-per-walk relayout costs — packet state lives in (32,128)
     component tiles; the matmul needs a ray-major (4096, 16) operand, i.e. a
     lanes->sublanes reshape Mosaic may or may not lower efficiently (or at
     all — compile failure here kills the megakernel integration).
  3. what the per-visit OUTPUT cost is — reducing (4096, n) hit columns back
     into the walk's (32,128) t_best tile needs the reverse relayout.

This probe measures each in isolation with the repeat-marginal methodology
from calibrate_walk.py (reps 1 vs reps_hi inside the kernel, data-dependence
threaded so Mosaic can't hoist; the delta cancels fixed dispatch cost), plus
a VPU Möller–Trumbore baseline doing the equivalent triangle-test volume.

Decision rule (written before measuring): the MXU path is BUILT only if
  matmul_ns(4096x16x128 f32) + amortized relayout < 25 * 71 ns  (~1.8 us)
i.e. it must beat the VPU at the 25-triangles-per-column-block operating
point it needs to fill n=128. Otherwise the negative is documented in
docs/PERFORMANCE.md with this table and the design is closed.

Usage: python scripts/calibrate_mxu.py [reps_hi]  (defaults 16; needs TPU)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
import jax.experimental.pallas.tpu as pltpu

from rayzen_tpu.cache import setup_compile_cache
from rayzen_tpu.ops.pallas_traverse import _mt_broadcast

setup_compile_cache(".rayzen_cache/xla")

INTERP = os.environ.get("CAL_INTERPRET") == "1"  # CPU smoke-test mode

REPS_HI = int(sys.argv[1]) if len(sys.argv) > 1 else 16
# rays per packet (32 x 128); CAL_R shrinks it for CPU interpret smokes
R = int(os.environ.get("CAL_R", 4096))


def _time_call(jfn, args, warm=2, meas=5):
    for _ in range(warm):
        jax.tree_util.tree_map(np.asarray, jfn(*args))
    best = float("inf")
    for _ in range(meas):
        t0 = time.perf_counter()
        jax.tree_util.tree_map(np.asarray, jfn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def marginal_ns(make_fn, args, lo=1, hi=REPS_HI):
    """Per-iteration cost: (t(hi) - t(lo)) / (hi - lo)."""
    t_lo = _time_call(jax.jit(make_fn(lo)), args)
    t_hi = _time_call(jax.jit(make_fn(hi)), args)
    return (t_hi - t_lo) / (hi - lo) * 1e9


def probe_matmul(m, k, n, dtype):
    """In-kernel A(m,k) @ B(k,n) repeated with data dependence."""

    def make(reps):
        def kernel(a_ref, b_ref, out_ref):
            a = a_ref[:]
            b = b_ref[:]

            def one(i, acc):
                y = jnp.dot(a + acc * 1e-30, b,
                            preferred_element_type=jnp.float32)
                return acc + jnp.max(y) * 1e-6

            acc = jax.lax.fori_loop(0, reps, one, jnp.float32(0.0))
            out_ref[:] = jnp.full((8, 128), acc)

        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20),
            interpret=INTERP,
        )
        return lambda a, b: f(a, b)

    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.normal(size=(m, k)), dtype)
    b = jnp.asarray(rng.normal(size=(k, n)), dtype)
    return marginal_ns(make, (a, b))


def probe_relayout(n_feat=16):
    """(32,128) component tiles -> (4096, n_feat) ray-major matrix, once per
    rep (the once-per-walk transpose the megakernel integration needs)."""

    def make(reps):
        def kernel(*refs):
            tiles = [r[:] for r in refs[:n_feat]]
            out_ref = refs[n_feat]

            def one(i, acc):
                cols = [jnp.reshape(t + acc * 1e-30, (R, 1)) for t in tiles]
                a = jnp.concatenate(cols, axis=1)  # (R, n_feat)
                return acc + jnp.max(a) * 1e-6

            acc = jax.lax.fori_loop(0, reps, one, jnp.float32(0.0))
            out_ref[:] = jnp.full((8, 128), acc)

        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_feat,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20),
            interpret=INTERP,
        )
        return lambda *t: f(*t)

    rng = np.random.default_rng(4)
    tiles = tuple(jnp.asarray(rng.normal(size=(R // 128, 128)), jnp.float32)
                  for _ in range(n_feat))
    return marginal_ns(make, tiles)


def probe_back_relayout():
    """(4096, 128) matmul-output layout -> reduce over columns -> reshape the
    (4096,) result back to the walk's (32, 128) tile (the per-visit output
    path)."""

    def make(reps):
        def kernel(y_ref, out_ref):
            y = y_ref[:]

            def one(i, acc):
                tmin = jnp.min(y + acc * 1e-30, axis=1)  # (R,)
                tile = jnp.reshape(tmin, (R // 128, 128))
                return acc + jnp.max(tile) * 1e-6

            acc = jax.lax.fori_loop(0, reps, one, jnp.float32(0.0))
            out_ref[:] = jnp.full((8, 128), acc)

        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20),
            interpret=INTERP,
        )
        return lambda y: f(y)

    rng = np.random.default_rng(5)
    y = jnp.asarray(rng.normal(size=(R, 128)), jnp.float32)
    return marginal_ns(make, (y,))


def probe_composite(n_tris=25):
    """The full candidate MXU leaf visit, end to end: Y = A(R,16) @ G(16,128)
    -> lane rolls to align each triangle's [e1 e2 e3 den num] column group ->
    sign-consistency + t window -> per-ray lane-min -> reshape back to the
    walk's (rows,128) t_best tile -> masked update. This is the number that
    competes with the VPU baseline for the same n_tris; everything the
    integration would pay per visit is in the loop."""

    def make(reps):
        def kernel(a_ref, g_ref, mask_ref, out_ref):
            a = a_ref[:]
            g = g_ref[:]
            mask = mask_ref[:] > 0.5  # (R//128? no: (8,128)) -> broadcast rows

            def one(i, carry):
                acc, tbest = carry
                y = jnp.dot(a + acc * 1e-30, g,
                            preferred_element_type=jnp.float32)
                # rotate-left by k == roll by (lanes - k); pltpu.roll
                # requires a non-negative shift
                y2 = pltpu.roll(y, 128 - 1, 1)
                y3 = pltpu.roll(y, 128 - 2, 1)
                den = pltpu.roll(y, 128 - 3, 1)
                num = pltpu.roll(y, 128 - 4, 1)
                e = jnp.float32(1e-7)
                pos = (y >= -e) & (y2 >= -e) & (y3 >= -e)
                neg = (y <= e) & (y2 <= e) & (y3 <= e)
                t = num / den
                ok = ((pos | neg) & (jnp.abs(den) > 1e-12)
                      & (t > 1e-4) & mask[:1, :])
                tc = jnp.where(ok, t, 1e30)
                tmin = jnp.min(tc, axis=1)  # (R,)
                tile = jnp.reshape(tmin, (R // 128, 128))
                improved = tile < tbest
                tbest = jnp.where(improved, tile, tbest)
                return acc + jnp.min(tbest) * 1e-6, tbest

            acc, tbest = jax.lax.fori_loop(
                0, reps, one,
                (jnp.float32(0.0), jnp.full((R // 128, 128), 1e30)))
            out_ref[:] = jnp.full((8, 128), acc + jnp.min(tbest))

        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20),
            interpret=INTERP,
        )
        return lambda *t: f(*t)

    rng = np.random.default_rng(8)
    a = jnp.asarray(rng.normal(size=(R, 16)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(16, 128)), jnp.float32)
    mask_np = np.zeros((8, 128), np.float32)
    mask_np[:, [5 * j for j in range(n_tris)]] = 1.0
    mask = jnp.asarray(mask_np)
    return marginal_ns(make, (a, g, mask)), n_tris


def probe_vpu_mt(n_tris=25):
    """Baseline: n_tris sequential Möller–Trumbore broadcasts on (32,128)
    tiles — the production leaf phase's cost for the same test volume."""

    def make(reps):
        def kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                   tri_ref, out_ref):
            ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
            dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
            trow = tri_ref[:]

            def one(i, acc):
                t_best = jnp.full((R // 128, 128), 1e30) + acc * 1e-30
                for k in range(n_tris):
                    tri = [trow[0, 9 * k + c] for c in range(9)]
                    t, h = _mt_broadcast(ox, oy, oz, dx, dy, dz, tri)
                    t_best = jnp.where(h & (t < t_best), t, t_best)
                return acc + jnp.min(t_best) * 1e-6

            acc = jax.lax.fori_loop(0, reps, one, jnp.float32(0.0))
            out_ref[:] = jnp.full((8, 128), acc)

        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20),
            interpret=INTERP,
        )
        return lambda *a: f(*a)

    rng = np.random.default_rng(6)
    rays = tuple(jnp.asarray(rng.normal(size=(R // 128, 128)), jnp.float32)
                 for _ in range(6))
    tris = jnp.asarray(rng.normal(size=(8, max(9 * n_tris, 128))), jnp.float32)
    return marginal_ns(make, rays + (tris,)), n_tris


def main():
    dev = jax.devices()[0]
    print(f"# device: {dev.device_kind}; reps marginal 1 vs {REPS_HI}")
    rows = []

    mt_ns, n_tris = probe_vpu_mt()
    rows.append((f"vpu_mt x{n_tris} (32,128) tiles", mt_ns,
                 mt_ns / n_tris))
    print(f"vpu_mt x{n_tris}: {mt_ns:8.0f} ns/iter  "
          f"({mt_ns / n_tris:5.1f} ns per tri-test/packet)")

    for label, (m, k, n, dt) in {
        "mxu 4096x16x128 f32": (R, 16, 128, jnp.float32),
        "mxu 4096x16x128 bf16": (R, 16, 128, jnp.bfloat16),
        "mxu 4096x8x128 f32": (R, 8, 128, jnp.float32),
        "mxu 4096x16x256 f32": (R, 16, 256, jnp.float32),
        "mxu 4096x128x128 f32 (dense ref)": (R, 128, 128, jnp.float32),
        "mxu 4096x8x48 f32 (leaf_k=8 shape)": (R, 8, 48, jnp.float32),
    }.items():
        try:
            ns = probe_matmul(m, k, n, dt)
            # 5 columns per triangle (3 edge signs + t_num + t_den)
            per_test = ns / (n / 5)
            rows.append((label, ns, per_test))
            print(f"{label}: {ns:8.0f} ns/matmul  "
                  f"({per_test:5.1f} ns per tri-test/packet at 5 cols/tri)")
        except Exception as e:  # compile failure is itself a result
            rows.append((label, None, None))
            print(f"{label}: FAILED — {type(e).__name__}: {str(e)[:200]}")

    try:
        comp_ns, comp_tris = probe_composite()
        rows.append((f"composite MXU visit x{comp_tris} tris", comp_ns,
                     comp_ns / comp_tris))
        print(f"composite MXU visit x{comp_tris}: {comp_ns:8.0f} ns/visit  "
              f"({comp_ns / comp_tris:5.1f} ns per tri-test/packet) "
              f"vs VPU {mt_ns:.0f}")
    except Exception as e:
        rows.append(("composite", None, None))
        print(f"composite MXU visit: FAILED — {type(e).__name__}: "
              f"{str(e)[:200]}")

    for label, fn in {
        "relayout 16x(32,128)->(4096,16)": lambda: probe_relayout(16),
        "back-relayout (4096,128)->min->(32,128)": probe_back_relayout,
    }.items():
        try:
            ns = fn()
            rows.append((label, ns, None))
            print(f"{label}: {ns:8.0f} ns/iter")
        except Exception as e:
            rows.append((label, None, None))
            print(f"{label}: FAILED — {type(e).__name__}: {str(e)[:200]}")

    # decision line (rule stated in the module docstring) — the composite
    # probe (everything a real visit pays) is the deciding number; the raw
    # matmul shape probes attribute WHERE the time goes
    mt_row = rows[0]
    comp = next((r for r in rows if r[0].startswith("composite")), None)
    relay = next((r for r in rows if r[0].startswith("relayout")), None)
    if comp and comp[1] is not None:
        budget = 25 * (mt_row[1] / n_tris)
        verdict = "BUILD" if comp[1] < budget else "CLOSE (documented negative)"
        print(f"# decision: composite visit {comp[1]:.0f} ns vs VPU budget "
              f"{budget:.0f} ns for 25 tris -> {verdict}"
              + (f"; relayout {relay[1]:.0f} ns/walk amortized"
                 if relay and relay[1] is not None else ""))


if __name__ == "__main__":
    main()
