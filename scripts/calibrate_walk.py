"""Ground-truth calibration of the BVH2 packet walk: iterations AND ns/iter.

Two open questions block further megakernel optimization (docs/PERFORMANCE.md
round-3): (1) how many while_loop iterations does a bounce-wave packet really
execute (is the consensus union saturated at ~tree size?), and (2) what does
one iteration cost (vector-op bound vs per-iteration overhead bound)? This
script answers both with a script-local COUNTING clone of the exact
bvh2_walk_closest body (rayzen_tpu/ops/pallas_traverse.py) run on:

  - primary-style rays (one screen tile through the demo camera), and
  - bounce-style rays (origins on scene surfaces, cosine-ish directions) —
    the decorrelated load that dominates frame time.

Outputs per ray class: iterations/packet, wall ns/iteration (marginal over a
repeat-factor sweep so fixed dispatch cost cancels).

Usage: python scripts/calibrate_walk.py [reps_hi] [--json PATH]

--json writes the one-shot numbers (iters/packet, ns/iter, component
marginals) to a committed JSON so future kernel changes show their cost-
structure delta instead of only end-to-end ms (VERDICT r3 #9).
"""

import json
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
from rayzen_tpu.config import RenderConfig
from rayzen_tpu.demo import build_demo_scene
from rayzen_tpu.packing import pack_scene, world_geometry
from rayzen_tpu.ops.pallas_traverse import (
    PACKET_ROWS, STACK_DEPTH, _consensus2, _mt_broadcast, _safe_inv, _slab,
    _update_attrs,
)

setup_compile_cache(".rayzen_cache/xla")

_args = [a for a in sys.argv[1:] if not a.startswith("--")]
REPS_HI = int(_args[0]) if _args else 8
JSON_PATH = None
if "--json" in sys.argv:
    JSON_PATH = sys.argv[sys.argv.index("--json") + 1]

# CPU smoke-test hooks (same convention as calibrate_mxu.py): CAL_INTERPRET=1
# runs the Pallas probes in interpreter mode; CAL_PACKETS shrinks the ray
# count; CAL_VARIANTS limits the probe list. Defaults = the on-chip run.
INTERP = os.environ.get("CAL_INTERPRET") == "1"
CAL_PACKETS = int(os.environ.get("CAL_PACKETS", "16"))
CAL_VARIANTS = os.environ.get("CAL_VARIANTS", "").split(",") \
    if os.environ.get("CAL_VARIANTS") else None


def counting_walk(inner_ref, leaf_ref, stack_ref, leaf_k,
                  ox, oy, oz, dx, dy, dz, act, variant="full"):
    """bvh2_walk_closest with an iteration counter and a leaf-visit counter
    carried through the loop (everything else identical to the production
    body so the measured cost is the real cost).

    ``variant`` isolates per-iteration component costs:
      full     — the production body
      +red     — one extra (redundant) packed consensus reduction per
                 iteration, folded into the counter so it can't be DCE'd;
                 ns/iter delta vs full = marginal reduction cost
      +slab    — one extra child slab test per iteration (same trick)
      +fetch   — one extra inner-row fetch per iteration (same trick)
      leafless — leaf branches skipped entirely (no MT, no leaf conds);
                 NOTE t never tightens so iteration counts inflate — compare
                 its own ns/iter, not walk time"""
    ix, iy, iz = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)
    t0 = jnp.full(ox.shape, 1e30, jnp.float32)
    tri0 = jnp.full(ox.shape, -1, jnp.int32)
    nx0 = ny0 = nz0 = me0 = jnp.zeros(ox.shape, jnp.float32)
    stack_ref[0] = jnp.int32(0)

    def leaf_proc(leaf_idx, hitmask, t_best, tri_best, nx, ny, nz, menc):
        lrow = leaf_ref[pl.ds(leaf_idx, 1), :]
        first = lrow[0, 10 * leaf_k].astype(jnp.int32)
        count = lrow[0, 10 * leaf_k + 1].astype(jnp.int32)
        for k in range(leaf_k):
            tri = [lrow[0, 9 * k + c] for c in range(9)]
            t, h = _mt_broadcast(ox, oy, oz, dx, dy, dz, tri)
            better = hitmask & h & (t < t_best) & (count > k)
            t_best = jnp.where(better, t, t_best)
            tri_best = jnp.where(better, first + k, tri_best)
            nx, ny, nz, menc = _update_attrs(
                better, tri, lrow[0, 10 * leaf_k + 2 + k], nx, ny, nz, menc
            )
        return t_best, tri_best, nx, ny, nz, menc

    def cond(c):
        return c[0] > 0

    def body(c):
        sp, iters, leafs, t_best, tri_best, nx, ny, nz, menc = c
        iters = iters + 1
        sp = sp - 1
        node = stack_ref[sp]
        row = inner_ref[pl.ds(node, 1), :]
        tminl, boxl = _slab(ox, oy, oz, ix, iy, iz,
                            row[0, 0], row[0, 1], row[0, 2],
                            row[0, 3], row[0, 4], row[0, 5])
        tminr, boxr = _slab(ox, oy, oz, ix, iy, iz,
                            row[0, 6], row[0, 7], row[0, 8],
                            row[0, 9], row[0, 10], row[0, 11])
        hitl = boxl & act & (tminl <= t_best)
        hitr = boxr & act & (tminr <= t_best)
        lref = row[0, 12].astype(jnp.int32)
        rref = row[0, 13].astype(jnp.int32)
        lcnt = row[0, 14].astype(jnp.int32)
        rcnt = row[0, 15].astype(jnp.int32)
        any_l, any_r = _consensus2(hitl, hitr)
        if variant == "+red":
            xl, xr = _consensus2(boxl, boxr)
            # consume via a scratch write Mosaic cannot DCE (slot never popped)
            stack_ref[STACK_DEPTH - 1] = (xl & xr).astype(jnp.int32)
        elif variant == "+slab":
            tminx, boxx = _slab(ox, oy, oz, ix, iy, iz,
                                row[0, 3], row[0, 4], row[0, 5],
                                row[0, 0], row[0, 1], row[0, 2])
            # consume via the existing consensus operands (no extra reduction)
            hitl = hitl & (tminx > -1e30)
        elif variant == "+fetch":
            row2 = inner_ref[pl.ds(jnp.maximum(node - 1, 0), 1), :]
            stack_ref[STACK_DEPTH - 1] = row2[0, 12].astype(jnp.int32)
        elif variant == "+mt":
            # one extra Moller-Trumbore test per iteration (inner row floats
            # as fake triangle data) — the per-triangle marginal in context
            tfk, hfk = _mt_broadcast(
                ox, oy, oz, dx, dy, dz, [row[0, c] for c in range(9)]
            )
            hitl = hitl & ((tfk > -1e30) | ~hfk)
        elif variant == "+div8":
            # eight extra f32 divisions (what one leaf visit's MT pays in
            # reciprocals) — if large, a division-free MT is worth building
            acc = tminl
            for kk in range(8):
                acc = 1.0 / (jnp.abs(acc) + jnp.float32(1.5 + kk))
            hitl = hitl & (acc > -1e30)
        l_leaf = lcnt >= 0
        r_leaf = rcnt >= 0
        hit_leaf_l = any_l & l_leaf
        hit_leaf_r = any_r & r_leaf

        def leaves(tt):
            lf, tt = tt
            tt = jax.lax.cond(
                hit_leaf_l, lambda uu: leaf_proc(lref, hitl, *uu),
                lambda uu: uu, tt,
            )
            tt = jax.lax.cond(
                hit_leaf_r, lambda uu: leaf_proc(rref, hitr, *uu),
                lambda uu: uu, tt,
            )
            return (lf + hit_leaf_l.astype(jnp.int32)
                    + hit_leaf_r.astype(jnp.int32), tt)

        if variant == "+imp":
            # count IMPROVING leaf visits (any ray's t tightened) vs total:
            # the consensus-skip rate available to an MXU prefilter leaf
            # phase (calibrate_mxu.py) — if most visits improve nothing, a
            # cheap MXU test + conditional VPU attrs pass can skip them.
            # Reuses the leafs counter sign convention: the probe reports
            # leaf visits; here leafs counts only visits that improved.
            t_before = t_best
            _, (t_best, tri_best, nx, ny, nz, menc) = jax.lax.cond(
                hit_leaf_l | hit_leaf_r, leaves, lambda tt: tt,
                (leafs, (t_best, tri_best, nx, ny, nz, menc)),
            )
            improved = jnp.any(t_best < t_before)
            leafs = leafs + improved.astype(jnp.int32)
        elif variant != "leafless":
            leafs, (t_best, tri_best, nx, ny, nz, menc) = jax.lax.cond(
                hit_leaf_l | hit_leaf_r, leaves, lambda tt: tt,
                (leafs, (t_best, tri_best, nx, ny, nz, menc)),
            )

        push_l = any_l & jnp.logical_not(l_leaf)
        push_r = any_r & jnp.logical_not(r_leaf)
        both = push_l & push_r
        v0 = jnp.where(both, rref, jnp.where(push_l, lref, rref))
        stack_ref[sp] = v0
        stack_ref[sp + 1] = lref
        sp = sp + push_l.astype(jnp.int32) + push_r.astype(jnp.int32)
        return sp, iters, leafs, t_best, tri_best, nx, ny, nz, menc

    out = jax.lax.while_loop(
        cond, body,
        (jnp.int32(1), jnp.int32(0), jnp.int32(0),
         t0, tri0, nx0, ny0, nz0, me0),
    )
    return out[1], out[2], out[3]  # iters, leaf visits, t_best


def make_probe(leaf_k: int, reps: int, variant: str = "full"):
    """Kernel: run the counting walk ``reps`` times on the same packet
    (carrying t through so Mosaic cannot dead-code it); write iteration and
    leaf counts + a t checksum."""

    def kernel(inner_ref, leaf_ref, ox_ref, oy_ref, oz_ref,
               dx_ref, dy_ref, dz_ref, it_ref, lf_ref, chk_ref, stack_ref):
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        act = jnp.ones(ox.shape, bool)

        def one(r, carry):
            acc, it_acc, lf_acc = carry
            # nudge the origin by a checksum-derived epsilon so every rep is a
            # fresh, data-dependent walk (no loop-invariant hoisting)
            eps = acc * 1e-30
            iters, leafs, t = counting_walk(
                inner_ref, leaf_ref, stack_ref, leaf_k,
                ox + eps, oy, oz, dx, dy, dz, act, variant=variant)
            return (jnp.sum(t * 0.0) + jnp.max(jnp.where(t < 1e29, t, 0.0)),
                    it_acc + iters, lf_acc + leafs)

        chk, iters, leafs = jax.lax.fori_loop(
            0, reps, one, (jnp.float32(0.0), jnp.int32(0), jnp.int32(0)))
        # Mosaic requires >= (8, 128) blocks: broadcast the per-packet scalars
        it_ref[:] = jnp.full((8, 128), iters.astype(jnp.float32))
        lf_ref[:] = jnp.full((8, 128), leafs.astype(jnp.float32))
        chk_ref[:] = jnp.full((8, 128), chk)

    return kernel


def run_probe(ws, rays, reps, variant="full"):
    rows = PACKET_ROWS
    n_pack = rays[0].shape[0] // rows
    grid = (n_pack,)
    ray_spec = pl.BlockSpec((rows, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_scalar = pl.BlockSpec((8, 128), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    kernel = make_probe(ws.leaf_k, reps, variant)
    fn = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(jax.ShapeDtypeStruct((n_pack * 8, 128), jnp.float32),
                   jax.ShapeDtypeStruct((n_pack * 8, 128), jnp.float32),
                   jax.ShapeDtypeStruct((n_pack * 8, 128), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
        + [ray_spec] * 6,
        out_specs=(out_scalar, out_scalar, out_scalar),
        scratch_shapes=[pltpu.SMEM((STACK_DEPTH,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
        interpret=INTERP,
    )
    jfn = jax.jit(lambda it, lt, *r: fn(it, lt, *r))
    args = (ws.inner_table, ws.leaf_table, *rays)
    out = jfn(*args)
    jax.tree_util.tree_map(lambda a: np.asarray(a), out)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        out = jfn(*args)
        jax.tree_util.tree_map(lambda a: np.asarray(a), out)
        best = min(best, time.perf_counter() - t0)
    it = np.asarray(out[0])[::8, 0].sum()
    lf = np.asarray(out[1])[::8, 0].sum()
    return best, it, lf


def tiles_of(v, n):
    return jnp.asarray(v.reshape(n // 128, 128), jnp.float32)


def main():
    W, H = 1920, 1080
    cfg = RenderConfig(width=W, height=H, spp=1, max_bounces=5)
    if os.environ.get("RAYZEN_CAL_SCENE") == "mesh500k":
        # the dense-surface large scene (bench_large +mesh): does the
        # 84k-inner-row tree change ns/iter (table-size effect) or only
        # iterations (union effect)?
        from rayzen_tpu.camera import Camera
        from rayzen_tpu.demo import ASSET_DIR
        from rayzen_tpu.mesh import Mesh
        from rayzen_tpu.procedural import subdivide
        from rayzen_tpu.scene import GameObject, Scene
        from rayzen_tpu.transforms import translation

        monkey = Mesh.load_from_obj(
            os.path.join(ASSET_DIR, "monkey.obj"), 0)
        dense = subdivide(monkey, 4, displace=0.01)
        from rayzen_tpu.light import Light
        from rayzen_tpu.material import Material

        scene = Scene(
            camera=Camera(position=np.array([0.0, 0.4, 3.4], np.float32),
                          target=np.array([0.0, -0.08, -0.99], np.float32),
                          aspect_ratio=W / H),
            materials=[Material(albedo=(0.8, 0.8, 0.8), metallic=0.1,
                                roughness=0.5)],
            lights=[Light(position_or_direction=(5.0, 10.0, 5.0, 1.0))],
            game_objects=[
                GameObject(mesh=dense, transform=translation((-1.25, 0, 0))),
                GameObject(mesh=dense, transform=translation((1.25, 0, 0))),
            ],
        )
    else:
        scene = build_demo_scene(W, H)
    arrays = pack_scene(scene, cfg)
    ws = world_geometry(arrays)
    ws = jax.tree_util.tree_map(
        lambda a: a if not hasattr(a, "block_until_ready") else a, ws)

    n_pack_rays = PACKET_ROWS * 128
    N = CAL_PACKETS * n_pack_rays  # default 16 packets

    rng = np.random.default_rng(7)
    # ---- bounce-style rays: origins on surfaces, random directions
    v0 = np.asarray(arrays.tri_v0)
    e1 = np.asarray(arrays.tri_e1)
    e2 = np.asarray(arrays.tri_e2)
    ti = rng.integers(0, v0.shape[0], N)
    u = rng.random((N, 1)).astype(np.float32)
    v = rng.random((N, 1)).astype(np.float32)
    over = (u + v) > 1.0
    u = np.where(over, 1.0 - u, u)
    v = np.where(over, 1.0 - v, v)
    orig = v0[ti] + u * e1[ti] + v * e2[ti]
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    orig = orig + d * 1e-3
    bounce_rays = tuple(
        tiles_of(a, N) for a in
        (orig[:, 0], orig[:, 1], orig[:, 2], d[:, 0], d[:, 1], d[:, 2])
    )

    # ---- primary-style rays: contiguous screen pixels through the camera
    from rayzen_tpu.ops import camera_rays
    frag, uv = camera_rays.pixel_grid(W, H)
    p = scene.camera.device_params()
    o_p, d_p = camera_rays.generate_rays(
        jnp.asarray(uv[:N]), jnp.zeros((N, 2), jnp.float32),
        jnp.asarray(p["inv_proj"]), jnp.asarray(p["inv_view"]),
        jnp.asarray(p["position"]))
    o_p, d_p = np.asarray(o_p), np.asarray(d_p)
    primary_rays = tuple(
        tiles_of(a, N) for a in
        (o_p[:, 0], o_p[:, 1], o_p[:, 2], d_p[:, 0], d_p[:, 1], d_p[:, 2])
    )

    n_inner = int(ws.inner_table.shape[0])
    print(f"# tree: {n_inner} inner rows, {ws.leaf_table.shape[0]} leaf rows,"
          f" leaf_k={ws.leaf_k}; {N // n_pack_rays} packets x "
          f"{PACKET_ROWS}x128 rays; reps 1 vs {REPS_HI}")
    jobs = [("primary", primary_rays, "full")] + [
        ("bounce", bounce_rays, v)
        for v in ("full", "+red", "+slab", "+fetch", "+mt", "+div8",
                  "+imp", "leafless")
    ]
    if CAL_VARIANTS is not None:
        jobs = [j for j in jobs if j[2] in CAL_VARIANTS]
    records = []
    for label, rays, variant in jobs:
        t1, it1, lf1 = run_probe(ws, rays, 1, variant)
        tH, itH, lfH = run_probe(ws, rays, REPS_HI, variant)
        d_iters = itH - it1
        d_t = tH - t1
        packs = N // n_pack_rays
        print(f"{label:8s} {variant:9s} iters/packet {it1 / packs:7.1f} "
              f"({it1 / packs / n_inner * 100:5.1f}% of tree) "
              f"leaf-visits/packet {lf1 / packs:7.1f}  "
              f"marginal {d_t / d_iters * 1e9:7.1f} ns/iter  "
              f"(walk {d_t / (REPS_HI - 1) / packs * 1e6:7.1f} us/packet)")
        records.append({
            "load": label, "variant": variant,
            # float() casts: it1/lf1 are numpy scalars, which round() keeps
            # as np.float32 — not JSON serializable (caught by the CPU smoke)
            "iters_per_packet": round(float(it1) / packs, 1),
            "tree_fraction_pct": round(float(it1) / packs / n_inner * 100, 1),
            "leaf_visits_per_packet": round(float(lf1) / packs, 1),
            "ns_per_iter": round(float(d_t / d_iters) * 1e9, 1),
            "us_per_packet_walk": round(
                float(d_t) / (REPS_HI - 1) / packs * 1e6, 1),
        })
    if JSON_PATH:
        payload = {
            "device": jax.devices()[0].device_kind,
            "tree": {"inner_rows": n_inner,
                     "leaf_rows": int(ws.leaf_table.shape[0]),
                     "leaf_k": int(ws.leaf_k)},
            "packets": N // n_pack_rays,
            "reps_hi": REPS_HI,
            "probes": records,
        }
        os.makedirs(os.path.dirname(JSON_PATH) or ".", exist_ok=True)
        with open(JSON_PATH, "w") as f:
            json.dump(payload, f, indent=1)
        print(f"# wrote {JSON_PATH}")


if __name__ == "__main__":
    main()
