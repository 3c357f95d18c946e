"""Measure multi-pop traversal stack occupancy on real packed trees.

The multi-pop walk (ops/pallas_traverse.py body_n) pops pop_n entries per
while_loop trip and pushes each popped node's hit inner children — so the
traversal drifts breadth-first, and the working assumption that occupancy is
bounded by pop_n * (depth + 1) (ADVICE r3 / _pick_pop_n) deserves a direct
check: on a wide all-hit frontier the stack could grow with the frontier, not
the depth. This simulator replays the EXACT push/pop discipline of body_n /
node_step (top-first pop order, far-then-near push order, groupwise t-pruning
ignored => occupancy overestimate) against per-node any-ray consensus
computed from real ray packets, and reports the max stack occupancy.

An overestimate below STACK_DEPTH-2 proves the kernel clamp is dead code for
that (tree, packet) regime; an overestimate above it says nothing yet (prune
effects), but flags where to look with the on-kernel NaN-poison signal.

Usage: python scripts/occupancy_sim.py  (CPU, numpy only after packing)
"""

import os
import sys

# In-script env assignment is TOO LATE on this host: sitecustomize.py (via
# PYTHONPATH=/root/.axon_site) calls axon.register() at interpreter startup
# whenever PALLAS_AXON_POOL_IPS is set, and register() can hang on a downed
# tunnel. Re-exec into a child whose env is clean BEFORE python starts
# (the __graft_entry__.dryrun_multichip pattern).
if os.environ.get("PALLAS_AXON_POOL_IPS"):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    os.execve(sys.executable, [sys.executable, "-u", *sys.argv], env)

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rayzen_tpu.config import RenderConfig
from rayzen_tpu.demo import build_demo_scene
from rayzen_tpu.packing import pack_scene, world_geometry

STACK_DEPTH = 128


def node_consensus(inner, ox, oy, oz, ix, iy, iz):
    """any-ray slab consensus per (node, child): (N, 2) bool. No t-pruning
    (overestimates pushes => overestimates occupancy)."""
    res = np.zeros((inner.shape[0], 2), bool)
    for ch, base in ((0, 0), (1, 6)):
        bmin = inner[:, base:base + 3]          # (N, 3)
        bmax = inner[:, base + 3:base + 6]
        # (N, R) per-axis slab; broadcast nodes x rays
        t0x = (bmin[:, 0:1] - ox) * ix
        t1x = (bmax[:, 0:1] - ox) * ix
        t0y = (bmin[:, 1:2] - oy) * iy
        t1y = (bmax[:, 1:2] - oy) * iy
        t0z = (bmin[:, 2:3] - oz) * iz
        t1z = (bmax[:, 2:3] - oz) * iz
        tn = np.maximum.reduce([np.minimum(t0x, t1x), np.minimum(t0y, t1y),
                                np.minimum(t0z, t1z), np.zeros_like(t0x)])
        tf = np.minimum.reduce([np.maximum(t0x, t1x), np.maximum(t0y, t1y),
                                np.maximum(t0z, t1z)])
        res[:, ch] = (tn <= tf).any(axis=1)
    return res


def simulate(inner, cons, pop_n):
    """Replay body_n's discipline; return (max_occupancy, trips, pops)."""
    lref = inner[:, 12].astype(np.int64)
    rref = inner[:, 13].astype(np.int64)
    l_inner = inner[:, 14] < 0
    r_inner = inner[:, 15] < 0
    stack = [0]
    max_sp = 1
    trips = pops = 0
    while stack:
        trips += 1
        popped = [stack.pop() for _ in range(min(pop_n, len(stack)))]
        for node in popped:
            pops += 1
            push_l = cons[node, 0] and l_inner[node]
            push_r = cons[node, 1] and r_inner[node]
            if push_l and push_r:
                stack.append(rref[node])   # far (fixed left-near ordering)
                stack.append(lref[node])   # near on top
            elif push_l:
                stack.append(lref[node])
            elif push_r:
                stack.append(rref[node])
            max_sp = max(max_sp, len(stack))
        if trips > 10_000_000:
            raise RuntimeError("runaway")
    return max_sp, trips, pops


def run_case(name, ws, rays, pop_list=(1, 2, 4)):
    inner = np.asarray(ws.inner_table, np.float64)
    depth = int(getattr(ws, "tree_depth", 0))
    ox, oy, oz, dx, dy, dz = rays
    with np.errstate(divide="ignore"):
        ix, iy, iz = 1.0 / dx, 1.0 / dy, 1.0 / dz
    cons = node_consensus(inner, ox, oy, oz, ix, iy, iz)
    allhit = np.ones_like(cons)
    print(f"== {name}: {inner.shape[0]} inner rows, measured depth {depth}, "
          f"{ox.shape[1]} rays/packet, consensus-hit "
          f"{cons.all(axis=1).mean() * 100:.0f}% of nodes both-children")
    for pop_n in pop_list:
        occ, trips, pops = simulate(inner, cons, pop_n)
        occ_ah, _, _ = simulate(inner, allhit, pop_n)
        bound = pop_n * (depth + 1)
        flag = " **EXCEEDS STACK**" if occ > STACK_DEPTH - 2 else ""
        print(f"   pop {pop_n}: max occupancy {occ:4d} (all-hit {occ_ah:4d}) "
              f"claimed bound {bound:4d}; trips {trips}{flag}")


def packet(n, seed, spread):
    rng = np.random.RandomState(seed)
    o = rng.uniform(-spread, spread, size=(3, n))
    d = rng.normal(size=(3, n))
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    return (o[0:1], o[1:2], o[2:3], d[0:1], d[1:2], d[2:3])


def monkey_field(n_monkeys):
    """N-Suzanne field: the bench_large scene shape (single unified tree)."""
    from rayzen_tpu.mesh import Mesh
    from rayzen_tpu.scene import GameObject, Scene
    from rayzen_tpu.demo import build_demo_scene

    base = build_demo_scene(64, 48)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    monkey = Mesh.load_from_obj(
        os.path.join(here, "assets", "meshes", "monkey.obj"), 0)
    side = int(np.ceil(np.sqrt(n_monkeys)))
    objs = []
    for i in range(n_monkeys):
        t = np.eye(4, dtype=np.float32)
        t[:3, 3] = [2.2 * (i % side - side / 2), 0.0, -2.2 * (i // side)]
        objs.append(GameObject(mesh=monkey, transform=t,
                               material_override=i % 3))
    sc = Scene(camera=base.camera, materials=base.materials,
               lights=base.lights, game_objects=objs)
    return world_geometry(pack_scene(sc, RenderConfig(width=64, height=48)))


if __name__ == "__main__":
    cfg = RenderConfig(width=64, height=48)
    ws = world_geometry(pack_scene(build_demo_scene(64, 48), cfg))
    run_case("demo tree (random decorrelated packet)", ws,
             packet(4096, 0, 4.0))
    run_case("demo tree (tight random packet, spread 1)", ws,
             packet(4096, 1, 1.0))
    try:
        n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
        ws_big = monkey_field(n)
        run_case(f"{n}-monkey field (random packet)", ws_big,
                 packet(4096, 2, float(np.sqrt(n)) * 2.5))
    except Exception as e:
        print(f"big-field case skipped: {type(e).__name__}: {e}")
