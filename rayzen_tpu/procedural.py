"""Procedural mesh generators.

The reference ships two OBJ assets (an 8-vertex cube and the 968-face Blender
Suzanne; SURVEY.md repo inventory). This repo generates its demo geometry
procedurally instead so scenes and benchmarks are self-contained: a unit cube with
the same 12-triangle topology class, icospheres whose face counts bracket Suzanne's
(subdiv 3 -> 1280 tris), plus planes and tori for tests.
"""

from __future__ import annotations

import numpy as np

from .mesh import Mesh


def cube(material_index: int = 0, half_extent: float = 1.0) -> Mesh:
    """Axis-aligned cube spanning [-h, h]^3, 12 triangles (like meshes/cube.obj)."""
    h = float(half_extent)
    # 8 corners
    c = np.array(
        [
            [-h, -h, -h],
            [h, -h, -h],
            [h, h, -h],
            [-h, h, -h],
            [-h, -h, h],
            [h, -h, h],
            [h, h, h],
            [-h, h, h],
        ],
        dtype=np.float32,
    )
    # 12 triangles, outward-facing winding
    faces = np.array(
        [
            [0, 2, 1], [0, 3, 2],  # -z
            [4, 5, 6], [4, 6, 7],  # +z
            [0, 1, 5], [0, 5, 4],  # -y
            [3, 6, 2], [3, 7, 6],  # +y
            [0, 4, 7], [0, 7, 3],  # -x
            [1, 2, 6], [1, 6, 5],  # +x
        ],
        dtype=np.int64,
    )
    return Mesh.from_triangles(c[faces], material_index)


def plane(material_index: int = 0, size: float = 1.0, y: float = 0.0) -> Mesh:
    s = float(size)
    v = np.array(
        [[-s, y, -s], [s, y, -s], [s, y, s], [-s, y, s]], dtype=np.float32
    )
    faces = np.array([[0, 2, 1], [0, 3, 2]], dtype=np.int64)
    return Mesh.from_triangles(v[faces], material_index)


def icosphere(material_index: int = 0, subdivisions: int = 2, radius: float = 1.0) -> Mesh:
    """Subdivided icosahedron: 20 * 4^n faces (n=3 -> 1280, near Suzanne's 968)."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        dtype=np.float64,
    )
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = [
        (0, 11, 5), (0, 5, 1), (0, 1, 7), (0, 7, 10), (0, 10, 11),
        (1, 5, 9), (5, 11, 4), (11, 10, 2), (10, 7, 6), (7, 1, 8),
        (3, 9, 4), (3, 4, 2), (3, 2, 6), (3, 6, 8), (3, 8, 9),
        (4, 9, 5), (2, 4, 11), (6, 2, 10), (8, 6, 7), (9, 8, 1),
    ]
    verts = [tuple(v) for v in verts]
    cache = {}

    def midpoint(a, b):
        key = (a, b) if a < b else (b, a)
        if key in cache:
            return cache[key]
        m = np.asarray(verts[a]) + np.asarray(verts[b])
        m /= np.linalg.norm(m)
        verts.append(tuple(m))
        idx = len(verts) - 1
        cache[key] = idx
        return idx

    for _ in range(subdivisions):
        new_faces = []
        for a, b, c in faces:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [(a, ab, ca), (ab, b, bc), (ca, bc, c), (ab, bc, ca)]
        faces = new_faces

    v = np.asarray(verts, dtype=np.float64) * float(radius)
    f = np.asarray(faces, dtype=np.int64)
    return Mesh.from_triangles(v[f].astype(np.float32), material_index)


def torus(
    material_index: int = 0,
    major_radius: float = 1.0,
    minor_radius: float = 0.35,
    major_segments: int = 24,
    minor_segments: int = 12,
) -> Mesh:
    R, r = float(major_radius), float(minor_radius)
    u = np.linspace(0, 2 * np.pi, major_segments, endpoint=False)
    v = np.linspace(0, 2 * np.pi, minor_segments, endpoint=False)
    uu, vv = np.meshgrid(u, v, indexing="ij")
    x = (R + r * np.cos(vv)) * np.cos(uu)
    y = r * np.sin(vv)
    z = (R + r * np.cos(vv)) * np.sin(uu)
    grid = np.stack([x, y, z], axis=-1)  # (U, V, 3)

    tris = []
    for i in range(major_segments):
        for j in range(minor_segments):
            i1 = (i + 1) % major_segments
            j1 = (j + 1) % minor_segments
            a, b, c, d = grid[i, j], grid[i1, j], grid[i1, j1], grid[i, j1]
            tris.append([a, b, c])
            tris.append([a, c, d])
    return Mesh.from_triangles(np.asarray(tris, dtype=np.float32), material_index)


def blob(
    material_index: int = 0,
    subdivisions: int = 3,
    radius: float = 1.0,
    bumps: float = 0.18,
    seed: int = 7,
) -> Mesh:
    """An organic-looking deformed icosphere — stand-in for sculpted assets like
    Suzanne in the self-contained demo scene (~1280 tris at subdiv 3)."""
    base = icosphere(material_index, subdivisions, radius)
    v = base.vertices.reshape(-1, 3).astype(np.float64)
    # smooth low-frequency displacement along the normal direction
    n = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    freqs = rng.uniform(1.0, 3.0, size=(4, 3))
    phases = rng.uniform(0, 2 * np.pi, size=4)
    amp = np.zeros(v.shape[0])
    for k in range(4):
        amp += np.sin(v @ freqs[k] * 2.0 + phases[k]) / (k + 1.5)
    v = v + n * (bumps * radius) * amp[:, None] / 2.0
    return Mesh.from_triangles(
        v.reshape(-1, 3, 3).astype(np.float32), material_index
    )


def subdivide(mesh: Mesh, levels: int = 1, displace: float = 0.0) -> Mesh:
    """4-to-1 midpoint subdivision of a triangle soup (each face splits at
    its edge midpoints — shared edges get identical midpoints on both sides,
    so watertight input stays watertight). Scales any asset to an arbitrary
    triangle budget for large-scene benchmarks (the reference renders
    whatever OBJ it is given, Mesh.cpp:6-50; this is the self-contained way
    to produce one at millions of triangles). ``displace`` adds a smooth
    sine-field offset along the face normal per level so the refined surface
    is not perfectly coplanar with its parent (exercises the BVH rather than
    stacking identical planes)."""
    v = mesh.vertices.astype(np.float64)
    mats = mesh.material_index
    for lvl in range(levels):
        a, b, c = v[:, 0], v[:, 1], v[:, 2]
        ab, bc, ca = (a + b) / 2, (b + c) / 2, (c + a) / 2
        if displace:
            n = np.cross(b - a, c - a)
            n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-12)
            amp = displace / (4.0 ** lvl)
            for m in (ab, bc, ca):
                m += n * (amp * np.sin(m.sum(axis=1) * (3.0 + lvl)))[:, None]
        v = np.concatenate(
            [
                np.stack([a, ab, ca], axis=1),
                np.stack([ab, b, bc], axis=1),
                np.stack([ca, bc, c], axis=1),
                np.stack([ab, bc, ca], axis=1),
            ],
            axis=0,
        )
        mats = np.concatenate([mats] * 4, axis=0)
    return Mesh(v.astype(np.float32), mats)
