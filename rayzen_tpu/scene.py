"""Scene graph: camera + materials + lights + game objects.

Reference: RayZen/include/Scene.h:11-19 and GameObject.h:6-10 — a Scene owns the
camera, material table, light list, and GameObjects; a GameObject is a shared mesh
plus a 4x4 transform (instancing via shared meshes).
"""

from __future__ import annotations

import dataclasses
import hashlib
from typing import List

import numpy as np

from .camera import Camera
from .light import Light
from .material import Material
from .mesh import Mesh


@dataclasses.dataclass
class GameObject:
    mesh: Mesh
    transform: np.ndarray = dataclasses.field(
        default_factory=lambda: np.eye(4, dtype=np.float32)
    )
    name: str = ""
    # Per-instance material override (-1 = use the mesh's per-triangle
    # materials). The reference re-loads a mesh per GameObject just to stamp a
    # different material on it (main.cpp:368-374); the override lets instances
    # share one Mesh (one BLAS build, one soup copy) and recolor per instance.
    material_override: int = -1

    def __post_init__(self):
        self.transform = np.asarray(self.transform, dtype=np.float32)
        assert self.transform.shape == (4, 4)


@dataclasses.dataclass
class Scene:
    camera: Camera = dataclasses.field(default_factory=Camera)
    materials: List[Material] = dataclasses.field(default_factory=list)
    lights: List[Light] = dataclasses.field(default_factory=list)
    game_objects: List[GameObject] = dataclasses.field(default_factory=list)

    @property
    def num_triangles(self) -> int:
        return sum(go.mesh.num_triangles for go in self.game_objects)

    def geometry_hash(self) -> str:
        """Content hash of meshes + materials + lights (not transforms): keys
        the BVH/scene disk cache. The reference invalidated its SSBO cache on
        object *count* only (main.cpp:930-938) — SURVEY.md §7 flags that as a
        bug to fix with content hashing, which this is. Lights are included
        because the packed lights array is restored from the cache NPZ; only
        transforms are refreshed from the live scene after a hit."""
        from .light import pack_lights

        h = hashlib.sha256()
        for go in self.game_objects:
            h.update(np.int64(go.mesh.num_triangles).tobytes())
            h.update(go.mesh.vertices.tobytes())
            h.update(go.mesh.material_index.tobytes())
            h.update(np.int64(go.material_override).tobytes())
        for m in self.materials:
            h.update(m.packed().tobytes())
        h.update(pack_lights(self.lights).tobytes())
        return h.hexdigest()[:16]

    def transforms(self) -> np.ndarray:
        """(I, 4, 4) float32 stack of instance transforms (dynamic per frame)."""
        if not self.game_objects:
            return np.zeros((0, 4, 4), dtype=np.float32)
        return np.stack([go.transform for go in self.game_objects]).astype(np.float32)
