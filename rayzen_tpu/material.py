"""Material model.

Reference: RayZen/include/Material.h:6-18 — albedo, metallic, roughness,
reflectivity (default 0), transparency (default 0), ior (default 1.5). Packed for
the device as a flat (M, 8) float32 array (the MaterialBuffer SSBO analog,
fragment_shader.glsl:51-53).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import numpy as np

# Packed column layout.
ALBEDO = slice(0, 3)
METALLIC = 3
ROUGHNESS = 4
REFLECTIVITY = 5
TRANSPARENCY = 6
IOR = 7
PACKED_WIDTH = 8


@dataclasses.dataclass
class Material:
    albedo: Tuple[float, float, float]
    metallic: float
    roughness: float
    reflectivity: float = 0.0
    transparency: float = 0.0
    ior: float = 1.5

    def packed(self) -> np.ndarray:
        out = np.empty(PACKED_WIDTH, dtype=np.float32)
        out[ALBEDO] = self.albedo
        out[METALLIC] = self.metallic
        out[ROUGHNESS] = self.roughness
        out[REFLECTIVITY] = self.reflectivity
        out[TRANSPARENCY] = self.transparency
        out[IOR] = self.ior
        return out


def pack_materials(materials: Sequence[Material]) -> np.ndarray:
    """(M, 8) float32 material table; at least one row so gathers stay valid."""
    if not materials:
        return np.zeros((1, PACKED_WIDTH), dtype=np.float32)
    return np.stack([m.packed() for m in materials])
