"""Lights.

Reference: RayZen/include/Light.h:6-30 — a vec4 positionOrDirection where w==1
marks a point light and w==0 a directional light, plus color and power. For
directional lights the vector points *toward* the light
(fragment_shader.glsl:585,631); point lights fall off as power/d^2 (:582,626).
Packed as (L, 8) float32: [posdir(4), color(3), power].
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import numpy as np

POSDIR = slice(0, 4)
COLOR = slice(4, 7)
POWER = 7
PACKED_WIDTH = 8


@dataclasses.dataclass
class Light:
    position_or_direction: Tuple[float, float, float, float]
    color: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    power: float = 1.0

    @staticmethod
    def point(position, color=(1.0, 1.0, 1.0), power=1.0) -> "Light":
        p = tuple(float(x) for x in position)
        return Light((p[0], p[1], p[2], 1.0), tuple(color), float(power))

    @staticmethod
    def directional(direction, color=(1.0, 1.0, 1.0), power=1.0) -> "Light":
        d = tuple(float(x) for x in direction)
        return Light((d[0], d[1], d[2], 0.0), tuple(color), float(power))

    @property
    def is_point_light(self) -> bool:
        return self.position_or_direction[3] == 1.0

    @property
    def position(self) -> np.ndarray:
        return np.asarray(self.position_or_direction[:3], dtype=np.float32)

    @property
    def direction(self) -> np.ndarray:
        if self.is_point_light:
            return np.zeros(3, dtype=np.float32)
        d = np.asarray(self.position_or_direction[:3], dtype=np.float32)
        return d / np.linalg.norm(d)

    def packed(self) -> np.ndarray:
        out = np.empty(PACKED_WIDTH, dtype=np.float32)
        out[POSDIR] = self.position_or_direction
        out[COLOR] = self.color
        out[POWER] = self.power
        return out


def pack_lights(lights: Sequence[Light]) -> np.ndarray:
    if not lights:
        # genuinely zero rows: the light loops unroll over shape[0], so an
        # unlit scene casts no shadow rays at all (reference: numLights == 0
        # skips the loop, fragment_shader.glsl:615)
        return np.zeros((0, PACKED_WIDTH), dtype=np.float32)
    return np.stack([l.packed() for l in lights])
