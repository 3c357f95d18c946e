"""4x4 affine transform helpers with GLM-compatible semantics.

The reference composes object transforms with glm::translate / glm::scale, which
POST-multiply (``glm::translate(M, v) == M * T(v)``) — see the demo scene at
RayZen/src/main.cpp:380-386. These helpers reproduce that convention on float32
numpy arrays so scene descriptions translate 1:1.

Matrices are stored row-major and applied as ``M @ column_vector`` (mathematical
convention; GLM stores column-major but the algebra is identical).
"""

from __future__ import annotations

import numpy as np

Mat4 = np.ndarray


def identity() -> Mat4:
    return np.eye(4, dtype=np.float32)


def translation(v) -> Mat4:
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = np.asarray(v, dtype=np.float32)
    return m


def scaling(v) -> Mat4:
    v = np.asarray(v, dtype=np.float32)
    if v.ndim == 0:
        v = np.full(3, float(v), dtype=np.float32)
    m = np.eye(4, dtype=np.float32)
    m[0, 0], m[1, 1], m[2, 2] = v
    return m


def rotation(angle_rad: float, axis) -> Mat4:
    """Rotation about an arbitrary axis (glm::rotate semantics)."""
    axis = np.asarray(axis, dtype=np.float64)
    axis = axis / np.linalg.norm(axis)
    x, y, z = axis
    c, s = np.cos(angle_rad), np.sin(angle_rad)
    t = 1.0 - c
    r = np.array(
        [
            [t * x * x + c, t * x * y - s * z, t * x * z + s * y, 0.0],
            [t * x * y + s * z, t * y * y + c, t * y * z - s * x, 0.0],
            [t * x * z - s * y, t * y * z + s * x, t * z * z + c, 0.0],
            [0.0, 0.0, 0.0, 1.0],
        ]
    )
    return r.astype(np.float32)


def translate(m: Mat4, v) -> Mat4:
    """glm::translate: post-multiply by a translation."""
    return (m @ translation(v)).astype(np.float32)


def scale(m: Mat4, v) -> Mat4:
    """glm::scale: post-multiply by a scale."""
    return (m @ scaling(v)).astype(np.float32)


def rotate(m: Mat4, angle_rad: float, axis) -> Mat4:
    """glm::rotate: post-multiply by a rotation."""
    return (m @ rotation(angle_rad, axis)).astype(np.float32)


def inverse(m: Mat4) -> Mat4:
    return np.linalg.inv(m.astype(np.float64)).astype(np.float32)


def transform_point(m: Mat4, p):
    p = np.asarray(p, dtype=np.float32)
    h = m @ np.append(p, 1.0).astype(np.float32)
    return h[:3]


def transform_vector(m: Mat4, v):
    v = np.asarray(v, dtype=np.float32)
    h = m @ np.append(v, 0.0).astype(np.float32)
    return h[:3]
