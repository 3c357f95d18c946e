"""Camera with the reference's view/projection and fly-controls semantics.

Reference: RayZen/include/Camera.h:7-86 — position/target/up with fov, aspect,
near/far, yaw/pitch fly controls, glm::lookAt view and glm::perspective projection.
The matrices here reproduce GLM's right-handed, [-1, 1]-clip conventions exactly so
the unprojection in ray generation (fragment_shader.glsl:204-212) carries over.
"""

from __future__ import annotations

import dataclasses
import numpy as np


def look_at(eye, center, up) -> np.ndarray:
    """glm::lookAt (right-handed)."""
    eye = np.asarray(eye, dtype=np.float64)
    center = np.asarray(center, dtype=np.float64)
    up = np.asarray(up, dtype=np.float64)
    f = center - eye
    f = f / np.linalg.norm(f)
    s = np.cross(f, up)
    s = s / np.linalg.norm(s)
    u = np.cross(s, f)
    m = np.eye(4)
    m[0, :3] = s
    m[1, :3] = u
    m[2, :3] = -f
    m[0, 3] = -np.dot(s, eye)
    m[1, 3] = -np.dot(u, eye)
    m[2, 3] = np.dot(f, eye)
    return m.astype(np.float32)


def perspective(fovy_rad: float, aspect: float, near: float, far: float) -> np.ndarray:
    """glm::perspective (right-handed, clip z in [-1, 1])."""
    t = np.tan(fovy_rad / 2.0)
    m = np.zeros((4, 4))
    m[0, 0] = 1.0 / (aspect * t)
    m[1, 1] = 1.0 / t
    m[2, 2] = -(far + near) / (far - near)
    m[2, 3] = -(2.0 * far * near) / (far - near)
    m[3, 2] = -1.0
    return m.astype(np.float32)


@dataclasses.dataclass
class Camera:
    """Mirrors Camera.h: `target` is a *direction* (the view matrix looks at
    position + target, Camera.h:43)."""

    position: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([0.0, 0.0, 3.0], np.float32)
    )
    target: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([0.0, 0.0, -1.0], np.float32)
    )
    up: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([0.0, 1.0, 0.0], np.float32)
    )
    fov: float = 45.0  # degrees (Camera.h default)
    aspect_ratio: float = 800.0 / 600.0
    near_clip: float = 0.1
    far_clip: float = 100.0
    speed: float = 1.0
    sensitivity: float = 0.1
    yaw: float = -90.0
    pitch: float = 0.0

    def __post_init__(self):
        self.position = np.asarray(self.position, dtype=np.float32)
        self.target = np.asarray(self.target, dtype=np.float32)
        self.up = np.asarray(self.up, dtype=np.float32)

    # --- matrices -------------------------------------------------------
    @property
    def view_matrix(self) -> np.ndarray:
        return look_at(self.position, self.position + self.target, self.up)

    @property
    def projection_matrix(self) -> np.ndarray:
        return perspective(
            np.radians(self.fov), self.aspect_ratio, self.near_clip, self.far_clip
        )

    @property
    def inv_view_matrix(self) -> np.ndarray:
        return np.linalg.inv(self.view_matrix.astype(np.float64)).astype(np.float32)

    @property
    def inv_projection_matrix(self) -> np.ndarray:
        return np.linalg.inv(self.projection_matrix.astype(np.float64)).astype(
            np.float32
        )

    # --- movement (Camera.h:52-64) --------------------------------------
    def move_forward(self, dt: float) -> None:
        self.position = self.position + self.speed * dt * self.target

    def move_backward(self, dt: float) -> None:
        self.position = self.position - self.speed * dt * self.target

    def move_left(self, dt: float) -> None:
        right = np.cross(self.target, self.up)
        right = right / np.linalg.norm(right)
        self.position = self.position - right * self.speed * dt

    def move_right(self, dt: float) -> None:
        right = np.cross(self.target, self.up)
        right = right / np.linalg.norm(right)
        self.position = self.position + right * self.speed * dt

    # --- mouse-look (Camera.h:66-85) ------------------------------------
    def rotate(self, offset_x: float, offset_y: float) -> None:
        self.yaw += offset_x * self.sensitivity
        self.pitch += offset_y * self.sensitivity
        self.pitch = float(np.clip(self.pitch, -89.0, 89.0))
        cy, sy = np.cos(np.radians(self.yaw)), np.sin(np.radians(self.yaw))
        cp, sp = np.cos(np.radians(self.pitch)), np.sin(np.radians(self.pitch))
        direction = np.array([cy * cp, sp, sy * cp], dtype=np.float32)
        self.target = direction / np.linalg.norm(direction)
        right = np.cross(self.target, np.array([0.0, 1.0, 0.0], np.float32))
        right = right / np.linalg.norm(right)
        up = np.cross(right, self.target)
        self.up = (up / np.linalg.norm(up)).astype(np.float32)

    # --- packing for device kernels -------------------------------------
    def device_params(self) -> dict:
        """Camera uniforms as a dict of float32 arrays (the analog of the
        `camera` uniform struct, fragment_shader.glsl:6-13)."""
        return {
            "view": self.view_matrix,
            "proj": self.projection_matrix,
            "inv_view": self.inv_view_matrix,
            "inv_proj": self.inv_projection_matrix,
            "position": self.position.astype(np.float32),
        }
