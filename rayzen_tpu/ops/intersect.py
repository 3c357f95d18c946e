"""Batched intersection primitives (VPU-dense, arbitrary leading batch dims).

Reference kernels being reproduced:
- intersectAABB — branchless slab test (fragment_shader.glsl:380-388)
- hitTriangle — Möller–Trumbore with det epsilon 1e-4 and t epsilon 1e-4,
  geometric (face) normal only (fragment_shader.glsl:391-416)
"""

from __future__ import annotations

import jax.numpy as jnp

DET_EPS = 1e-4
T_EPS = 1e-4
T_FAR = 1e30


def dot3(a, b):
    return jnp.sum(a * b, axis=-1)


def cross3(a, b):
    return jnp.cross(a, b)


def normalize(v, eps: float = 0.0):
    n = jnp.sqrt(dot3(v, v))
    if eps:
        n = jnp.maximum(n, eps)
    return v / n[..., None]


def slab_test(origin, inv_dir, bmin, bmax):
    """Ray-AABB slab test. Returns (tmin, tmax, hit); hit = tmax >= max(tmin, 0).

    Matches intersectAABB (glsl:380-388) including IEEE inf semantics for
    axis-parallel rays (inv_dir = ±inf). NaNs from 0 * inf (ray origin on a slab
    plane) resolve the same way as GLSL min/max here because jnp.minimum/maximum
    propagate the *second* argument... to stay deterministic we canonicalize NaNs
    to ±inf explicitly."""
    t0 = (bmin - origin) * inv_dir
    t1 = (bmax - origin) * inv_dir
    # canonicalize possible 0*inf NaNs: treat as no constraint on that axis
    t0 = jnp.nan_to_num(t0, nan=-jnp.inf, posinf=jnp.inf, neginf=-jnp.inf)
    t1 = jnp.nan_to_num(t1, nan=jnp.inf, posinf=jnp.inf, neginf=-jnp.inf)
    tsmall = jnp.minimum(t0, t1)
    tbig = jnp.maximum(t0, t1)
    tmin = jnp.max(tsmall, axis=-1)
    tmax = jnp.min(tbig, axis=-1)
    hit = tmax >= jnp.maximum(tmin, 0.0)
    return tmin, tmax, hit


def moller_trumbore(origin, direction, v0, e1, e2):
    """Möller–Trumbore over matching batch shapes (..., 3).

    Returns (t, hit). Triangles are stored as (v0, e1=v1-v0, e2=v2-v0). The
    face normal, when needed, is normalize(cross(e1, e2)) — *not* flipped toward
    the ray, faithful to hitTriangle (glsl:411)."""
    h = cross3(direction, e2)
    a = dot3(e1, h)
    valid = jnp.abs(a) >= DET_EPS
    f = 1.0 / jnp.where(valid, a, 1.0)
    s = origin - v0
    u = f * dot3(s, h)
    q = cross3(s, e1)
    v = f * dot3(direction, q)
    t = f * dot3(e2, q)
    hit = valid & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0) & (t > T_EPS)
    return jnp.where(hit, t, T_FAR), hit


def face_normal(e1, e2):
    return normalize(cross3(e1, e2), eps=1e-20)


class Ray:
    """Host-side ray (origin + direction) with point_at — API parity with the
    reference's CPU Ray (RayZen/include/Ray.h:6-18, which is likewise unused by
    the render path; device code keeps rays as SoA arrays)."""

    def __init__(self, origin, direction):
        self.origin = jnp.asarray(origin, jnp.float32)
        self.direction = jnp.asarray(direction, jnp.float32)

    def point_at(self, t):
        return self.origin + self.direction * t
