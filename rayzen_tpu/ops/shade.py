"""Shading: GGX direct lighting, transparent-aware shadow rays, BSDF sampling.

Reference kernels reproduced here (all from RayZen/shaders/fragment_shader.glsl):
- fresnelSchlick (:533), reflectRay (:537), refractDir (:558-567)
- randomHemisphereDirection (:192-202)
- shadowVisibility (:507-528) — transparent surfaces multiply transmission,
  opaque surfaces block, early-out below visibility 0.05, up to 32 re-casts
- calculateLighting (:569-663) — GGX D + Schlick-GGX G + Schlick Fresnel with a
  separate specular-only path for transparent dielectrics (F0 from IOR), point
  lights power/d^2, directional lights raw power, ambient 0.05
- sky gradient miss shader (:706-709)

Everything is dense masked VPU math over a ray wave. Light loops unroll over the
static light count. The reference uses the literal 3.14159 for pi — kept for
image parity.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import light as light_mod
from .. import material as mat_mod
from ..config import RenderConfig
from ..packing import WorldArrays
from .intersect import dot3, normalize
from .traverse import hit_shading_data, shadow_walk  # noqa: F401 (re-export)

PI_REF = 3.14159  # the reference's pi (glsl:197,600,648,657)
SHADOW_EPS = 1e-3  # glsl:510


def sky_color(direction, cfg: RenderConfig):
    """Blueish gradient miss shader (glsl:706-709)."""
    t = 0.5 * (direction[..., 1] + 1.0)
    horizon = jnp.asarray(cfg.sky_horizon, dtype=jnp.float32)
    zenith = jnp.asarray(cfg.sky_zenith, dtype=jnp.float32)
    return horizon + (zenith - horizon) * t[..., None]


def fresnel_schlick(cos_theta, f0):
    return f0 + (1.0 - f0) * (1.0 - cos_theta) ** 5


def reflect(incident, normal):
    return incident - 2.0 * dot3(incident, normal)[..., None] * normal


def refract_dir(incident, normal, eta):
    """(refracted, ok): ok=False signals total internal reflection (glsl:558-567).
    ``normal`` must oppose ``incident`` (caller orients it)."""
    cosi = jnp.clip(dot3(-incident, normal), -1.0, 1.0)
    sint2 = jnp.maximum(0.0, 1.0 - cosi * cosi)
    k = 1.0 - eta * eta * sint2
    ok = k >= 0.0
    k_safe = jnp.maximum(k, 0.0)
    refr = eta[..., None] * incident + (eta * cosi - jnp.sqrt(k_safe))[..., None] * normal
    return normalize(refr, eps=1e-20), ok


def hemisphere_direction(normal, u, v):
    """Cosine-ish hemisphere sample in the normal's tangent frame
    (randomHemisphereDirection, glsl:192-202): theta = acos(sqrt(1-u))."""
    ct = jnp.sqrt(1.0 - u)
    st = jnp.sqrt(jnp.maximum(0.0, 1.0 - ct * ct))
    phi = 2.0 * PI_REF * v
    dx = st * jnp.cos(phi)
    dy = st * jnp.sin(phi)
    dz = ct
    up = jnp.where(
        (jnp.abs(normal[..., 1]) < 0.99)[..., None],
        jnp.asarray([0.0, 1.0, 0.0], dtype=jnp.float32),
        jnp.asarray([1.0, 0.0, 0.0], dtype=jnp.float32),
    )
    tangent = normalize(jnp.cross(up, normal), eps=1e-20)
    bitangent = jnp.cross(normal, tangent)
    out = tangent * dx[..., None] + bitangent * dy[..., None] + normal * dz[..., None]
    return normalize(out, eps=1e-20)


class ShadowResult(NamedTuple):
    visible: jax.Array  # (R,) bool — the function's return value
    visibility: jax.Array  # (R,) float — accumulated transmission
    rays: jax.Array  # () int32 — occlusion rays actually cast (for Mrays/s)


def shadow_visibility(
    ws: WorldArrays,
    origin,  # (R, 3)
    direction,  # (R, 3) normalized, toward the light
    max_dist,  # (R,) or scalar
    active,  # (R,) bool
    cfg: RenderConfig,
    shadow_fn=None,
) -> ShadowResult:
    """Transparent-aware occlusion query (shadowVisibility, glsl:507-528).

    The reference re-casts a closest-hit query through each transparent surface
    (up to 32 traversals). The transmission product is order-independent, so
    this runs a SINGLE transmission-accumulating tree walk
    (traverse.shadow_walk) with identical outcomes: opaque blocker -> 0,
    accumulated transparency otherwise, invisible below the 0.05 floor."""
    fn = shadow_fn or shadow_walk
    n_rays = origin.shape[0]
    max_dist = jnp.broadcast_to(jnp.asarray(max_dist, jnp.float32), (n_rays,))
    vis, rays = fn(
        ws, origin, direction, max_dist, active,
        min_visibility=cfg.shadow_min_visibility, t_eps=SHADOW_EPS,
    )
    visible = (vis > cfg.shadow_min_visibility) & active
    return ShadowResult(visible, vis, rays)


def direct_lighting(
    ws: WorldArrays,
    point,  # (R, 3)
    normal,  # (R, 3)
    material,  # (R, 8)
    view_dir,  # (R, 3) toward the camera
    active,  # (R,) bool
    cfg: RenderConfig,
    shadow_fn=None,
):
    """calculateLighting (glsl:569-663): returns (R, 3) radiance.

    Cast shadow rays per light (the expensive part — only called on bounce 0,
    glsl:716). Both material paths (transparent specular-only and standard
    diffuse+specular) are evaluated densely and selected per ray.

    Returns (radiance (R, 3), shadow_ray_count ())."""
    albedo = material[:, mat_mod.ALBEDO]
    metallic = material[:, mat_mod.METALLIC]
    roughness = material[:, mat_mod.ROUGHNESS]
    transparency = material[:, mat_mod.TRANSPARENCY]
    ior = material[:, mat_mod.IOR]
    is_transparent = transparency > 0.0

    # transparent path F0 from IOR (glsl:572); standard F0 = mix(0.04, albedo, metal)
    f0_trans = ((1.0 - ior) / (1.0 + ior)) ** 2
    f0_std = 0.04 * (1.0 - metallic[:, None]) + albedo * metallic[:, None]

    ambient = jnp.asarray(cfg.ambient, dtype=jnp.float32)
    out_std = ambient * albedo  # (glsl:612); transparent path has no ambient
    out_trans = jnp.zeros_like(albedo)

    n_dot_v = jnp.maximum(dot3(normal, view_dir), 0.0)
    shadow_rays = jnp.int32(0)

    for li in range(ws.num_lights):
        lrow = ws.lights[li]
        posdir = lrow[light_mod.POSDIR]
        color = lrow[light_mod.COLOR]
        power = lrow[light_mod.POWER]
        is_point = posdir[3] == 1.0

        lv = posdir[:3] - point
        dist = jnp.maximum(jnp.sqrt(dot3(lv, lv)), 0.001)
        l_point = lv / dist[:, None]
        l_dirl = posdir[:3] / jnp.maximum(jnp.sqrt(jnp.sum(posdir[:3] ** 2)), 1e-20)
        l_dir = jnp.where(is_point, l_point, l_dirl)
        attenuation = jnp.where(is_point, power / (dist * dist), power)
        max_dist = jnp.where(is_point, dist, 1e30)

        shadow = shadow_visibility(
            ws, point + l_dir * 0.001, l_dir, max_dist, active, cfg,
            shadow_fn=shadow_fn,
        )
        attenuation = attenuation * shadow.visibility
        lit = active & shadow.visible
        shadow_rays = shadow_rays + shadow.rays

        n_dot_l = jnp.maximum(dot3(normal, l_dir), 0.0)
        h = normalize(l_dir + view_dir, eps=1e-20)
        n_dot_h = jnp.maximum(dot3(normal, h), 0.0)
        h_dot_v = jnp.maximum(dot3(h, view_dir), 0.0)

        # --- transparent specular-only lobe (glsl:571-609) ---
        f_t = fresnel_schlick(h_dot_v, f0_trans)
        rough_t = jnp.maximum(roughness, 0.02)
        a_t = rough_t * rough_t
        a2_t = a_t * a_t
        dden_t = n_dot_h * n_dot_h * (a2_t - 1.0) + 1.0
        d_t = a2_t / (PI_REF * dden_t * dden_t + 1e-6)
        k_t = (rough_t + 1.0) ** 2 / 8.0
        gv_t = n_dot_v / (n_dot_v * (1.0 - k_t) + k_t + 1e-6)
        gl_t = n_dot_l / (n_dot_l * (1.0 - k_t) + k_t + 1e-6)
        denom_t = jnp.maximum(4.0 * n_dot_l * n_dot_v, 1e-4)
        spec_t = (f_t * d_t * gv_t * gl_t) / denom_t
        contrib_t = spec_t[:, None] * color * (attenuation * n_dot_l)[:, None]
        lit_t = lit & (n_dot_l > 0.0)  # glsl:591 continue
        out_trans = out_trans + jnp.where(lit_t[:, None], contrib_t, 0.0)

        # --- standard diffuse+specular (glsl:611-660) ---
        f_s = fresnel_schlick(h_dot_v[:, None], f0_std)
        alpha = roughness * roughness
        alpha2 = alpha * alpha
        dden_s = n_dot_h * n_dot_h * (alpha2 - 1.0) + 1.0
        d_s = alpha2 / jnp.maximum(PI_REF * dden_s * dden_s, 1e-12)
        k_s = (roughness + 1.0) ** 2 / 8.0
        g_s = n_dot_v / (n_dot_v * (1.0 - k_s) + k_s)
        g_s = g_s * (n_dot_l / (n_dot_l * (1.0 - k_s) + k_s))
        denom_s = jnp.maximum(4.0 * n_dot_v * n_dot_l, 1e-4)
        spec_s = f_s * (d_s * g_s / denom_s)[:, None]
        diffuse = (1.0 - f_s) * albedo * (n_dot_l / PI_REF)[:, None]
        contrib_s = jnp.maximum(
            0.0, (diffuse + spec_s) * color * attenuation[:, None]
        )
        out_std = out_std + jnp.where(lit[:, None], contrib_s, 0.0)

    return jnp.where(is_transparent[:, None], out_trans, out_std), shadow_rays
