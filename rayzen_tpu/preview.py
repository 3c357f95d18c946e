"""Preview renderer — the "editor mode" analog.

Reference: the raster pipeline (editor_vertex.glsl / editor_fragment.glsl,
RayZen/src/main.cpp:1210-1322) renders a cheap GGX-PBR approximation with no
shadows and no GI while the path-tracer megakernel compiles asynchronously, and
stays available on F1 toggle. Here the preview reuses the *same* ray-traced
primary visibility (no rasterizer on a TPU) but shades with the editor fragment
shader's exact model: GGX D/G/F with clamped roughness, kD=(1-F)(1-metallic)
diffuse, no shadow rays, and transparency displayed as a 50% albedo mix
(editor_fragment.glsl:56-109). It serves the same role: a fast first frame while
the full wavefront integrator's XLA compile warms (compile cache analog of the
async shader-compile subsystem, main.cpp:273-305).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import light as light_mod
from . import material as mat_mod
from .config import RenderConfig
from .ops import camera_rays
from .ops.intersect import dot3, normalize
from .ops.shade import PI_REF, fresnel_schlick, sky_color
from .ops.traverse import hit_shading_data, traverse_world
from .packing import SceneArrays, world_geometry


def shade_preview(ws, point, normal, material, view_dir, cfg):
    """editor_fragment.glsl main(): PBR without shadows."""
    albedo = material[:, mat_mod.ALBEDO]
    metallic = material[:, mat_mod.METALLIC]
    roughness = material[:, mat_mod.ROUGHNESS]
    transparency = material[:, mat_mod.TRANSPARENCY]

    n = normal
    v = view_dir
    n_dot_v = jnp.maximum(dot3(n, v), 0.0)
    f0 = 0.04 * (1.0 - metallic[:, None]) + albedo * metallic[:, None]
    color = jnp.asarray(cfg.ambient, dtype=jnp.float32) * albedo

    for li in range(ws.num_lights):
        lrow = ws.lights[li]
        posdir = lrow[light_mod.POSDIR]
        lcolor = lrow[light_mod.COLOR]
        power = lrow[light_mod.POWER]
        is_point = posdir[3] == 1.0

        lv = posdir[:3] - point
        dist = jnp.maximum(jnp.sqrt(dot3(lv, lv)), 0.001)
        l_dir = jnp.where(is_point, lv / dist[:, None], posdir[:3] / jnp.maximum(jnp.sqrt(jnp.sum(posdir[:3] ** 2)), 1e-20))
        attenuation = jnp.where(is_point, power / (dist * dist), power)

        n_dot_l = jnp.maximum(dot3(n, l_dir), 0.0)
        lit = n_dot_l > 0.0  # editor_fragment.glsl:84 continue
        h = normalize(v + l_dir, eps=1e-20)
        n_dot_h = jnp.maximum(dot3(n, h), 0.0)
        v_dot_h = jnp.maximum(dot3(v, h), 0.0)

        rough = jnp.clip(roughness, 0.05, 1.0)  # editor_fragment.glsl:91
        a = rough * rough
        a2 = a * a
        dden = n_dot_h * n_dot_h * (a2 - 1.0) + 1.0
        d = a2 / jnp.maximum(PI_REF * dden * dden, 1e-4)
        k = (rough + 1.0) ** 2 / 8.0
        g = (n_dot_v / (n_dot_v * (1.0 - k) + k + 1e-6)) * (
            n_dot_l / (n_dot_l * (1.0 - k) + k + 1e-6)
        )
        f = fresnel_schlick(v_dot_h[:, None], f0)
        spec = f * (d * g)[:, None] / jnp.maximum(4.0 * n_dot_v * n_dot_l, 1e-4)[:, None]
        kd = (1.0 - f) * (1.0 - metallic[:, None])
        diffuse = kd * albedo / PI_REF
        contrib = (diffuse + spec) * lcolor * (attenuation * n_dot_l)[:, None]
        color = color + jnp.where(lit[:, None], contrib, 0.0)

    # transparency display mix (editor_fragment.glsl:105-107)
    mix_amt = jnp.clip(transparency, 0.0, 1.0) * 0.5
    color = color * (1.0 - mix_amt[:, None]) + albedo * mix_amt[:, None]
    return color


def render_preview(arrays: SceneArrays, camera_params: dict, cfg: RenderConfig):
    """(H, W, 3) preview frame: primary visibility + editor shading, sky misses."""
    frag, uv = camera_rays.pixel_grid(cfg.width, cfg.height)
    zero_jitter = jnp.zeros_like(uv)
    origin, direction = camera_rays.generate_rays(
        uv,
        zero_jitter,
        camera_params["inv_proj"],
        camera_params["inv_view"],
        camera_params["position"],
    )
    active = direction[:, 0] * 0.0 < 1.0  # all True, varying-derived
    ws = world_geometry(arrays)
    hit = traverse_world(ws, origin, direction, active)
    normal, material, _ = hit_shading_data(ws, hit)
    view_dir = normalize(camera_params["position"] - hit.point, eps=1e-20)
    shaded = shade_preview(ws, hit.point, normal, material, view_dir, cfg)
    color = jnp.where(hit.found[:, None], shaded, sky_color(direction, cfg))
    color = jnp.clip(color, 0.0, 1.0)
    return color.reshape(cfg.height, cfg.width, 3)
