"""Persistent bounce megakernel: the whole bounce loop in one Pallas kernel.

After the peeled primary bounce (which alone does direct lighting,
fragment_shader.glsl:716), the wavefront integrator's remaining work per bounce
is: closest-hit traversal, sky on miss (glsl:706-709), material scatter
(glsl:722-756), and Russian roulette (glsl:764-769). Run as separate XLA stages
(integrator.trace_wave) every bounce pays HBM round trips for the full wave
state — and the (R,)/(R, 3)-shaped glue buffers are laid out with the minor
dimension padded to 128 lanes on TPU (the documented 16-42x padding tax,
docs/PERFORMANCE.md), so the *glue*, not the traversal, dominates bounce cost.

This kernel fuses bounces 1..max_bounces-1 per ray packet: state lives in VMEM
as (PACKET_ROWS, 128) tiles for the whole loop, traversal reuses the ordered-
stack BVH2 walk (pallas_traverse.bvh2_walk_closest), and the RNG (both the
reference sin-hash flow, ops/rng.ReferenceSampler, and the TPU-native integer
hash, ops/rng.HashSampler) is evaluated inline — pure elementwise math. Each
packet exits its bounce loop as soon as all of its rays die (finer-grained than
the XLA while_loop's whole-wave exit).

Faithfully-kept reference quirks (same list as integrator.trace_wave): direct
lighting on bounce 0 only (handled outside), throughput trims 0.95 / 0.98 /
albedo*0.4 (glsl:738,752,755), the scatter draw reused for Russian roulette
(glsl:720 vs :766), geometric unflipped normals, self-intersection offset 0.003
signed by the new direction (glsl:758-761).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import logging_util as log
from ..config import RenderConfig
from ..packing import WorldArrays
from .pallas_traverse import (
    PACKET_ROWS,
    STACK_DEPTH,
    _as_tiles,
    bvh2_walk_closest,
    bvh2_walk_shadow,
    bvh8_walk_closest,
    bvh8_walk_shadow,
    frustum_walk_closest,
    tiered_walk_closest,
    tiered_walk_shadow,
)

PI_REF = 3.14159  # glsl:197 (shade.py keeps the same literal)


# ---- elementwise helpers on (rows, 128) tiles -------------------------------


def _dot(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _cross(ax, ay, az, bx, by, bz):
    return ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx


def _normalize(vx, vy, vz, eps):
    n = jnp.maximum(jnp.sqrt(vx * vx + vy * vy + vz * vz), eps)
    return vx / n, vy / n, vz / n


def _ref_rand(x, y):
    """fract(sin(dot(v, (12.9898, 78.233))) * 43758.5453) (glsl:188-190)."""
    s = jnp.sin(x * 12.9898 + y * 78.233) * 43758.5453
    return s - jnp.floor(s)


def _hash_u32(x):
    """lowbias32 (ops/rng._hash_u32)."""
    x = x.astype(jnp.uint32)
    x ^= x >> 16
    x *= jnp.uint32(0x7FEB352D)
    x ^= x >> 15
    x *= jnp.uint32(0x846CA68B)
    x ^= x >> 16
    return x


def _u32_to_unit_float(x):
    # u32 -> i32 -> f32 (top 24 bits fit int32; Mosaic lacks u32 -> f32)
    return (x >> 8).astype(jnp.int32).astype(jnp.float32) * jnp.float32(
        1.0 / 16777216.0
    )


def _bounce_draws_reference(s0, s1, samp_f, b_f):
    """ReferenceSampler.bounce_draws for a traced bounce index (ops/rng.py)."""
    ts0 = s0 * (b_f * b_f) * 12793.46 + b_f * 1423.34
    ts1 = s1 * (b_f * b_f) * 12793.46 + b_f * 1423.34
    rand_val = _ref_rand(ts0 + samp_f, ts1 + b_f)
    hemi_u = _ref_rand(ts0, ts1)
    hemi_v = _ref_rand(ts0 + 1.0, ts1 + 1.0)
    return rand_val, hemi_u, hemi_v


def _bounce_draws_hash(h_pix, samp_u, b_u):
    """HashSampler._draw for dims SCATTER/HEMI_U/HEMI_V (ops/rng.py). h_pix is
    the precomputed hash(pixel_id ^ hash(key + golden)) tile."""
    base = h_pix + samp_u * jnp.uint32(7919) + b_u * jnp.uint32(127)
    rand_val = _u32_to_unit_float(_hash_u32(base + jnp.uint32(2)))
    hemi_u = _u32_to_unit_float(_hash_u32(base + jnp.uint32(3)))
    hemi_v = _u32_to_unit_float(_hash_u32(base + jnp.uint32(4)))
    return rand_val, hemi_u, hemi_v


def _hemisphere(nx, ny, nz, u, v):
    """randomHemisphereDirection (glsl:192-202); see shade.hemisphere_direction."""
    ct = jnp.sqrt(1.0 - u)
    st = jnp.sqrt(jnp.maximum(0.0, 1.0 - ct * ct))
    phi = 2.0 * PI_REF * v
    lx = st * jnp.cos(phi)
    ly = st * jnp.sin(phi)
    lz = ct
    m = jnp.abs(ny) < 0.99  # up = (0,1,0) else (1,0,0)
    ux = jnp.where(m, 0.0, 1.0)
    uy = jnp.where(m, 1.0, 0.0)
    tx, ty, tz = _cross(ux, uy, jnp.zeros_like(ux), nx, ny, nz)
    tx, ty, tz = _normalize(tx, ty, tz, 1e-20)
    bx, by, bz = _cross(nx, ny, nz, tx, ty, tz)
    ox = tx * lx + bx * ly + nx * lz
    oy = ty * lx + by * ly + ny * lz
    oz = tz * lx + bz * ly + nz * lz
    return _normalize(ox, oy, oz, 1e-20)


def _material_columns(mat_ref, n_mats, mat_f):
    """Per-ray material fields (albedo rgb, metallic, roughness, reflectivity,
    transparency, ior) via an unrolled select chain over the (small, static)
    material table — same padded-gather avoidance as traverse.material_rows.
    ``mat_f`` is the float material id (exact)."""
    cols = [jnp.zeros_like(mat_f) for _ in range(8)]
    for m in range(n_mats):
        mask = mat_f == float(m)
        for c in range(8):
            cols[c] = jnp.where(mask, mat_ref[m, c], cols[c])
    return cols


def _scatter_tiles(dx, dy, dz, nx, ny, nz, cur_ior, rand_val, hemi_u, hemi_v,
                   ar, ag, ab, refl, transp, mat_ior):
    """Tile-wise port of integrator._scatter (glsl:722-756). Returns
    (new_dir xyz, throughput factor rgb, new_ior)."""
    is_trans = transp > 0.0
    entering = -(dx * nx + dy * ny + dz * nz) > 0.0
    sgn = jnp.where(entering, 1.0, -1.0)
    nox, noy, noz = nx * sgn, ny * sgn, nz * sgn
    next_ior = jnp.where(entering, mat_ior, 1.0)
    eta = cur_ior / next_ior
    mdn = -(dx * nox + dy * noy + dz * noz)
    cosi = jnp.clip(mdn, 0.0, 1.0)
    f0 = ((cur_ior - next_ior) / (cur_ior + next_ior)) ** 2
    fresnel = f0 + (1.0 - f0) * (1.0 - cosi) ** 5

    # refract_dir (glsl:558-567): normal oriented against the incident ray
    cosi2 = jnp.clip(mdn, -1.0, 1.0)
    sint2 = jnp.maximum(0.0, 1.0 - cosi2 * cosi2)
    kk = 1.0 - eta * eta * sint2
    refr_ok = kk >= 0.0
    w = eta * cosi2 - jnp.sqrt(jnp.maximum(kk, 0.0))
    rfx, rfy, rfz = _normalize(
        eta * dx + w * nox, eta * dy + w * noy, eta * dz + w * noz, 1e-20
    )

    tir_case = is_trans & ~refr_ok
    refract_case = is_trans & refr_ok
    mirror_case = ~is_trans & (rand_val < refl)

    d_dot_no = dx * nox + dy * noy + dz * noz
    tox = dx - 2.0 * d_dot_no * nox  # reflect about oriented normal (TIR)
    toy = dy - 2.0 * d_dot_no * noy
    toz = dz - 2.0 * d_dot_no * noz
    d_dot_n = dx * nx + dy * ny + dz * nz
    tnx = dx - 2.0 * d_dot_n * nx  # reflect about geometric normal (mirror)
    tny = dy - 2.0 * d_dot_n * ny
    tnz = dz - 2.0 * d_dot_n * nz
    hx, hy, hz = _hemisphere(nx, ny, nz, hemi_u, hemi_v)

    def pick(tir, refr, mirr, diff):
        return jnp.where(
            tir_case, tir,
            jnp.where(refract_case, refr, jnp.where(mirror_case, mirr, diff)),
        )

    ndx = pick(tox, rfx, tnx, hx)
    ndy = pick(toy, rfy, tny, hy)
    ndz = pick(toz, rfz, tnz, hz)

    def factor(a):
        # transmit weight per channel: clip(tint * transp * (1-fresnel), 0, 1)
        tint = (1.0 - transp) + a * transp
        return pick(
            jnp.full_like(a, 0.98),
            jnp.clip(tint * transp * (1.0 - fresnel), 0.0, 1.0),
            jnp.full_like(a, 0.95),
            a * 0.4,
        )

    fr = factor(ar)
    fg = factor(ag)
    fb = factor(ab)
    new_ior = jnp.where(refract_case, next_ior, cur_ior)
    return ndx, ndy, ndz, fr, fg, fb, new_ior


# ---- the kernels -------------------------------------------------------------


def _octant_masked_walk(closest_fn, ox, oy, oz, dx, dy, dz, act):
    """Closest hit via 8 masked sub-walks, one per direction octant.

    Incoherent bounce packets make consensus traversal visit the union of all
    rays' node sets; masking the walk to one octant at a time shrinks each
    consensus set (same effect as octant ray sorting — measured 2-2.4x fewer
    visits on synthetic incoherent waves — without any data movement, which
    Mosaic couldn't do cheaply anyway: no per-lane gather). Octants with no
    alive rays exit their walk at the root. Results merge disjointly."""
    octv = (
        (dx > 0.0).astype(jnp.int32)
        + 2 * (dy > 0.0).astype(jnp.int32)
        + 4 * (dz > 0.0).astype(jnp.int32)
    )

    def body(k, acc):
        t_a, tri_a, nx_a, ny_a, nz_a, me_a = acc
        sel = act & (octv == k)
        t, tri, nx, ny, nz, me = closest_fn(ox, oy, oz, dx, dy, dz, sel)
        return (
            jnp.where(sel, t, t_a), jnp.where(sel, tri, tri_a),
            jnp.where(sel, nx, nx_a), jnp.where(sel, ny, ny_a),
            jnp.where(sel, nz, nz_a), jnp.where(sel, me, me_a),
        )

    init = (
        jnp.full(ox.shape, 1e30, jnp.float32),
        jnp.full(ox.shape, -1, jnp.int32),
        jnp.zeros(ox.shape, jnp.float32),
        jnp.zeros(ox.shape, jnp.float32),
        jnp.zeros(ox.shape, jnp.float32),
        jnp.zeros(ox.shape, jnp.float32),
    )
    return jax.lax.fori_loop(0, 8, body, init)


def _make_bounce_body(closest_fn, mat_ref, n_mats,
                      max_bounces, rr_start, sky_h, sky_z, draws_fn,
                      octant_walks: bool = False):
    """Shared per-bounce step (trace -> sky -> scatter -> RR) operating on the
    carry (b, o, d, throughput, ior, alive, color, rays) of VMEM tiles.
    ``closest_fn(ox, oy, oz, dx, dy, dz, act)`` is the bound traversal walk."""
    if octant_walks:
        walk = lambda *a: _octant_masked_walk(closest_fn, *a)
    else:
        walk = closest_fn

    def bounce(carry):
        (b, ox, oy, oz, dx, dy, dz, tx, ty, tz, ior, alive,
         cr, cg, cb, rays) = carry
        rays = rays + alive  # traced-ray tally (summed outside)

        t, _tri, cnx, cny, cnz, menc = walk(
            ox, oy, oz, dx, dy, dz, alive > 0.5,
        )
        found = menc != 0.0
        missed = (alive > 0.5) & ~found
        # sky gradient (glsl:706-709)
        sky_t = 0.5 * (dy + 1.0)
        cr = cr + jnp.where(missed, tx * (sky_h[0] + (sky_z[0] - sky_h[0]) * sky_t), 0.0)
        cg = cg + jnp.where(missed, ty * (sky_h[1] + (sky_z[1] - sky_h[1]) * sky_t), 0.0)
        cb = cb + jnp.where(missed, tz * (sky_h[2] + (sky_z[2] - sky_h[2]) * sky_t), 0.0)
        alive = jnp.where(found, alive, 0.0)

        # oriented unit normal from the emitted cross product
        sgn = jnp.where(menc < 0.0, -1.0, 1.0)
        nn = jnp.maximum(
            jnp.sqrt(cnx * cnx + cny * cny + cnz * cnz), 1e-20
        )
        nx, ny, nz = cnx / nn * sgn, cny / nn * sgn, cnz / nn * sgn
        mat_f = jnp.abs(menc) - 1.0
        ar, ag, ab, _metal, _rough, refl, transp, mat_ior = _material_columns(
            mat_ref, n_mats, mat_f
        )

        rand_val, hemi_u, hemi_v = draws_fn(b)

        ndx, ndy, ndz, fr, fg, fb, ior = _scatter_tiles(
            dx, dy, dz, nx, ny, nz, ior, rand_val, hemi_u, hemi_v,
            ar, ag, ab, refl, transp, mat_ior,
        )
        tx, ty, tz = tx * fr, ty * fg, tz * fb

        # hit point + self-intersection offset (glsl:758-761)
        push = jnp.where(ndx * nx + ndy * ny + ndz * nz > 0.0, 0.003, -0.003)
        ox = ox + dx * t + nx * push
        oy = oy + dy * t + ny * push
        oz = oz + dz * t + nz * push
        dx, dy, dz = ndx, ndy, ndz

        # Russian roulette (glsl:764-769), reusing rand_val
        if rr_start < max_bounces - 1:
            apply_rr = b > rr_start
            p = jnp.maximum(jnp.maximum(tx, ty), tz)
            kill = apply_rr & (rand_val > p)
            alive = jnp.where(kill, 0.0, alive)
            inv_p = 1.0 / jnp.maximum(p, 1e-12)
            tx = jnp.where(apply_rr, tx * inv_p, tx)
            ty = jnp.where(apply_rr, ty * inv_p, ty)
            tz = jnp.where(apply_rr, tz * inv_p, tz)

        return (b + 1, ox, oy, oz, dx, dy, dz, tx, ty, tz, ior, alive,
                cr, cg, cb, rays)

    return bounce


def _make_draws_fn(rng: str, s0, s1, samp_scalar):
    """Per-bounce RNG draw closure over tile-shaped sampler state."""
    if rng == "reference":

        def draws(b):
            return _bounce_draws_reference(s0, s1, samp_scalar, b.astype(jnp.float32))

    else:

        def draws(b):
            return _bounce_draws_hash(
                s0.astype(jnp.uint32),
                samp_scalar.astype(jnp.int32).astype(jnp.uint32),
                b.astype(jnp.uint32),
            )

    return draws


def _raygen_tiles(u, v, jx, jy, cam_ref):
    """In-kernel calculateRay (glsl:204-212): NDC -> eye -> world unprojection
    with scalar reads from the packed camera table (rows 0-3 inv_proj, 4-7
    inv_view, row 8 camera position)."""
    ndx = (u + jx) * 2.0 - 1.0
    ndy = (v + jy) * 2.0 - 1.0
    P = lambda r, c: cam_ref[r, c]
    eye0 = P(0, 0) * ndx + P(0, 1) * ndy - P(0, 2) + P(0, 3)
    eye1 = P(1, 0) * ndx + P(1, 1) * ndy - P(1, 2) + P(1, 3)
    # ray_eye = (eye0, eye1, -1, 0) (glsl:209)
    V = lambda r, c: cam_ref[4 + r, c]
    wx = V(0, 0) * eye0 + V(0, 1) * eye1 - V(0, 2)
    wy = V(1, 0) * eye0 + V(1, 1) * eye1 - V(1, 2)
    wz = V(2, 0) * eye0 + V(2, 1) * eye1 - V(2, 2)
    dx, dy, dz = _normalize(wx, wy, wz, 0.0)
    ox = jnp.zeros_like(dx) + cam_ref[8, 0]
    oy = jnp.zeros_like(dy) + cam_ref[8, 1]
    oz = jnp.zeros_like(dz) + cam_ref[8, 2]
    return ox, oy, oz, dx, dy, dz


def _direct_lighting_tiles(
    shadow_fn, light_ref, n_lights,
    min_vis, ambient,
    px, py, pz, nx, ny, nz, vx, vy, vz, alive,
    ar, ag, ab, metallic, roughness, transp, mat_ior,
):
    """In-kernel calculateLighting (glsl:569-663) with transmission shadow
    walks — tile-wise port of shade.direct_lighting. Returns (radiance rgb,
    shadow-ray tally increment)."""
    is_transparent = transp > 0.0
    # transparent path F0 from IOR (glsl:572); standard F0 = mix(0.04, albedo, m)
    f0t = ((1.0 - mat_ior) / (1.0 + mat_ior)) ** 2
    f0sr = 0.04 * (1.0 - metallic) + ar * metallic
    f0sg = 0.04 * (1.0 - metallic) + ag * metallic
    f0sb = 0.04 * (1.0 - metallic) + ab * metallic

    outsr = ambient[0] * ar  # (glsl:612); transparent path has no ambient
    outsg = ambient[1] * ag
    outsb = ambient[2] * ab
    outtr = jnp.zeros_like(ar)
    outtg = jnp.zeros_like(ar)
    outtb = jnp.zeros_like(ar)

    n_dot_v = jnp.maximum(nx * vx + ny * vy + nz * vz, 0.0)
    rays = jnp.zeros_like(ar)

    for li in range(n_lights):
        g = lambda c: light_ref[li, c]
        is_point = g(3) == 1.0  # scalar; w=1 point, w=0 directional
        lvx, lvy, lvz = g(0) - px, g(1) - py, g(2) - pz
        dist = jnp.maximum(
            jnp.sqrt(lvx * lvx + lvy * lvy + lvz * lvz), 0.001
        )
        # directional: constant direction toward the light (glsl:585,631)
        dn = jnp.sqrt(jnp.maximum(g(0) ** 2 + g(1) ** 2 + g(2) ** 2, 1e-40))
        ldx = jnp.where(is_point, lvx / dist, g(0) / dn)
        ldy = jnp.where(is_point, lvy / dist, g(1) / dn)
        ldz = jnp.where(is_point, lvz / dist, g(2) / dn)
        attenuation = jnp.where(is_point, g(7) / (dist * dist), g(7))
        max_dist = jnp.where(is_point, dist, jnp.full_like(dist, 1e30))

        rays = rays + alive
        vis = shadow_fn(
            px + ldx * 0.001, py + ldy * 0.001, pz + ldz * 0.001,
            ldx, ldy, ldz, max_dist, alive > 0.5,
        )
        attenuation = attenuation * vis
        lit = (alive > 0.5) & (vis > min_vis)

        n_dot_l = jnp.maximum(nx * ldx + ny * ldy + nz * ldz, 0.0)
        hx, hy, hz = _normalize(ldx + vx, ldy + vy, ldz + vz, 1e-20)
        n_dot_h = jnp.maximum(nx * hx + ny * hy + nz * hz, 0.0)
        h_dot_v = jnp.maximum(hx * vx + hy * vy + hz * vz, 0.0)

        # --- transparent specular-only lobe (glsl:571-609) ---
        f_t = f0t + (1.0 - f0t) * (1.0 - h_dot_v) ** 5
        rough_t = jnp.maximum(roughness, 0.02)
        a2_t = (rough_t * rough_t) ** 2
        dden_t = n_dot_h * n_dot_h * (a2_t - 1.0) + 1.0
        d_t = a2_t / (PI_REF * dden_t * dden_t + 1e-6)
        k_t = (rough_t + 1.0) ** 2 / 8.0
        gv_t = n_dot_v / (n_dot_v * (1.0 - k_t) + k_t + 1e-6)
        gl_t = n_dot_l / (n_dot_l * (1.0 - k_t) + k_t + 1e-6)
        denom_t = jnp.maximum(4.0 * n_dot_l * n_dot_v, 1e-4)
        spec_t = (f_t * d_t * gv_t * gl_t) / denom_t
        lit_t = lit & (n_dot_l > 0.0)  # glsl:591 continue
        wt = spec_t * attenuation * n_dot_l
        outtr = outtr + jnp.where(lit_t, wt * g(4), 0.0)
        outtg = outtg + jnp.where(lit_t, wt * g(5), 0.0)
        outtb = outtb + jnp.where(lit_t, wt * g(6), 0.0)

        # --- standard diffuse+specular (glsl:611-660) ---
        alpha2 = (roughness * roughness) ** 2
        dden_s = n_dot_h * n_dot_h * (alpha2 - 1.0) + 1.0
        d_s = alpha2 / jnp.maximum(PI_REF * dden_s * dden_s, 1e-12)
        k_s = (roughness + 1.0) ** 2 / 8.0
        g_s = n_dot_v / (n_dot_v * (1.0 - k_s) + k_s)
        g_s = g_s * (n_dot_l / (n_dot_l * (1.0 - k_s) + k_s))
        denom_s = jnp.maximum(4.0 * n_dot_v * n_dot_l, 1e-4)
        dg = d_s * g_s / denom_s
        ndl_pi = n_dot_l / PI_REF

        def chan(f0c, a, lc):
            f_s = f0c + (1.0 - f0c) * (1.0 - h_dot_v) ** 5
            spec = f_s * dg
            diffuse = (1.0 - f_s) * a * ndl_pi
            return jnp.maximum(0.0, (diffuse + spec) * lc * attenuation)

        outsr = outsr + jnp.where(lit, chan(f0sr, ar, g(4)), 0.0)
        outsg = outsg + jnp.where(lit, chan(f0sg, ag, g(5)), 0.0)
        outsb = outsb + jnp.where(lit, chan(f0sb, ab, g(6)), 0.0)

    dr = jnp.where(is_transparent, outtr, outsr)
    dg_ = jnp.where(is_transparent, outtg, outsg)
    db = jnp.where(is_transparent, outtb, outsb)
    return dr, dg_, db, rays


def _make_sample_kernel(leaf_k: int, n_mats: int, n_lights: int,
                        max_bounces: int, cfg: RenderConfig,
                        n_samples: int = 1, tiered: bool = False,
                        fuse: int = 1, pop_n: int = 1,
                        stop_bounce: int | None = None,
                        emit_state: bool = False):
    """Full path-tracing samples per packet: raygen, primary hit, direct
    lighting (with in-kernel shadow walks), scatter, and the bounce loop —
    the reference megakernel main() (fragment_shader.glsl:668-822) reshaped
    into packet form. ``n_samples`` samples accumulate INSIDE the kernel
    (fori over the sample index), so one pallas_call serves a whole
    progressive batch: per-call pipeline spin-up amortizes and the traversal
    tables stay hot in VMEM across samples.

    ``fuse``: samples traced TOGETHER per walk — the pixel tile is stacked
    ``fuse`` times into one (PACKET_ROWS*fuse, 128) packet whose sub-blocks
    carry consecutive sample indices. Same-pixel samples are highly coherent
    (identical primary/shadow directions up to jitter; bounce draws from the
    same surface points), so the consensus walk over the fused packet takes
    roughly the iterations of ONE sample while serving ``fuse`` — the
    per-iteration scalar/reduction/cond overhead (the measured cost floor,
    docs/PERFORMANCE.md) amortizes across samples. Requires
    n_samples % fuse == 0. Ref order:
    samp | key | inner | leaf | materials | lights | cam | u v act
    -> cr cg cb rays (sums over samples), scratch: SMEM stack.

    ``stop_bounce``: run only bounces 0..stop_bounce-1 (phase 1 of the
    split-bounce continuation, config.split_bounce). ``emit_state``: also
    write the 13 per-ray continuation tiles (o, d, throughput, ior, alive,
    sampler seeds s0/s1) after the color outputs, for the phase-2 kernel to
    resume from; requires n_samples == 1, fuse == 1, reference RNG."""
    assert n_samples % fuse == 0 and fuse >= 1
    if emit_state:
        assert n_samples == 1 and fuse == 1 and cfg.rng == "reference"
        assert not tiered, "split-bounce requires the single-tree walks"
    rng = cfg.rng if cfg.rng == "reference" else "hash"
    sky_h, sky_z = cfg.sky_horizon, cfg.sky_zenith
    rr_start = cfg.rr_start_bounce
    width, height = cfg.width, cfg.height
    # wide (BVH8) vs binary (BVH2) traversal; the inner-table operand below
    # must match (sample_wave passes ws.inner8_table or ws.inner_table)
    import functools

    if cfg.wide_nodes:
        walk_closest = bvh8_walk_closest
        walk_shadow = bvh8_walk_shadow
    else:
        walk_closest = functools.partial(
            bvh2_walk_closest, dense_leaves=cfg.dense_leaves,
            pop_n=pop_n,
        )
        walk_shadow = functools.partial(
            bvh2_walk_shadow, dense_leaves=cfg.dense_leaves,
            pop_n=pop_n,
        )
    # Frustum-interval walks for the COHERENT bounce-0 waves (primary rays +
    # the direct-lighting shadow fan): internal-node tests become pure scalar
    # interval math, so geometry-dense scenes stop paying per-node vector
    # slabs + reductions for rays that share a screen tile. Incoherent bounce
    # waves keep the consensus walks (a bounce packet's frustum degenerates
    # to everything). BVH2 tables only (frustum reads the same rows).
    frustum = (
        cfg.frustum_primary and not cfg.wide_nodes and not tiered
        and fuse == 1  # fused packets stack tiles; frustum bound still valid
        # but unmeasured — keep the knob orthogonal
    )
    min_vis, shadow_eps = cfg.shadow_min_visibility, 1e-3

    def kernel(samp_ref, key_ref, *refs):
        # bind the traversal walks to this call's refs; the rest of the kernel
        # only sees closest_fn(rays..., act) / shadow_fn(rays..., maxd, act)
        if tiered:
            (top_ref, tre_inner_ref, tre_leaf_ref, mat_ref, light_ref,
             cam_ref, u_ref, v_ref, act_ref,
             cr_ref, cg_ref, cb_ref, rays_ref,
             stack_ref, stack2_ref, scr_inner, scr_leaf, sem_i, sem_l) = refs

            def closest_fn(*rays_act):
                return tiered_walk_closest(
                    top_ref, tre_inner_ref, tre_leaf_ref, stack_ref,
                    stack2_ref, scr_inner, scr_leaf, sem_i, sem_l, leaf_k,
                    *rays_act, dense_leaves=cfg.dense_leaves,
                )

            def shadow_fn(*rays_md_act):
                return tiered_walk_shadow(
                    top_ref, tre_inner_ref, tre_leaf_ref, stack_ref,
                    stack2_ref, scr_inner, scr_leaf, sem_i, sem_l, leaf_k,
                    min_vis, shadow_eps, *rays_md_act,
                    dense_leaves=cfg.dense_leaves,
                )

            primary_fn, shadow0_fn = closest_fn, shadow_fn

        else:
            if emit_state:
                (inner_ref, leaf_ref, mat_ref, light_ref, cam_ref,
                 u_ref, v_ref, act_ref,
                 cr_ref, cg_ref, cb_ref, rays_ref, *state_refs,
                 stack_ref) = refs
            else:
                (inner_ref, leaf_ref, mat_ref, light_ref, cam_ref,
                 u_ref, v_ref, act_ref,
                 cr_ref, cg_ref, cb_ref, rays_ref, stack_ref) = refs

            def closest_fn(*rays_act):
                return walk_closest(
                    inner_ref, leaf_ref, stack_ref, leaf_k, *rays_act
                )

            def shadow_fn(*rays_md_act):
                return walk_shadow(
                    inner_ref, leaf_ref, stack_ref, leaf_k, min_vis,
                    shadow_eps, *rays_md_act
                )

            if frustum:
                # primary CLOSEST only: a tile's shadow fan to a nearby
                # point light has diverging directions, so its interval
                # reciprocal spans zero and the frustum degenerates to
                # everything — shadows stay on the consensus walk
                def primary_fn(*rays_act):
                    return frustum_walk_closest(
                        inner_ref, leaf_ref, stack_ref, leaf_k, *rays_act
                    )

            else:
                primary_fn = closest_fn
            shadow0_fn = shadow_fn

        u0, v0 = u_ref[:], v_ref[:]
        act0 = act_ref[:]
        if fuse > 1:
            u = jnp.concatenate([u0] * fuse, axis=0)
            v = jnp.concatenate([v0] * fuse, axis=0)
            act = jnp.concatenate([act0] * fuse, axis=0)
            # per-sub-block sample offset: block s carries sample g*fuse + s
            samp_off = jnp.concatenate(
                [jnp.full(u0.shape, float(s), jnp.float32) for s in range(fuse)],
                axis=0,
            )
        else:
            u, v, act = u0, v0, act0
            samp_off = 0.0

        def one_sample(samp_i, acc):
            samp_f = samp_ref[0, 0] + samp_i.astype(jnp.float32) * float(
                fuse
            ) + samp_off
            # ---- per-ray sampler state, derived in-kernel from uv ----
            if rng == "reference":
                # seed = uv * (fragX + fragY + samp + 1) (glsl:688); frag =
                # floor(uv*res) + 0.5, so fragX+fragY = floor(u*W)+floor(v*H)+1
                scale = (
                    jnp.floor(u * width) + jnp.floor(v * height) + 1.0
                    + (samp_f + 1.0)
                )
                s0 = u * scale
                s1 = v * scale
                jx = _ref_rand(s0, s1) * 0.00002
                jy = _ref_rand(s0 + 1.0, s1 + 1.0) * 0.00002
            else:
                # f32 -> i32 -> u32: Mosaic has no direct f32 -> u32 cast
                pixel_id = (
                    jnp.floor(v * height).astype(jnp.int32).astype(jnp.uint32)
                    * jnp.uint32(width * 2)
                    + jnp.floor(u * width).astype(jnp.int32).astype(jnp.uint32)
                )
                key_h = _hash_u32(
                    key_ref[0, 0].astype(jnp.uint32) + jnp.uint32(0x9E3779B9)
                )
                s0 = _hash_u32(pixel_id ^ key_h)
                s1 = jnp.zeros_like(u)
                samp_u = samp_f.astype(jnp.int32).astype(jnp.uint32)
                jbase = s0 + samp_u * jnp.uint32(7919)
                jx = (_u32_to_unit_float(_hash_u32(jbase + jnp.uint32(0))) - 0.5) / width
                jy = (_u32_to_unit_float(_hash_u32(jbase + jnp.uint32(1))) - 0.5) / height

            draws_fn = _make_draws_fn(rng, s0, s1, samp_f)

        # ---- bounce 0 (peeled: the only bounce with direct lighting) ----
            ox, oy, oz, dx, dy, dz = _raygen_tiles(u, v, jx, jy, cam_ref)
            rays = act + jnp.zeros_like(u)
            t, _tri, cnx, cny, cnz, menc = primary_fn(
                ox, oy, oz, dx, dy, dz, act > 0.5
            )
            found = menc != 0.0
            missed = (act > 0.5) & ~found
            sky_t = 0.5 * (dy + 1.0)
            cr = jnp.where(missed, sky_h[0] + (sky_z[0] - sky_h[0]) * sky_t, 0.0)
            cg = jnp.where(missed, sky_h[1] + (sky_z[1] - sky_h[1]) * sky_t, 0.0)
            cb = jnp.where(missed, sky_h[2] + (sky_z[2] - sky_h[2]) * sky_t, 0.0)
            alive = jnp.where(found, act, 0.0)

            sgn = jnp.where(menc < 0.0, -1.0, 1.0)
            nn = jnp.maximum(jnp.sqrt(cnx * cnx + cny * cny + cnz * cnz), 1e-20)
            nx, ny, nz = cnx / nn * sgn, cny / nn * sgn, cnz / nn * sgn
            mat_f = jnp.abs(menc) - 1.0
            ar, ag, ab, metal, rough, refl, transp, mat_ior = _material_columns(
                mat_ref, n_mats, mat_f
            )

            px, py, pz = ox + dx * t, oy + dy * t, oz + dz * t
            vx, vy, vz = _normalize(
                cam_ref[8, 0] - px, cam_ref[8, 1] - py, cam_ref[8, 2] - pz, 1e-20
            )
            dr, dgg, db, lrays = _direct_lighting_tiles(
                shadow0_fn, light_ref, n_lights,
                min_vis, cfg.ambient,
                px, py, pz, nx, ny, nz, vx, vy, vz, alive,
                ar, ag, ab, metal, rough, transp, mat_ior,
            )
            rays = rays + lrays
            cr = cr + jnp.where(alive > 0.5, dr, 0.0)
            cg = cg + jnp.where(alive > 0.5, dgg, 0.0)
            cb = cb + jnp.where(alive > 0.5, db, 0.0)

            # bounce-0 scatter (throughput starts at 1)
            rand_val, hemi_u, hemi_v = draws_fn(jnp.int32(0))
            ndx, ndy, ndz, tx, ty, tz, ior = _scatter_tiles(
                dx, dy, dz, nx, ny, nz, jnp.ones_like(u), rand_val, hemi_u,
                hemi_v, ar, ag, ab, refl, transp, mat_ior,
            )
            push = jnp.where(ndx * nx + ndy * ny + ndz * nz > 0.0, 0.003, -0.003)
            ox, oy, oz = px + nx * push, py + ny * push, pz + nz * push
            dx, dy, dz = ndx, ndy, ndz

            # ---- bounces 1..limit-1 (limit < max_bounces = phase 1 of the
            # split-bounce continuation; phase 2 resumes from the emitted
            # state tiles) ----
            limit = stop_bounce if stop_bounce is not None else max_bounces
            out = (jnp.int32(1), ox, oy, oz, dx, dy, dz, tx, ty, tz, ior,
                   alive, cr, cg, cb, rays)
            if limit > 1:
                bounce = _make_bounce_body(
                    closest_fn, mat_ref, n_mats,
                    max_bounces, rr_start, sky_h, sky_z, draws_fn,
                    octant_walks=cfg.octant_bounce_walks,
                )

                def cond(carry):
                    return (carry[0] < limit) & (jnp.sum(carry[11]) > 0.0)

                out = jax.lax.while_loop(cond, bounce, out)
            cr, cg, cb, rays = out[12], out[13], out[14], out[15]

            if emit_state:
                # continuation state: o, d, throughput, ior, alive + the
                # sampler seeds (pure functions of uv and samp, but cheaper
                # to carry than to regather uv post-compaction)
                for ref, val in zip(state_refs, out[1:12] + (s0, s1)):
                    ref[:] = val

            acr, acg, acb, arays = acc
            return acr + cr, acg + cg, acb + cb, arays + rays

        zero = jnp.zeros(u.shape, jnp.float32)
        if emit_state:  # single direct trace (state refs written inside)
            cr, cg, cb, rays = one_sample(
                jnp.int32(0), (zero, zero, zero, zero)
            )
        else:
            cr, cg, cb, rays = jax.lax.fori_loop(
                0, n_samples // fuse, one_sample, (zero, zero, zero, zero)
            )
        if fuse > 1:  # collapse the fused sub-blocks back onto the pixel tile
            rows = u0.shape[0]

            def collapse(x):
                out = x[0:rows]
                for s in range(1, fuse):
                    out = out + x[s * rows:(s + 1) * rows]
                return out

            cr, cg, cb, rays = collapse(cr), collapse(cg), collapse(cb), collapse(rays)
        cr_ref[:] = cr
        cg_ref[:] = cg
        cb_ref[:] = cb
        rays_ref[:] = rays

    return kernel


def _make_continuation_kernel(leaf_k: int, n_mats: int, max_bounces: int,
                              split_b: int, cfg: RenderConfig, pop_n: int,
                              stop_bounce: int | None = None,
                              emit_state: bool = False):
    """Continuation phase of the split-bounce pipeline: resume each
    (compacted) ray at bounce ``split_b`` from its carried state and run it
    to ``stop_bounce`` (or the bounce budget) — a slice of the reference
    bounce loop (fragment_shader.glsl:695-770) over dense alive-only packets.
    With ``emit_state`` the 13 continuation tiles are written again, so
    phases can chain with a fresh compaction before every late bounce
    (config.split_every — the cross-packet re-binning path). Ref order:
    samp | inner | leaf | materials | state(13) -> cr cg cb rays [state(13)]."""
    import functools

    sky_h, sky_z = cfg.sky_horizon, cfg.sky_zenith
    rr_start = cfg.rr_start_bounce
    walk_closest = functools.partial(
        bvh2_walk_closest, dense_leaves=cfg.dense_leaves, pop_n=pop_n
    )
    limit = stop_bounce if stop_bounce is not None else max_bounces

    def kernel(samp_ref, inner_ref, leaf_ref, mat_ref,
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               tx_ref, ty_ref, tz_ref, ior_ref, alive_ref, s0_ref, s1_ref,
               *out_refs):
        stack_ref = out_refs[-1]
        cr_ref, cg_ref, cb_ref, rays_ref = out_refs[:4]

        def closest_fn(*rays_act):
            return walk_closest(inner_ref, leaf_ref, stack_ref, leaf_k,
                                *rays_act)

        s0, s1 = s0_ref[:], s1_ref[:]
        draws_fn = _make_draws_fn("reference", s0, s1, samp_ref[0, 0])
        bounce = _make_bounce_body(
            closest_fn, mat_ref, n_mats, max_bounces, rr_start,
            sky_h, sky_z, draws_fn, octant_walks=cfg.octant_bounce_walks,
        )
        zero = jnp.zeros(s0.shape, jnp.float32)
        init = (jnp.int32(split_b),
                ox_ref[:], oy_ref[:], oz_ref[:],
                dx_ref[:], dy_ref[:], dz_ref[:],
                tx_ref[:], ty_ref[:], tz_ref[:],
                ior_ref[:], alive_ref[:], zero, zero, zero, zero)

        def cond(carry):
            return (carry[0] < limit) & (jnp.sum(carry[11]) > 0.0)

        out = jax.lax.while_loop(cond, bounce, init)
        cr_ref[:] = out[12]
        cg_ref[:] = out[13]
        cb_ref[:] = out[14]
        rays_ref[:] = out[15]
        if emit_state:
            for ref, val in zip(out_refs[4:-1], out[1:12] + (s0, s1)):
                ref[:] = val

    return kernel


def _pack_camera(camera_params: dict):
    """(9, 4) packed camera table: rows 0-3 inv_proj, 4-7 inv_view, 8 pos."""
    return jnp.concatenate(
        [
            jnp.asarray(camera_params["inv_proj"], jnp.float32),
            jnp.asarray(camera_params["inv_view"], jnp.float32),
            jnp.concatenate(
                [jnp.asarray(camera_params["position"], jnp.float32),
                 jnp.zeros((1,), jnp.float32)]
            ).reshape(1, 4),
        ],
        axis=0,
    )


def _pick_pop_n(ws: WorldArrays, cfg: RenderConfig) -> int:
    """Multi-pop width: explicit, legacy dual_pop, or auto by tree size.

    Bounded by the packed tree's measured depth (ADVICE r3): multi-pop stack
    occupancy can reach ~pop_n x depth, so an unbounded width on a deep tree
    would overflow the STACK_DEPTH-entry SMEM stack. Unknown depth (0 — the
    deform path's device-built LBVH) keeps the requested width; that path
    guards at runtime against the same pop_n * (depth + 1) <= STACK_DEPTH - 2
    bound (deform.py)."""
    if cfg.walk_pop:
        n = int(cfg.walk_pop)
    elif cfg.dual_pop:
        n = 2
    elif int(ws.inner_table.shape[0]) > cfg.walk_pop_auto_rows:
        n = int(cfg.walk_pop_auto_n)
    else:
        return 1
    depth = int(getattr(ws, "tree_depth", 0))
    if n > 1 and depth > 0:
        safe = max(1, (STACK_DEPTH - 2) // (depth + 1))
        if n > safe:
            log.info(
                f"walk_pop {n} would overflow the {STACK_DEPTH}-entry "
                f"traversal stack on a depth-{depth} tree; clamped to {safe}"
            )
            n = safe
    return n


def _stable_partition(bucket, n_buckets: int):
    """dest[i] = slot of ray i under a stable partition by bucket id — pure
    cumsum ranking (n_buckets O(R) passes), no argsort (which measured ~400
    ms/sample at 2M rays, docs/PERFORMANCE.md)."""
    dest = jnp.zeros(bucket.shape, jnp.int32)
    offset = jnp.int32(0)
    for k in range(n_buckets):
        mk = (bucket == k).astype(jnp.int32)
        rank = jnp.cumsum(mk) - mk
        dest = jnp.where(bucket == k, offset + rank, dest)
        offset = offset + jnp.sum(mk)
    return dest


def _compaction_permutation(a, dxf, dyf, dzf, mode: str,
                            origins=None):
    """Sort-free stable partition of the wave: alive rays first, dead rays
    last. Returns (dest, order) — ray i moves to slot dest[i]; slot j holds
    ray order[j].

    Modes: "rank" keeps pixel order among survivors; "octant" buckets them
    by direction octant (9 buckets); "octcell" additionally sub-orders each
    octant by a 2x2x2 origin cell — two stable partitions composed LSD-radix
    style on the index vector (cell pass first, octant pass second), so the
    full key costs 17 cumsums and two int gathers, never a sort."""
    n = a.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    if mode in ("octant", "octcell"):
        octv = (
            (dxf > 0.0).astype(jnp.int32)
            + 2 * (dyf > 0.0).astype(jnp.int32)
            + 4 * (dzf > 0.0).astype(jnp.int32)
        )
        bucket = jnp.where(a, octv, 8)  # dead rays -> bucket 8 (the back)
        if mode == "octcell":
            ox, oy, oz = origins
            big = jnp.float32(1e30)

            def mid(v):
                lo = jnp.min(jnp.where(a, v, big))
                hi = jnp.max(jnp.where(a, v, -big))
                return 0.5 * (lo + hi)

            cell = (
                (ox > mid(ox)).astype(jnp.int32)
                + 2 * (oy > mid(oy)).astype(jnp.int32)
                + 4 * (oz > mid(oz)).astype(jnp.int32)
            )
            dest1 = _stable_partition(cell, 8)
            order1 = jnp.zeros((n,), jnp.int32).at[dest1].set(iota)
            dest2 = _stable_partition(bucket[order1], 9)
            dest = dest2[dest1]
        else:
            dest = _stable_partition(bucket, 9)
    else:
        ia = a.astype(jnp.int32)
        rank_alive = jnp.cumsum(ia) - ia
        da = 1 - ia
        rank_dead = jnp.sum(ia) + jnp.cumsum(da) - da
        dest = jnp.where(a, rank_alive, rank_dead)
    order = jnp.zeros((n,), jnp.int32).at[dest].set(iota)
    return dest, order


def sample_wave_split(
    ws: WorldArrays,
    cfg: RenderConfig,
    uv,  # (R, 2) in [0, 1], packet-tile order
    active,  # (R,) bool
    camera_params: dict,
    samp,  # () traced sample index
    rng_key,  # () RNG stream key
    max_bounces: int,
    interpret: bool = False,
):
    """One sample via the split-bounce continuation (config.split_bounce):

      phase 1   bounces 0..split_b-1 in the full megakernel, which also
                emits 13 per-ray continuation tiles,
      compact   cumsum-rank permutation moves survivors to the front
                (optionally octant-bucketed, config.split_rebin),
      phase 2   bounces split_b..N-1 over the compacted wave — survivors
                concentrate into few dense packets; the all-dead packets
                behind them exit their bounce loop after one consensus check.

    Late bounce waves run at single-digit alive fractions yet cost 11-16 ms
    each when survivors scatter one-per-packet (docs/PERFORMANCE.md round 3);
    this trades that for one O(R) permutation per sample. Image-identical to
    the fused kernel: per-ray math and RNG draws are unchanged, rays are only
    reordered between kernels. Returns (color (R, 3), rays ())."""
    split_b = int(cfg.split_bounce)
    if not (0 < split_b < max_bounces):
        raise ValueError("split_bounce must be in (0, max_bounces)")
    if cfg.rng != "reference" or ws.tiered or cfg.wide_nodes:
        raise ValueError(
            "split_bounce supports the reference-RNG single-tree BVH2 path"
        )
    n_rays = uv.shape[0]
    tiles = [
        _as_tiles(uv[:, 0]),
        _as_tiles(uv[:, 1]),
        _as_tiles(active.astype(jnp.float32)),
    ]
    rows = tiles[0].shape[0]
    pad = (-rows) % PACKET_ROWS
    if pad:
        tiles = [jnp.pad(a, ((0, pad), (0, 0))) for a in tiles]
        rows += pad
    grid = rows // PACKET_ROWS
    cam = _pack_camera(camera_params)
    # progressive keying as in sample_wave: continue the sin-hash sample index
    samp_arg = (
        jnp.asarray(samp, jnp.float32)
        + jnp.asarray(rng_key, jnp.float32) * float(cfg.spp)
    ).reshape(1, 1)
    key_arg = jnp.asarray(rng_key, jnp.int32).reshape(1, 1)

    ray_spec = pl.BlockSpec(
        (PACKET_ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    smem_scalar = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    n_lights = int(ws.lights.shape[0])
    lights = ws.lights if n_lights else jnp.zeros((1, 8), jnp.float32)
    n_mats = int(ws.materials.shape[0])
    pop_n = _pick_pop_n(ws, cfg)
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)
    f32 = lambda: jax.ShapeDtypeStruct((rows, 128), jnp.float32)

    kernel1 = _make_sample_kernel(
        ws.leaf_k, n_mats, n_lights, max_bounces, cfg,
        n_samples=1, tiered=False, fuse=1, pop_n=pop_n,
        stop_bounce=split_b, emit_state=True,
    )
    outs = pl.pallas_call(
        kernel1,
        grid=(grid,),
        out_shape=tuple(f32() for _ in range(17)),
        in_specs=[smem_scalar, smem_scalar, vmem, vmem, vmem, vmem, vmem]
        + [ray_spec] * 3,
        out_specs=(ray_spec,) * 17,
        scratch_shapes=[pltpu.SMEM((STACK_DEPTH,), jnp.int32)],
        compiler_params=params,
        interpret=interpret,
    )(samp_arg, key_arg, ws.inner_table, ws.leaf_table,
      ws.materials, lights, cam, *tiles)
    n_flat = rows * 128
    cr = outs[0].reshape(n_flat)
    cg = outs[1].reshape(n_flat)
    cb = outs[2].reshape(n_flat)
    rays = jnp.sum(outs[3])
    flats = [x.reshape(n_flat) for x in outs[4:]]

    # continuation phases: one per compaction point. split_every re-compacts
    # (and re-bins) before every late bounce; otherwise one phase finishes
    # the sample. pix2slot tracks where each pixel's ray currently lives
    # (permutations compose on this index vector, state permutes per phase).
    starts = (
        list(range(split_b, max_bounces)) if cfg.split_every else [split_b]
    )
    pix2slot = None
    for i, b_start in enumerate(starts):
        b_stop = starts[i + 1] if i + 1 < len(starts) else max_bounces
        alive = flats[10] > 0.5
        dest, order = _compaction_permutation(
            alive, flats[3], flats[4], flats[5], cfg.split_rebin,
            origins=(flats[0], flats[1], flats[2]),
        )
        comp = [f[order].reshape(rows, 128) for f in flats]
        pix2slot = dest if pix2slot is None else dest[pix2slot]
        emit = b_stop < max_bounces
        kernel2 = _make_continuation_kernel(
            ws.leaf_k, n_mats, max_bounces, b_start, cfg, pop_n,
            stop_bounce=b_stop if emit else None, emit_state=emit,
        )
        outs2 = pl.pallas_call(
            kernel2,
            grid=(grid,),
            out_shape=tuple(f32() for _ in range(17 if emit else 4)),
            in_specs=[smem_scalar, vmem, vmem, vmem] + [ray_spec] * 13,
            out_specs=(ray_spec,) * (17 if emit else 4),
            scratch_shapes=[pltpu.SMEM((STACK_DEPTH,), jnp.int32)],
            compiler_params=params,
            interpret=interpret,
        )(samp_arg, ws.inner_table, ws.leaf_table, ws.materials, *comp)
        # phase colors come back in this phase's compacted order
        cr = cr + outs2[0].reshape(n_flat)[pix2slot]
        cg = cg + outs2[1].reshape(n_flat)[pix2slot]
        cb = cb + outs2[2].reshape(n_flat)[pix2slot]
        rays = rays + jnp.sum(outs2[3])
        if emit:
            flats = [x.reshape(n_flat) for x in outs2[4:]]

    color = jnp.stack([cr[:n_rays], cg[:n_rays], cb[:n_rays]], axis=-1)
    return color, rays.astype(jnp.int32)


def sample_wave(
    ws: WorldArrays,
    cfg: RenderConfig,
    uv,  # (R, 2) in [0, 1], packet-tile order
    active,  # (R,) bool
    camera_params: dict,  # inv_proj/inv_view (4,4), position (3,)
    samp,  # () traced base sample index
    rng_key,  # () RNG stream key
    max_bounces: int,
    interpret: bool = False,
    n_samples: int = 1,
):
    """Trace ``n_samples`` full samples for the whole wave in ONE pallas_call:
    raygen + primary + direct lighting + shadows + bounce loop, samples
    accumulating in-kernel. Only the tiny uv/act tiles cross the XLA<->kernel
    boundary, eliminating the padded-layout glue entirely. Returns
    (color sum over samples (R, 3), rays ())."""
    n_rays = uv.shape[0]
    tiles = [
        _as_tiles(uv[:, 0]),
        _as_tiles(uv[:, 1]),
        _as_tiles(active.astype(jnp.float32)),
    ]
    rows = tiles[0].shape[0]
    pad = (-rows) % PACKET_ROWS
    if pad:
        tiles = [jnp.pad(a, ((0, pad), (0, 0))) for a in tiles]
        rows += pad
    grid = rows // PACKET_ROWS

    cam = _pack_camera(camera_params)  # (9, 4)

    if cfg.rng == "reference":
        # progressive keying for the sin-hash flow: continue the sample index
        # across frames (key = frame). Integer-hash keying exists but 32-bit
        # integer multiplies are ~5x slower than sin under Mosaic (measured —
        # docs/PERFORMANCE.md), so the f32 path is the accumulation default.
        samp_arg = (
            jnp.asarray(samp, jnp.float32)
            + jnp.asarray(rng_key, jnp.float32) * float(cfg.spp)
        ).reshape(1, 1)
    else:
        samp_arg = jnp.asarray(samp, jnp.float32).reshape(1, 1)
    key_arg = jnp.asarray(rng_key, jnp.int32).reshape(1, 1)

    ray_spec = pl.BlockSpec(
        (PACKET_ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    smem_scalar = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    n_lights = int(ws.lights.shape[0])
    # zero-light scenes: the unrolled light loop vanishes (n_lights=0) but the
    # operand must still have at least one row for pallas block mapping
    lights = ws.lights if n_lights else jnp.zeros((1, 8), jnp.float32)
    # past the single-tree VMEM budget the tiered walks are mandatory —
    # wide_nodes would place the full-size inner/leaf tables in VMEM and OOM
    # Mosaic on real chips, so the flag is ignored for tiered scenes
    tiered = bool(ws.tiered)
    if tiered and cfg.wide_nodes:
        log.info(
            "wide_nodes ignored: scene exceeds the single-tree VMEM budget; "
            "using the tiered (HBM-streamed) walks"
        )
    # sample fusion: largest divisor of n_samples <= cfg.sample_fuse (fusing
    # must tile the sample loop exactly)
    fuse = max(1, int(cfg.sample_fuse))
    while n_samples % fuse:
        fuse -= 1
    # multi-pop walks: amortize per-trip overhead on long walks; auto picks
    # N by tree size (see RenderConfig.walk_pop)
    pop_n = _pick_pop_n(ws, cfg)
    kernel = _make_sample_kernel(
        ws.leaf_k, int(ws.materials.shape[0]), n_lights, max_bounces, cfg,
        n_samples=n_samples, tiered=tiered, fuse=fuse, pop_n=pop_n,
    )
    if tiered:
        # top tree in VMEM; treelet blocks stay in HBM (DMA'd by the walks)
        table_operands = (ws.top_table, ws.tre_inner, ws.tre_leaf)
        table_specs = [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ]
        si = int(ws.tre_inner.shape[1])
        sl = int(ws.tre_leaf.shape[1])
        scratch = [
            pltpu.SMEM((STACK_DEPTH,), jnp.int32),
            pltpu.SMEM((STACK_DEPTH,), jnp.int32),
            pltpu.VMEM((si, 128), jnp.float32),
            pltpu.VMEM((sl, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ]
    else:
        wide = cfg.wide_nodes and not tiered
        table_operands = (
            ws.inner8_table if wide else ws.inner_table,
            # wide walks use the permuted wide-leaf table (contiguous leaf
            # rows per wide node); the BVH2 walks keep the original order
            ws.leaf8_table if wide else ws.leaf_table,
        )
        table_specs = [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        scratch = [pltpu.SMEM((STACK_DEPTH,), jnp.int32)]
    f32 = lambda: jax.ShapeDtypeStruct((rows, 128), jnp.float32)
    cr, cg, cb, rays_tile = pl.pallas_call(
        kernel,
        grid=(grid,),
        out_shape=(f32(), f32(), f32(), f32()),
        in_specs=[
            smem_scalar,
            smem_scalar,
        ] + table_specs + [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ] + [ray_spec] * 3,
        out_specs=(ray_spec,) * 4,
        scratch_shapes=scratch,
        # Mosaic's default scoped-VMEM limit is 16 MiB; the fused-sample
        # kernels (sample_fuse > 1) carry fuse x the live wave state and need
        # more. v5e has 128 MiB VMEM per core — leave headroom for the tables
        # and DMA buffers, raise the scoped limit for the kernel body.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(samp_arg, key_arg, *table_operands,
      ws.materials, lights, cam, *tiles)

    color = jnp.stack(
        [cr.reshape(-1)[:n_rays], cg.reshape(-1)[:n_rays],
         cb.reshape(-1)[:n_rays]], axis=-1,
    )
    rays = jnp.sum(rays_tile).astype(jnp.int32)
    return color, rays
