"""Deforming geometry through the on-device LBVH, end to end (VERDICT r1 #9):
topology rebuilt in-jit each frame, traced by both the XLA walk and the
packet/megakernel path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rayzen_tpu.config import RenderConfig
from rayzen_tpu.deform import render_deforming, world_from_deforming
from rayzen_tpu.light import Light, pack_lights
from rayzen_tpu.material import Material, pack_materials
from rayzen_tpu.ops.traverse import brute_force_world, traverse_world
from rayzen_tpu.camera import Camera


def wavy_grid(g: int, t: float) -> np.ndarray:
    """(2*g*g, 3, 3) triangle grid over [-1,1]^2 with y = 0.3 sin(2x + 3t)."""
    xs = np.linspace(-1.0, 1.0, g + 1)
    zs = np.linspace(-1.0, 1.0, g + 1)

    def p(i, j):
        x, z = xs[i], zs[j]
        return [x, 0.3 * np.sin(2.0 * x + 3.0 * t) * np.cos(z + t), z]

    tris = []
    for i in range(g):
        for j in range(g):
            a, b, c, d = p(i, j), p(i + 1, j), p(i + 1, j + 1), p(i, j + 1)
            tris.append([a, b, c])
            tris.append([a, c, d])
    return np.asarray(tris, dtype=np.float32)


@pytest.fixture(scope="module")
def tables():
    verts = jnp.asarray(wavy_grid(8, 0.0))
    mats = jnp.asarray(pack_materials(
        [Material(albedo=(0.8, 0.3, 0.2), metallic=0.1, roughness=0.5)]
    ))
    lights = jnp.asarray(pack_lights(
        [Light.point((2.0, 4.0, 2.0), power=60.0)]
    ))
    tri_mat = jnp.zeros((verts.shape[0],), jnp.int32)
    return verts, tri_mat, mats, lights


class TestDeformTables:
    def test_xla_walk_matches_brute(self, tables):
        verts, tri_mat, mats, lights = tables
        ws = world_from_deforming(verts, tri_mat, mats, lights)
        rng = np.random.default_rng(0)
        o = jnp.asarray(rng.uniform(-2, 2, (256, 3)).astype(np.float32))
        o = o.at[:, 1].set(2.0)
        d = jnp.asarray(rng.normal(size=(256, 3)).astype(np.float32))
        d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
        act = jnp.ones(256, bool)
        walk = traverse_world(ws, o, d, act)
        brute = brute_force_world(ws, o, d, act)
        np.testing.assert_array_equal(
            np.asarray(walk.found), np.asarray(brute.found)
        )
        f = np.asarray(walk.found)
        assert np.allclose(np.asarray(walk.t)[f], np.asarray(brute.t)[f],
                           rtol=1e-5)

    def test_pallas_kernels_on_deform_tables(self, tables):
        from rayzen_tpu.ops.pallas_traverse import pallas_closest_hit_bvh2

        verts, tri_mat, mats, lights = tables
        ws = world_from_deforming(verts, tri_mat, mats, lights)
        rng = np.random.default_rng(1)
        o = jnp.asarray(rng.uniform(-2, 2, (128, 3)).astype(np.float32))
        o = o.at[:, 1].set(2.0)
        d = jnp.asarray(rng.normal(size=(128, 3)).astype(np.float32))
        d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
        act = jnp.ones(128, bool)
        ref = traverse_world(ws, o, d, act)
        pal = pallas_closest_hit_bvh2(ws, o, d, act, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(ref.tri), np.asarray(pal.tri)
        )


class TestAnimatedSequence:
    def test_in_jit_rebuild_across_frames(self, tables):
        _, tri_mat, mats, lights = tables
        cfg = RenderConfig(width=32, height=24, spp=1, max_bounces=2,
                           kernels="xla")
        cam = Camera(position=np.array([0.0, 1.5, 2.5], np.float32),
                     target=np.array([0.0, -0.5, -0.8], np.float32),
                     aspect_ratio=32 / 24)
        cam_p = {k: jnp.asarray(v) for k, v in cam.device_params().items()}

        fn = jax.jit(
            lambda v, c: render_deforming(v, tri_mat, mats, lights, c, cfg)
        )
        frames = [
            np.asarray(fn(jnp.asarray(wavy_grid(8, t)), cam_p))
            for t in (0.0, 0.7, 1.4)
        ]
        for img in frames:
            assert np.isfinite(img).all()
        # the deforming surface must actually change the image between frames
        assert not np.allclose(frames[0], frames[1])
        assert not np.allclose(frames[1], frames[2])

    def test_megakernel_matches_xla(self, tables):
        verts, tri_mat, mats, lights = tables
        cfg = RenderConfig(width=32, height=24, spp=1, max_bounces=2)
        cam = Camera(position=np.array([0.0, 1.5, 2.5], np.float32),
                     target=np.array([0.0, -0.5, -0.8], np.float32),
                     aspect_ratio=32 / 24)
        cam_p = {k: jnp.asarray(v) for k, v in cam.device_params().items()}
        xla = np.asarray(
            render_deforming(verts, tri_mat, mats, lights, cam_p,
                             cfg.replace(kernels="xla"))
        )
        mega = np.asarray(
            render_deforming(verts, tri_mat, mats, lights, cam_p, cfg)
        )
        assert np.abs(xla - mega).max() < 1e-4


class TestDeformKeying:
    def test_keyed_backend_parity(self, tables):
        """ADVICE r2 (low): kernels="xla" and the megakernel must draw the
        same keyed sample sequence — the XLA branch previously skipped the
        rng_key offset its megakernel twin applies."""
        verts, tri_mat, mats, lights = tables
        cfg = RenderConfig(width=32, height=24, spp=1, max_bounces=2)
        cam = Camera(position=np.array([0.0, 1.5, 2.5], np.float32),
                     target=np.array([0.0, -0.5, -0.8], np.float32),
                     aspect_ratio=32 / 24)
        cam_p = {k: jnp.asarray(v) for k, v in cam.device_params().items()}
        xla = np.asarray(
            render_deforming(verts, tri_mat, mats, lights, cam_p,
                             cfg.replace(kernels="xla"), rng_key=3)
        )
        mega = np.asarray(
            render_deforming(verts, tri_mat, mats, lights, cam_p, cfg,
                             rng_key=3)
        )
        assert np.abs(xla - mega).max() < 1e-4
        # and keying actually changes the image
        xla0 = np.asarray(
            render_deforming(verts, tri_mat, mats, lights, cam_p,
                             cfg.replace(kernels="xla"), rng_key=0)
        )
        # keying must change the drawn sequence; on this tiny matte scene the
        # only keyed effect past the deterministic primary hit is the bounce
        # hemisphere draw, so the image delta is real but small
        assert not np.array_equal(xla, xla0)
