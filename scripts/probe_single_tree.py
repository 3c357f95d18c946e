"""Probe: how big a single-tree (all tables VMEM-resident) scene can the
megakernel handle now that the Mosaic scoped-VMEM limit is raised to 100 MB
(ops/megakernel.py pallas_call compiler_params)? The 45k-tri chunk budget and
the 3.5 MB single-tree table budget both derive from the old 16 MB limit.

Builds Suzanne fields of increasing size, forces the single-tree path
(tiered="off", chunk budget ignored by rendering directly), renders 320x180
on the device, times min-of-3 and reports Mrays/s + table bytes.

Usage: python scripts/probe_single_tree.py [n_inst ...]
"""

import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from rayzen_tpu.cache import setup_compile_cache
from rayzen_tpu.camera import Camera
from rayzen_tpu.config import RenderConfig
from rayzen_tpu.demo import ASSET_DIR
from rayzen_tpu.integrator import render_radiance_with_stats
from rayzen_tpu.light import Light
from rayzen_tpu.material import Material
from rayzen_tpu.mesh import Mesh
from rayzen_tpu.packing import pack_scene, single_tree_table_bytes
from rayzen_tpu.scene import GameObject, Scene
from rayzen_tpu.transforms import rotation, translation

setup_compile_cache(".rayzen_cache/xla")

W, H, SPP = 320, 180, 4


def field(n):
    monkey = Mesh.load_from_obj(os.path.join(ASSET_DIR, "monkey.obj"), 0)
    side = int(math.ceil(math.sqrt(n)))
    objs = [
        GameObject(
            mesh=monkey,
            transform=translation(
                (2.2 * (i % side - side / 2), 0.0, -2.2 * (i // side))
            ) @ rotation(math.radians((i * 37.0) % 360.0), (0.0, 1.0, 0.0)),
            material_override=i % 3,
        )
        for i in range(n)
    ]
    return Scene(
        camera=Camera(
            position=np.array([0.0, 6.0, 8.0], np.float32),
            target=np.array([0.0, -0.45, -0.89], np.float32),
            aspect_ratio=W / H,
        ),
        materials=[
            Material(albedo=(0.8, 0.2, 0.2), metallic=0.1, roughness=0.4),
            Material(albedo=(0.2, 0.8, 0.3), metallic=0.9, roughness=0.25),
            Material(albedo=(0.9, 0.9, 0.9), metallic=1.0, roughness=0.05,
                     reflectivity=1.0),
        ],
        lights=[
            Light(position_or_direction=(5.0, 10.0, 5.0, 1.0),
                  color=(1.0, 1.0, 1.0), power=300.0),
            Light(position_or_direction=(0.8, 1.4, 0.3, 0.0),
                  color=(1.0, 1.0, 1.0), power=2.0),
        ],
        game_objects=objs,
    )


for n in [int(a) for a in sys.argv[1:]] or [50, 100, 200, 350, 520]:
    scene = field(n)
    cfg = RenderConfig(width=W, height=H, spp=SPP, max_bounces=5,
                       tiered="off")
    try:
        arrays = pack_scene(scene, cfg)
        tb = single_tree_table_bytes(
            int(arrays.bvh2_child_node.shape[0]),
            int(arrays.bvh2_leaf_node.shape[0]), cfg.leaf_size)
        cam = {k: jnp.asarray(v)
               for k, v in scene.camera.device_params().items()}
        fn = jax.jit(lambda a, c: render_radiance_with_stats(a, c, cfg))
        t0 = time.perf_counter()
        img, rays = fn(arrays, cam)
        np.asarray(img)
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            img, rays = fn(arrays, cam)
            np.asarray(img)
            best = min(best, time.perf_counter() - t0)
        mrays = int(rays) / best / 1e6
        print(f"n={n:4d} tris={scene.num_triangles:7d} "
              f"tables={tb / 2**20:6.1f} MB  compile={compile_s:5.1f}s  "
              f"{best / SPP * 1e3:7.1f} ms/sample  {mrays:6.1f} Mrays/s",
              flush=True)
    except Exception as e:
        print(f"n={n:4d}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
