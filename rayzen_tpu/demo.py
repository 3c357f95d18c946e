"""The reference demo scene, reproduced (RayZen/src/main.cpp:327-392).

Camera at (0,0,3) looking down -z with 70° FOV; 5 materials (red matte, green
metallic, mirror, tinted glass, rough); a point light at (5,5,5) power 300 and a
directional light (0.8,1.4,0.3) power 2; 7 objects: a scaled floor cube, four
monkeys (one mirror, one glass), a cube-slot object whose mesh fails to load in
the reference (missing car.obj — kept here as an intentionally empty mesh to
preserve that robustness path), and a glass monkey.

Geometry defaults to the reference's actual OBJ assets (assets/meshes: the
8-vertex cube and the 968-face Suzanne, loaded through the OBJ parser exactly
like the reference does at main.cpp:368-374). Unlike the reference — which
re-loads monkey.obj per GameObject just to stamp a different material — the
five Suzannes share ONE Mesh (one BLAS build) and recolor via
GameObject.material_override. Pass ``obj_dir`` to load assets from elsewhere;
pass ``obj_dir=""`` (or delete the assets) to fall back to procedural stand-in
geometry (a deformed icosphere "blob" of similar triangle count).
"""

from __future__ import annotations

import os

import numpy as np

from . import procedural
from . import transforms as tf
from .camera import Camera
from .light import Light
from .material import Material
from .mesh import Mesh
from .scene import GameObject, Scene


def demo_materials():
    """main.cpp:342-353."""
    return [
        Material((0.8, 0.3, 0.3), 0.0, 1.0, 0.0, 0.0, 1.5),  # 0: red matte
        Material((0.1, 0.7, 0.1), 1.0, 0.35, 0.3, 0.0, 1.5),  # 1: green metallic
        Material((1.0, 1.0, 1.0), 1.0, 0.05, 1.0, 0.0, 1.5),  # 2: mirror
        Material((0.85, 0.95, 1.0), 0.0, 0.02, 0.05, 0.94, 1.5),  # 3: glass
        Material((0.6, 0.4, 0.2), 0.0, 0.9, 0.2, 0.0, 1.5),  # 4: rough
    ]


def demo_lights():
    """main.cpp:356-357."""
    return [
        Light.point((5.0, 5.0, 5.0), (1.0, 1.0, 1.0), 300.0),
        Light.directional((0.8, 1.4, 0.3), (1.0, 1.0, 1.0), 2.0),
    ]


def demo_camera(width: int = 800, height: int = 600) -> Camera:
    """main.cpp:331-339."""
    return Camera(
        position=np.array([0.0, 0.0, 3.0], np.float32),
        target=np.array([0.0, 0.0, -1.0], np.float32),
        up=np.array([0.0, 1.0, 0.0], np.float32),
        fov=70.0,
        aspect_ratio=width / height,
        near_clip=0.1,
        far_clip=100.0,
    )


ASSET_DIR = os.path.normpath(
    os.path.join(os.path.dirname(__file__), "..", "assets", "meshes")
)


def default_obj_dir() -> str | None:
    """The checked-in reference mesh assets, if present."""
    if os.path.exists(os.path.join(ASSET_DIR, "monkey.obj")):
        return ASSET_DIR
    return None


def build_demo_scene(
    width: int = 800, height: int = 600, obj_dir: str | None = None
) -> Scene:
    if obj_dir is None:
        obj_dir = default_obj_dir()
    scene = Scene()
    scene.camera = demo_camera(width, height)
    scene.materials = demo_materials()
    scene.lights = demo_lights()

    if obj_dir:
        floor_mesh = Mesh.load_from_obj(os.path.join(obj_dir, "cube.obj"), 0)
        monkey_mesh = Mesh.load_from_obj(os.path.join(obj_dir, "monkey.obj"), 0)
        # "car.obj" is missing in the reference checkout; the loader returns an
        # empty mesh and the scene keeps the instance (main.cpp:371, :183-188)
        car = Mesh.load_from_obj(os.path.join(obj_dir, "car.obj"), 0)
    else:  # procedural fallback (self-contained, similar triangle counts)
        floor_mesh = procedural.cube(0)
        monkey_mesh = procedural.blob(0, subdivisions=3)
        car = Mesh()

    go = scene.game_objects.append
    # main.cpp:380-386 (glm::translate(glm::scale(...)) post-multiplies);
    # materials per object from main.cpp:368-374, as instance overrides
    go(GameObject(floor_mesh, tf.translate(tf.scale(tf.identity(), (8.0, 0.5, 8.0)), (0.0, -3.0, 0.0)), "floor", material_override=0))
    go(GameObject(monkey_mesh, tf.translate(tf.identity(), (-4.0, 0.0, 0.0)), "monkey A", material_override=1))
    go(GameObject(monkey_mesh, tf.translate(tf.identity(), (4.0, 0.0, 0.0)), "monkey B", material_override=2))
    go(GameObject(car, tf.translate(tf.identity(), (0.0, 0.0, 0.0)), "car"))
    go(GameObject(monkey_mesh, tf.translate(tf.identity(), (0.0, 0.0, -4.0)), "monkey C", material_override=0))
    go(GameObject(monkey_mesh, tf.translate(tf.identity(), (0.0, 0.0, 4.0)), "monkey D", material_override=0))
    go(GameObject(monkey_mesh, tf.translate(tf.scale(tf.identity(), 1.2), (2.5, 0.8, 2.5)), "glass monkey", material_override=3))
    return scene


def build_small_scene(width: int = 64, height: int = 64) -> Scene:
    """A tiny deterministic scene for tests: floor + icosphere + cube, one point
    light + one directional light, all four material archetypes reachable."""
    scene = Scene()
    scene.camera = demo_camera(width, height)
    scene.materials = demo_materials()
    scene.lights = demo_lights()
    floor_mesh = procedural.cube(0)
    ball = procedural.icosphere(1, subdivisions=1)
    mirror_ball = procedural.icosphere(2, subdivisions=1)
    glass_cube = procedural.cube(3, half_extent=0.6)
    go = scene.game_objects.append
    go(GameObject(floor_mesh, tf.translate(tf.scale(tf.identity(), (8.0, 0.5, 8.0)), (0.0, -3.0, 0.0)), "floor"))
    go(GameObject(ball, tf.translate(tf.identity(), (-1.2, 0.0, 0.0)), "ball"))
    go(GameObject(mirror_ball, tf.translate(tf.identity(), (1.2, 0.0, 0.0)), "mirror"))
    go(GameObject(glass_cube, tf.translate(tf.identity(), (0.0, -0.3, 1.0)), "glass"))
    return scene
