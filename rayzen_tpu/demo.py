"""The reference demo scene, reproduced (RayZen/src/main.cpp:327-392).

Camera at (0,0,3) looking down -z with 70° FOV; 5 materials (red matte, green
metallic, mirror, tinted glass, rough); a point light at (5,5,5) power 300 and a
directional light (0.8,1.4,0.3) power 2; 7 objects: a scaled floor cube, four
monkeys (one mirror, one glass), a cube-slot object whose mesh fails to load in
the reference (missing car.obj — kept here as an intentionally empty mesh to
preserve that robustness path), and a glass monkey.

Geometry is procedural (self-contained repo): the reference's cube.obj is a unit
cube (identical topology) and Suzanne stands in as a deformed icosphere with a
similar triangle count (~1.3k vs 968). Pass ``obj_dir`` to load real cube.obj /
monkey.obj / car.obj assets instead, exercising the OBJ loader exactly like the
reference does.
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


def _load_or(proc_fn, obj_dir, obj_name, material_index):
    if obj_dir:
        return Mesh.load_from_obj(os.path.join(obj_dir, obj_name), material_index)
    return proc_fn(material_index)


def build_demo_scene(
    width: int = 800, height: int = 600, obj_dir: str | None = None
) -> Scene:
    scene = Scene()
    scene.camera = demo_camera(width, height)
    scene.materials = demo_materials()
    scene.lights = demo_lights()

    monkey = lambda m: procedural.blob(m, subdivisions=3)
    floor_mesh = _load_or(procedural.cube, obj_dir, "cube.obj", 0)
    monkey_a = _load_or(monkey, obj_dir, "monkey.obj", 1)
    monkey_b = _load_or(monkey, obj_dir, "monkey.obj", 2)
    # "car.obj" is missing in the reference checkout; the loader returns an
    # empty mesh and the scene keeps the instance (main.cpp:371, :183-188).
    car = (
        Mesh.load_from_obj(os.path.join(obj_dir, "car.obj"), 0)
        if obj_dir
        else Mesh()
    )
    monkey_c = _load_or(monkey, obj_dir, "monkey.obj", 0)
    monkey_d = _load_or(monkey, obj_dir, "monkey.obj", 0)
    glass_monkey = _load_or(monkey, obj_dir, "monkey.obj", 3)

    go = scene.game_objects.append
    # main.cpp:380-386 (glm::translate(glm::scale(...)) post-multiplies)
    go(GameObject(floor_mesh, tf.translate(tf.scale(tf.identity(), (8.0, 0.5, 8.0)), (0.0, -3.0, 0.0)), "floor"))
    go(GameObject(monkey_a, tf.translate(tf.identity(), (-4.0, 0.0, 0.0)), "monkey A"))
    go(GameObject(monkey_b, tf.translate(tf.identity(), (4.0, 0.0, 0.0)), "monkey B"))
    go(GameObject(car, tf.translate(tf.identity(), (0.0, 0.0, 0.0)), "car"))
    go(GameObject(monkey_c, tf.translate(tf.identity(), (0.0, 0.0, -4.0)), "monkey C"))
    go(GameObject(monkey_d, tf.translate(tf.identity(), (0.0, 0.0, 4.0)), "monkey D"))
    go(GameObject(glass_monkey, tf.translate(tf.scale(tf.identity(), 1.2), (2.5, 0.8, 2.5)), "glass monkey"))
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
