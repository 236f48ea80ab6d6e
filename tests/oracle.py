"""Helpers that drive the upstream NumPy reference as a test oracle."""

from __future__ import annotations

import sys

import numpy as np


def build_reference_scene(mods, width: int, height: int):
    """The main.py demo scene (ref main.py:13-51) at an arbitrary resolution."""
    base, shape, shader, domain = mods["base"], mods["shape"], mods["shader"], mods["domain"]
    V, RGB = base.NumpyVector3D, base.NumpyRGBColor
    return domain.Scene3D(
        [
            shape.NumpySphere(
                V(0.55, 0.5, 3),
                1.0,
                shader.NumpyShader(0.0, 0, 0.01, 0, 0.0, shader.Texture(RGB(1, 1, 1))),
            ),
            shape.NumpySphere(
                V(-0.45, 0.1, 1),
                0.4,
                shader.NumpyShader(0, 1, 0.1, 0.0, 0.0, shader.Texture(RGB(1, 0, 0))),
            ),
            shape.NumpySphere(
                V(0, -99999.5, 0),
                99999,
                shader.NumpyShader(0.0, 0.1, 0.5, 0.0, 1.0, shader.TextureChecker()),
            ),
        ],
        [domain.PointLight(V(-2, 1, 2)), domain.DomeLight(0.1, RGB(1, 1, 1))],
        domain.Camera(V(0, 0.2, -2), width, height),
    )


def reference_render(mods, scene) -> np.ndarray:
    """Run the reference pipeline, returning the unquantized (H, W, 3) image."""
    sys.setrecursionlimit(200000)
    renderer = mods["base"].NumpyRenderer()
    dirs = renderer.get_ray_directions(scene.camera)
    color = renderer.raytrace_scene(scene.camera.position, dirs, scene)
    h, w = scene.camera.height, scene.camera.width
    return np.stack([np.asarray(c).reshape(h, w) for c in color.components()], axis=-1)
