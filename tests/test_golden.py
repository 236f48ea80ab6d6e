"""Golden-image parity with the reference renderer.

BASELINE.json configs 1 and 2: the README 3-sphere scene forward-rendered
in hard-visibility mode must reproduce the reference bit-for-bit after uint8
quantization (float64), and to float32 tolerance on narrower dtypes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from python_ray_tracer_tpu import RenderConfig, render
from python_ray_tracer_tpu.models.scenes import reference_scene
from python_ray_tracer_tpu.utils.image import to_uint8

from .oracle import build_reference_scene, reference_render


def test_small_render_matches_live_reference_f64(reference_modules):
    """240x135 cross-check against the *live* upstream code (unbounded
    recursion): depth 8 leaves residual reflection energy below 1e-6,
    far under the uint8 quantum."""
    w, h = 240, 135
    scene = reference_scene(w, h, dtype=jnp.float64)
    cfg = RenderConfig(max_depth=8, dtype=jnp.float64)
    ours = np.asarray(jax.jit(render, static_argnums=1)(scene, cfg))

    ref_scene = build_reference_scene(reference_modules, w, h)
    ref = reference_render(reference_modules, ref_scene)

    np.testing.assert_array_equal(to_uint8(ours), to_uint8(ref))
    assert np.abs(ours - ref).max() < 1e-6


def test_depth1_runs_and_is_finite():
    """BASELINE config 1: 480x270, depth 1, forward-only."""
    scene = reference_scene(480, 270, dtype=jnp.float32)
    cfg = RenderConfig(max_depth=1, dtype=jnp.float32)
    img = np.asarray(jax.jit(render, static_argnums=1)(scene, cfg))
    assert img.shape == (270, 480, 3)
    assert np.isfinite(img).all()
    assert img.max() > 0.1


def test_full_golden_image_bit_exact_f64(reference_render_png):
    """960x540 render must equal the checked-in reference render.png exactly
    after quantization (ref writer semantics, base.py:143-151)."""
    scene = reference_scene(960, 540, dtype=jnp.float64)
    cfg = RenderConfig(max_depth=6, dtype=jnp.float64)
    ours = to_uint8(np.asarray(jax.jit(render, static_argnums=1)(scene, cfg)))
    np.testing.assert_array_equal(ours, reference_render_png)


def test_full_golden_image_f32_close(reference_render_png):
    """float32 (TPU production dtype) with the hardened intersection path:
    identical to the golden image except for a handful of edge pixels."""
    scene = reference_scene(960, 540, dtype=jnp.float32)
    cfg = RenderConfig(max_depth=6, dtype=jnp.float32)
    ours = to_uint8(np.asarray(jax.jit(render, static_argnums=1)(scene, cfg)))
    diff = np.abs(ours.astype(int) - reference_render_png.astype(int))
    frac_diff = (diff > 1).mean()
    assert frac_diff < 1e-4, f"{(diff > 1).sum()} values differ by >1"


def test_no_ties_in_golden_scene(reference_modules):
    """Our argmin nearest-hit diverges from the reference's sum-over-ties
    only on exact distance ties (base.py:103); assert the golden scene's
    primary rays have none."""
    from python_ray_tracer_tpu.camera import ray_directions
    from python_ray_tracer_tpu.config import faraway
    from python_ray_tracer_tpu.ops.intersect import intersect_all

    scene = reference_scene(480, 270, dtype=jnp.float64)
    dirs = ray_directions(scene.camera, jnp.float64)
    t = np.asarray(
        intersect_all(
            scene.camera.position, dirs, scene.spheres.center, scene.spheres.radius, faraway(jnp.float64)
        ).t
    )
    hit = t.min(axis=1) < faraway(jnp.float64)
    n_at_min = (t == t.min(axis=1, keepdims=True)).sum(axis=1)
    assert (n_at_min[hit] == 1).all()


def test_tie_mode_sum_matches_live_reference(reference_modules):
    """Two IDENTICAL spheres tie exactly on every hit: the reference shades
    both and sums (base.py:103,119).  tie_mode='sum' must reproduce that
    against the live upstream code; tie_mode='first' shades only one."""
    mods = reference_modules
    base, shape, shader, domain = mods["base"], mods["shape"], mods["shader"], mods["domain"]
    V, RGB = base.NumpyVector3D, base.NumpyRGBColor
    w, h = 96, 54
    # sg=0 on both: isolates the double-SHADING semantics; the doubled
    # recursion weight of reflective ties is pinned separately by
    # test_tie_mode_sum_reflective_continuation below.
    mats = [
        (0.8, RGB(0.3, 0.2, 0.1)),
        (0.6, RGB(0.1, 0.3, 0.2)),
    ]
    ref_scene = domain.Scene3D(
        [
            shape.NumpySphere(
                V(0.0, 0.0, 3.0), 1.0,
                shader.NumpyShader(0.0, 0.0, 0.3, 0.0, dg, shader.Texture(col)),
            )
            for dg, col in mats
        ],
        [domain.PointLight(V(-2, 1, 2)), domain.DomeLight(0.1, RGB(1.0, 1.0, 1.0))],
        domain.Camera(V(0, 0.2, -2), w, h),
    )
    ref = reference_render(reference_modules, ref_scene)

    from python_ray_tracer_tpu.scene import build_lights, build_spheres, make_scene, make_sphere_row

    rows = [
        make_sphere_row((0.0, 0.0, 3.0), 1.0, specular_roughness=0.3, diffuse_gain=dg,
                        diffuse_color=(col.x, col.y, col.z))
        for dg, col in mats
    ]
    scene = make_scene(
        build_spheres(rows, dtype=jnp.float64),
        build_lights((-2.0, 1.0, 2.0), domes=[(0.1, (1.0, 1.0, 1.0))], dtype=jnp.float64),
        (0.0, 0.2, -2.0), w, h, dtype=jnp.float64,
    )
    cfg_sum = RenderConfig(max_depth=2, dtype=jnp.float64, tie_mode="sum")
    ours = np.asarray(jax.jit(render, static_argnums=1)(scene, cfg_sum))
    np.testing.assert_array_equal(to_uint8(ours), to_uint8(ref))

    cfg_first = RenderConfig(max_depth=2, dtype=jnp.float64)
    first = np.asarray(jax.jit(render, static_argnums=1)(scene, cfg_first))
    assert (to_uint8(first) != to_uint8(ref)).any()  # single-shaded is dimmer


def test_tie_mode_sum_reflective_continuation(reference_modules):
    """Exact ties on REFLECTIVE spheres: the reference spawns mirror
    recursion for BOTH shaded batches (base.py:103,119 → shader.py:96,152),
    so a tie doubles the continuation weight.  tie_mode='sum' reproduces
    that via a nested trace for the second winner (round 3 — closes the
    last documented divergence).  The backdrop sphere sits BEHIND the
    camera and is visible only in reflections, so the doubled recursion
    weight is exactly what distinguishes the full semantics from the old
    single-continuation approximation."""
    mods = reference_modules
    base, shape, shader, domain = mods["base"], mods["shape"], mods["shader"], mods["domain"]
    V, RGB = base.NumpyVector3D, base.NumpyRGBColor
    w, h = 96, 54
    mats = [  # (specular_gain, diffuse_gain, color) — reflective tied pair
        (0.5, 0.4, (0.3, 0.2, 0.1)),
        (0.5, 0.3, (0.1, 0.3, 0.2)),
    ]
    ref_scene = domain.Scene3D(
        [
            shape.NumpySphere(
                V(0.0, 0.0, 3.0), 1.0,
                shader.NumpyShader(0.0, sg, 0.2, 0.0, dg, shader.Texture(RGB(*col))),
            )
            for sg, dg, col in mats
        ]
        + [
            # bright backdrop, sg=0: terminates the recursion weights
            shape.NumpySphere(
                V(0.0, 0.0, -50.0), 40.0,
                shader.NumpyShader(0.0, 0.0, 0.5, 0.0, 0.9, shader.Texture(RGB(0.9, 0.8, 0.2))),
            )
        ],
        [domain.PointLight(V(-2, 1, 2)), domain.DomeLight(0.1, RGB(1.0, 1.0, 1.0))],
        domain.Camera(V(0, 0.2, -2), w, h),
    )
    ref = reference_render(reference_modules, ref_scene)

    from python_ray_tracer_tpu.scene import build_lights, build_spheres, make_scene, make_sphere_row

    rows = [
        make_sphere_row((0.0, 0.0, 3.0), 1.0, specular_gain=sg, specular_roughness=0.2,
                        diffuse_gain=dg, diffuse_color=col)
        for sg, dg, col in mats
    ] + [
        make_sphere_row((0.0, 0.0, -50.0), 40.0, specular_roughness=0.5,
                        diffuse_gain=0.9, diffuse_color=(0.9, 0.8, 0.2)),
    ]
    scene = make_scene(
        build_spheres(rows, dtype=jnp.float64),
        build_lights((-2.0, 1.0, 2.0), domes=[(0.1, (1.0, 1.0, 1.0))], dtype=jnp.float64),
        (0.0, 0.2, -2.0), w, h, dtype=jnp.float64,
    )
    cfg_sum = RenderConfig(max_depth=2, dtype=jnp.float64, tie_mode="sum")
    ours = np.asarray(jax.jit(render, static_argnums=1)(scene, cfg_sum))
    np.testing.assert_array_equal(to_uint8(ours), to_uint8(ref))


def test_auto_depth_matches_unbounded_reference(reference_modules):
    """max_depth=auto on the README scene reproduces the unbounded-recursion
    reference at uint8 precision, with no hand-picked depth."""
    from python_ray_tracer_tpu.render import auto_max_depth

    w, h = 120, 68
    scene = reference_scene(w, h, dtype=jnp.float64)
    depth = auto_max_depth(scene)
    assert depth >= 6  # sg_max = 1.0 -> g = 0.5 needs several bounces
    cfg = RenderConfig(max_depth=depth, dtype=jnp.float64)
    ours = np.asarray(jax.jit(render, static_argnums=1)(scene, cfg))
    ref_scene = build_reference_scene(reference_modules, w, h)
    ref = reference_render(reference_modules, ref_scene)
    np.testing.assert_array_equal(to_uint8(ours), to_uint8(ref))


def test_auto_depth_high_gain_mirror_scene():
    """A high-gain mirror pair (per-bounce energy factor 0.6) needs a much
    deeper bound than the defaults; auto depth must converge: adding 8 more
    bounces cannot change the uint8 image."""
    from python_ray_tracer_tpu.render import auto_max_depth
    from python_ray_tracer_tpu.scene import build_lights, build_spheres, make_scene, make_sphere_row

    rows = [
        make_sphere_row((-1.05, 0.0, 3.0), 1.0, specular_gain=1.2, specular_roughness=0.05,
                        diffuse_gain=0.2, diffuse_color=(0.9, 0.9, 1.0)),
        make_sphere_row((1.05, 0.0, 3.0), 1.0, specular_gain=1.2, specular_roughness=0.05,
                        diffuse_gain=0.2, diffuse_color=(1.0, 0.9, 0.9)),
    ]
    scene = make_scene(
        build_spheres(rows, dtype=jnp.float64),
        build_lights((0.0, 3.0, 0.0), domes=[(0.1, (1.0, 1.0, 1.0))], dtype=jnp.float64),
        (0.0, 0.0, -2.0), 96, 54, dtype=jnp.float64,
    )
    depth = auto_max_depth(scene)
    assert depth > 12  # g = 0.6: decays far slower than the README scene
    img = np.asarray(jax.jit(render, static_argnums=1)(scene, RenderConfig(max_depth=depth, dtype=jnp.float64)))
    deeper = np.asarray(
        jax.jit(render, static_argnums=1)(scene, RenderConfig(max_depth=depth + 8, dtype=jnp.float64))
    )
    np.testing.assert_array_equal(to_uint8(img), to_uint8(deeper))


def test_multi_dome_light_quirk_matches_live_reference(reference_modules):
    """Two dome lights: intensities accumulate but only the LAST dome's
    color scales the sum (ref shader.py:234-244 quirk) — cross-checked
    against the live upstream code."""
    mods = reference_modules
    base, shape, shader, domain = mods["base"], mods["shape"], mods["shader"], mods["domain"]
    V, RGB = base.NumpyVector3D, base.NumpyRGBColor
    w, h = 96, 54
    ref_scene = domain.Scene3D(
        [
            shape.NumpySphere(
                V(0.0, 0.0, 3), 1.0,
                shader.NumpyShader(0.0, 0.2, 0.3, 0.0, 0.8, shader.Texture(RGB(0.9, 0.4, 0.2))),
            ),
        ],
        [
            domain.PointLight(V(-2, 1, 2)),
            domain.DomeLight(0.2, RGB(1.0, 0.0, 0.0)),
            domain.DomeLight(0.3, RGB(0.2, 0.5, 1.0)),  # last color wins
        ],
        domain.Camera(V(0, 0.2, -2), w, h),
    )
    from .oracle import reference_render

    ref = reference_render(mods, ref_scene)

    from python_ray_tracer_tpu.scene import build_lights, build_spheres, make_scene, make_sphere_row

    rows = [
        make_sphere_row(
            (0.0, 0.0, 3.0), 1.0, specular_gain=0.2, specular_roughness=0.3,
            diffuse_gain=0.8, diffuse_color=(0.9, 0.4, 0.2),
        )
    ]
    scene = make_scene(
        build_spheres(rows, dtype=jnp.float64),
        build_lights((-2.0, 1.0, 2.0), domes=[(0.2, (1.0, 0.0, 0.0)), (0.3, (0.2, 0.5, 1.0))], dtype=jnp.float64),
        (0.0, 0.2, -2.0), w, h, dtype=jnp.float64,
    )
    ours = np.asarray(jax.jit(render, static_argnums=1)(scene, RenderConfig(max_depth=6, dtype=jnp.float64)))
    np.testing.assert_array_equal(to_uint8(ours), to_uint8(ref))
