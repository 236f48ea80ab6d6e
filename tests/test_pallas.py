"""Pallas kernel parity (interpreter mode on CPU — SURVEY §5.2's
interpret-mode CI run, catching OOB tile indexing and layout bugs).

The fused kernels must agree with the XLA stable sweep exactly on hit
decisions and to float tolerance on distances, and their custom VJP must
match AD through the XLA path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from python_ray_tracer_tpu import RenderConfig, render
from python_ray_tracer_tpu.config import faraway
from python_ray_tracer_tpu.models.scenes import random_spheres_scene, reference_scene
from python_ray_tracer_tpu.ops.intersect import intersect_all_stable, nearest_hit
from python_ray_tracer_tpu.ops.pallas_intersect import nearest_hit_pallas, shadow_hard_pallas

FAR = faraway(jnp.float32)


def _random_rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = jnp.asarray(rng.uniform(-3, 3, (n, 3)), jnp.float32)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, jnp.asarray(d, jnp.float32)


def _random_spheres(s, seed=1):
    rng = np.random.default_rng(seed)
    c = jnp.asarray(rng.uniform(-4, 4, (s, 3)), jnp.float32)
    r = jnp.asarray(rng.uniform(0.2, 1.5, (s,)), jnp.float32)
    return c, r


@pytest.mark.parametrize("n,s", [(100, 7), (1024, 64), (1500, 33)])
def test_nearest_matches_xla(n, s):
    """Fused nearest-hit == XLA sweep + reduction (incl. ragged padding)."""
    o, d = _random_rays(n)
    c, r = _random_spheres(s)
    ref = nearest_hit(intersect_all_stable(o, d, c, r, FAR).t, FAR)
    got = nearest_hit_pallas(o, d, c, r, FAR, block_rays=256, block_spheres=16, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
    np.testing.assert_array_equal(np.asarray(got.idx), np.asarray(ref.idx))
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t), rtol=1e-5, atol=1e-6)


def test_nearest_giant_sphere_stability():
    """The reference ground sphere (r = 99999) — the f32 cancellation case."""
    scene = reference_scene(64, 36, dtype=jnp.float32)
    from python_ray_tracer_tpu.camera import ray_directions

    d = ray_directions(scene.camera, jnp.float32)
    o = jnp.broadcast_to(scene.camera.position, d.shape)
    c, r = scene.spheres.center, scene.spheres.radius
    ref = nearest_hit(intersect_all_stable(o, d, c, r, FAR).t, FAR)
    got = nearest_hit_pallas(o, d, c, r, FAR, block_rays=512, block_spheres=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.idx), np.asarray(ref.idx))
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t), rtol=1e-4, atol=1e-5)


def test_shadow_matches_xla():
    o, d = _random_rays(512, seed=3)
    c, r = _random_spheres(21, seed=4)
    res = intersect_all_stable(o, d, c, r, FAR)
    near = nearest_hit(res.t, FAR)
    idx = near.idx
    # XLA reference: t_self <= min over others.
    t = np.asarray(res.t)
    n = t.shape[0]
    t_self = t[np.arange(n), np.asarray(idx)]
    t_others = t.copy()
    t_others[np.arange(n), np.asarray(idx)] = np.inf
    expected = (t_self <= t_others.min(axis=1)).astype(np.float32)
    got = shadow_hard_pallas(o, d, c, r, idx, FAR, block_rays=256, block_spheres=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), expected)


def test_full_render_pallas_matches_xla():
    """End-to-end hard render via the fused kernels == XLA path."""
    scene = reference_scene(96, 54, dtype=jnp.float32)
    cfg_x = RenderConfig(max_depth=3, dtype=jnp.float32)
    cfg_p = RenderConfig(max_depth=3, dtype=jnp.float32, use_pallas=True, pallas_interpret=True, block_rays=512)
    exp = np.asarray(render(scene, cfg_x))
    got = np.asarray(render(scene, cfg_p))
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-5)


def test_many_spheres_render():
    """128 spheres routes through the CULLED path, whose sweeps select on
    cheap naive roots (winner t recomputed exactly — pallas_culled.py
    ``_sphere_sol_fast``): a few grazing-incidence pixels legitimately
    differ from the compensated XLA sweep, so the bound is the uint8
    HALF-QUANTUM (2e-3) with a tail allowance rather than float-level."""
    scene = random_spheres_scene(n_spheres=128, width=64, height=36)
    cfg_x = RenderConfig(max_depth=2, dtype=jnp.float32)
    cfg_p = RenderConfig(max_depth=2, dtype=jnp.float32, use_pallas=True, pallas_interpret=True, block_rays=512, block_spheres=32)
    exp = np.asarray(render(scene, cfg_x))
    got = np.asarray(render(scene, cfg_p))
    diff = np.abs(got - exp)
    assert np.quantile(diff, 0.999) < 2e-3
    assert (diff > 1e-2).mean() < 1e-3


def test_nearest_vjp_matches_xla_grad():
    """Custom VJP (implicit-function rule) == AD through the XLA sweep."""
    o, d = _random_rays(256, seed=7)
    c, r = _random_spheres(9, seed=8)

    def loss_pallas(c, r, o, d):
        near = nearest_hit_pallas(o, d, c, r, FAR, block_rays=256, block_spheres=8, interpret=True)
        t = jnp.where(near.hit, near.t, 0.0)
        return jnp.sum(jnp.sin(t))

    def loss_xla(c, r, o, d):
        res = intersect_all_stable(o, d, c, r, FAR)
        near = nearest_hit(res.t, FAR)
        tmin = res.t[jnp.arange(res.t.shape[0]), near.idx]
        t = jnp.where(near.hit, tmin, 0.0)
        return jnp.sum(jnp.sin(t))

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(c, r, o, d)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(c, r, o, d)
    for a, b, name in zip(gp, gx, ("center", "radius", "origin", "dir")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5, err_msg=name)


def test_image_texture_in_fused_kernel(tmp_path):
    """In-kernel equirect sampling (polynomial atan2/asin + blocked one-hot
    texel gather) matches the XLA path's image-texture lookup."""
    import json

    from python_ray_tracer_tpu.io import load_scene
    from python_ray_tracer_tpu.utils.image import save_png

    rng = np.random.default_rng(5)
    tex = rng.uniform(0, 1, (16, 32, 3))
    save_png(tex, tmp_path / "tex.png")
    scene_json = [
        {"type": "Sphere", "centerXYZ": [0.0, 0.0, 3.0], "radius": 1.0,
         "texture": "tex.png", "diffuse_gain": 1.0},
        {"type": "Sphere", "centerXYZ": [-1.2, 0.2, 2.0], "radius": 0.5,
         "colorRGB": [0.9, 0.2, 0.2], "diffuse_gain": 0.8, "specular_gain": 0.4, "roughness": 0.2},
        {"type": "Light", "centerXYZ": [-2.0, 1.0, 2.0], "intensityRGB": [1, 1, 1]},
        {"type": "DomeLight", "intensity": 0.1, "colorRGB": [1, 1, 1]},
    ]
    path = tmp_path / "scene.json"
    path.write_text(json.dumps(scene_json))
    scene = load_scene(path, width=96, height=54, dtype=jnp.float32)

    cfg_x = RenderConfig(max_depth=2, dtype=jnp.float32)
    cfg_p = RenderConfig(max_depth=2, dtype=jnp.float32, use_pallas=True, pallas_interpret=True, block_rays=256)
    exp = np.asarray(render(scene, cfg_x))
    got = np.asarray(render(scene, cfg_p))
    diff = np.abs(got - exp)
    # UV seam texels may round differently between atan2 and the
    # polynomial on isolated lanes; everything else matches tightly.
    assert np.quantile(diff, 0.999) < 1e-3
    assert (diff > 1e-2).mean() < 1e-3


def test_image_texture_hard_sub_kernel(tmp_path):
    """Hard sublane kernel with an image atlas LARGER than the lane
    kernel's 32k-texel in-kernel cap: the external texel gather has no
    size limit.  Must match the XLA sampler."""
    import json

    from python_ray_tracer_tpu.io import load_scene
    from python_ray_tracer_tpu.utils.image import save_png

    rng = np.random.default_rng(9)
    save_png(rng.uniform(0, 1, (128, 512, 3)), tmp_path / "big.png")  # 64k texels
    scene_json = [
        {"type": "Sphere", "centerXYZ": [0.0, 0.0, 3.0], "radius": 1.0,
         "texture": "big.png", "diffuse_gain": 1.0, "specular_gain": 0.2, "roughness": 0.2},
        {"type": "Sphere", "centerXYZ": [-1.2, 0.2, 2.0], "radius": 0.5,
         "colorRGB": [0.9, 0.2, 0.2], "diffuse_gain": 0.8},
        {"type": "Light", "centerXYZ": [-2.0, 1.0, 2.0], "intensityRGB": [1, 1, 1]},
        {"type": "DomeLight", "intensity": 0.1, "colorRGB": [1, 1, 1]},
    ]
    path = tmp_path / "scene.json"
    path.write_text(json.dumps(scene_json))
    scene = load_scene(path, width=96, height=54, dtype=jnp.float32)
    assert scene.texture_atlas.shape[1] * scene.texture_atlas.shape[2] > 32768

    cfg_x = RenderConfig(max_depth=2, dtype=jnp.float32)
    cfg_p = RenderConfig(max_depth=2, dtype=jnp.float32, use_pallas=True, pallas_interpret=True, block_rays=1024)
    exp = np.asarray(render(scene, cfg_x))
    got = np.asarray(render(scene, cfg_p))
    diff = np.abs(got - exp)
    assert np.quantile(diff, 0.999) < 1e-3  # UV-seam lanes may round differently
    assert (diff > 1e-2).mean() < 1e-3


def test_rays_inside_spheres_parity():
    """Rays originating inside spheres (the reference picks the positive
    t1 root, shape.py:44-48): fused kernel == XLA on hit decisions."""
    rng = np.random.default_rng(11)
    c, r = _random_spheres(9, seed=12)
    # origins at sphere centers: always inside sphere k
    o = jnp.asarray(np.asarray(c)[rng.integers(0, 9, 300)] + rng.normal(0, 0.05, (300, 3)), jnp.float32)
    d = rng.normal(size=(300, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d, jnp.float32)
    ref = nearest_hit(intersect_all_stable(o, d, c, r, FAR).t, FAR)
    got = nearest_hit_pallas(o, d, c, r, FAR, block_rays=512, block_spheres=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
    np.testing.assert_array_equal(np.asarray(got.idx), np.asarray(ref.idx))
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t), rtol=1e-4, atol=1e-5)


def test_hard_depth_fused_matches_scan(monkeypatch):
    """The depth-fused hard trace (whole bounce chain in one launch) is
    BITWISE the per-bounce scan route: same _bounce_math per bounce, only
    the launch structure and state residency change.  Deterministic and
    stochastic continuations."""
    import python_ray_tracer_tpu.ops.pallas_bounce_sub as pbs

    scene = reference_scene(64, 36, dtype=jnp.float32)
    for extra in ({}, {"stochastic_roughness": True, "rng_seed": 4}):
        cfg = RenderConfig(max_depth=3, dtype=jnp.float32, use_pallas=True,
                           pallas_interpret=True, block_rays=1024, **extra)
        out = {}
        for mode, cap in (("deep", pbs.MAX_FUSE_DEPTH_HARD), ("scan", 0)):
            monkeypatch.setattr(pbs, "MAX_FUSE_DEPTH_HARD", cap)
            out[mode] = np.asarray(render(scene, cfg))
        np.testing.assert_array_equal(out["deep"], out["scan"], err_msg=str(extra))
