"""Culled SMOOTH kernels: the differentiable acceleration structure.

The candidate-culled smooth path (ops/pallas_culled_smooth.py) must match
the unculled blocked smooth kernels essentially bitwise — culling is EXACT
by the sigmoid-underflow margin contract (radius inflated to
sqrt(r^2 + m/4), behind-clauses widened by m = 90/sharpness) — and match
``jax.grad`` of the XLA smooth path within the usual kernel tolerances.
Everything runs in Pallas interpret mode on CPU.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from python_ray_tracer_tpu import RenderConfig, render
from python_ray_tracer_tpu.camera import ray_directions
from python_ray_tracer_tpu.models.scenes import inverse_task_scene
from python_ray_tracer_tpu.ops.pallas_bounce_smooth_sub import trace_fused_smooth_sub
from python_ray_tracer_tpu.ops.pallas_culled_smooth import (
    cull_smooth_ok,
    trace_culled_smooth,
)
from python_ray_tracer_tpu.optim import combine, make_loss_fn, scene_to_params
from python_ray_tracer_tpu.render import fused_train_l2_ok, trace

W, H = 96, 54


def _cfgs(sharp=200.0, depth=2):
    base = dict(max_depth=depth, dtype=jnp.float32, visibility="smooth",
                edge_sharpness=sharp, shadow_sharpness=sharp)
    cfg_x = RenderConfig(**base)
    cfg_p = RenderConfig(**base, use_pallas=True, pallas_interpret=True, block_rays=512)
    return cfg_x, cfg_p


@pytest.fixture(scope="module")
def scene128():
    return inverse_task_scene(n_spheres=128, width=W, height=H, dtype=jnp.float32)


def _mkloss(fn, scene, cfg, dirs, tgt):
    def loss(p):
        sc = combine(p, scene)
        img = fn(sc.camera.position, dirs, sc, cfg)
        return jnp.mean((jnp.clip(img, 0.0, 1.0) - tgt) ** 2)

    return loss


@pytest.mark.parametrize("sharp,depth", [(200.0, 2), (20.0, 3)])
def test_culled_matches_blocked_forward_and_grad(scene128, sharp, depth):
    """Culled smooth == unculled blocked smooth, forward near-bitwise and
    gradients to float accumulation order, at production sharpness (real
    culling) and the soft test sharpness (everything a candidate)."""
    scene = scene128
    cfg_x, cfg_p = _cfgs(sharp, depth)
    dirs = ray_directions(scene.camera, jnp.float32, None)
    a = np.asarray(trace_fused_smooth_sub(scene.camera.position, dirs, scene, cfg_p))
    b = np.asarray(trace_culled_smooth(scene.camera.position, dirs, scene, cfg_p))
    np.testing.assert_allclose(b, a, atol=1e-6)

    tgt = jnp.clip(trace(scene.camera.position, dirs, scene, cfg_x), 0.0, 1.0) * 0.9
    params = scene_to_params(scene)
    g_b = jax.jit(jax.grad(_mkloss(trace_fused_smooth_sub, scene, cfg_p, dirs, tgt)))(params)
    g_c = jax.jit(jax.grad(_mkloss(trace_culled_smooth, scene, cfg_p, dirs, tgt)))(params)
    for key in g_b:
        ga, gc = np.asarray(g_b[key]), np.asarray(g_c[key])
        scale = max(np.abs(ga).max(), 1e-9)
        np.testing.assert_allclose(gc, ga, rtol=1e-4, atol=1e-4 * scale, err_msg=key)


def test_culled_matches_xla_grad(scene128):
    """Gradient parity vs jax.grad of the XLA smooth path, every leaf."""
    scene = scene128
    cfg_x, cfg_p = _cfgs()
    dirs = ray_directions(scene.camera, jnp.float32, None)
    tgt = jnp.clip(trace(scene.camera.position, dirs, scene, cfg_x), 0.0, 1.0) * 0.9
    params = scene_to_params(scene)
    g_x = jax.jit(jax.grad(_mkloss(trace, scene, cfg_x, dirs, tgt)))(params)
    g_c = jax.jit(jax.grad(_mkloss(trace_culled_smooth, scene, cfg_p, dirs, tgt)))(params)
    for key in g_x:
        a, c = np.asarray(g_x[key]), np.asarray(g_c[key])
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(c, a, rtol=5e-3, atol=2e-3 * scale, err_msg=key)


def test_culled_smooth_atlas():
    """Image textures through the culled path: external texel gather, and
    the atlas param leaf's scatter-add gradient survives culling."""
    from python_ray_tracer_tpu.scene import TEXTURE_IMAGE

    rng = np.random.default_rng(9)
    scene = inverse_task_scene(n_spheres=128, width=W, height=H, dtype=jnp.float32)
    atlas = jnp.asarray(rng.uniform(0.1, 1.0, (2, 8, 16, 3)), jnp.float32)
    kind = np.array(scene.spheres.texture_kind)
    tid = np.array(scene.spheres.texture_id)
    kind[::3] = TEXTURE_IMAGE
    tid[::3] = np.arange(len(tid[::3])) % 2
    scene = dataclasses.replace(
        scene,
        spheres=dataclasses.replace(
            scene.spheres,
            texture_kind=jnp.asarray(kind),
            texture_id=jnp.asarray(tid),
        ),
        texture_atlas=atlas,
        texture_hw=jnp.asarray([[8, 16], [8, 16]], jnp.int32),
    )
    cfg_x, cfg_p = _cfgs()
    dirs = ray_directions(scene.camera, jnp.float32, None)
    a = np.asarray(trace_fused_smooth_sub(scene.camera.position, dirs, scene, cfg_p))
    b = np.asarray(trace_culled_smooth(scene.camera.position, dirs, scene, cfg_p))
    np.testing.assert_allclose(b, a, atol=1e-6)

    tgt = jnp.clip(trace(scene.camera.position, dirs, scene, cfg_x), 0.0, 1.0) * 0.9
    params = scene_to_params(scene, atlas=True)
    g_b = jax.jit(jax.grad(_mkloss(trace_fused_smooth_sub, scene, cfg_p, dirs, tgt)))(params)
    g_c = jax.jit(jax.grad(_mkloss(trace_culled_smooth, scene, cfg_p, dirs, tgt)))(params)
    for key in g_b:
        ga, gc = np.asarray(g_b[key]), np.asarray(g_c[key])
        scale = max(np.abs(ga).max(), 1e-9)
        np.testing.assert_allclose(gc, ga, rtol=1e-4, atol=1e-4 * scale, err_msg=key)
    assert (np.abs(np.asarray(g_c["textures.atlas"])) > 0).sum() > 10


def test_culled_stochastic_matches_blocked(scene128):
    """Stochastic glossy roughness through the culled path == the unculled
    blocked path for the same seed (the xi draw follows the rays through
    the accumulated group sorts), forward and gradient."""
    scene = scene128
    base = dict(max_depth=3, dtype=jnp.float32, visibility="smooth",
                edge_sharpness=20.0, shadow_sharpness=20.0,
                stochastic_roughness=True, rng_seed=7)
    cfg_p = RenderConfig(**base, use_pallas=True, pallas_interpret=True, block_rays=512)
    cfg_x = RenderConfig(**base)
    from python_ray_tracer_tpu.ops.rng import fold_seed, seed_root

    key = fold_seed(fold_seed(seed_root(cfg_p.rng_seed), 0), 4)
    dirs = ray_directions(scene.camera, jnp.float32, None)

    def blk(pos, d, sc, cfg):
        return trace_fused_smooth_sub(pos, d, sc, cfg, key=key)

    def cul(pos, d, sc, cfg):
        return trace_culled_smooth(pos, d, sc, cfg, key=key)

    a = np.asarray(blk(scene.camera.position, dirs, scene, cfg_p))
    b = np.asarray(cul(scene.camera.position, dirs, scene, cfg_p))
    np.testing.assert_allclose(b, a, atol=1e-6)

    tgt = jnp.clip(trace(scene.camera.position, dirs, scene, cfg_x, key=key), 0.0, 1.0) * 0.9
    params = scene_to_params(scene)
    g_b = jax.jit(jax.grad(_mkloss(blk, scene, cfg_p, dirs, tgt)))(params)
    g_c = jax.jit(jax.grad(_mkloss(cul, scene, cfg_p, dirs, tgt)))(params)
    for keyname in g_b:
        ga, gc = np.asarray(g_b[keyname]), np.asarray(g_c[keyname])
        scale = max(np.abs(ga).max(), 1e-9)
        np.testing.assert_allclose(gc, ga, rtol=1e-4, atol=1e-4 * scale, err_msg=keyname)


def test_routing_gates():
    """Routing: big scenes at big frames leave the single-launch train
    kernel for the culled path; small frames / small scenes / stochastic
    keep their existing routes."""
    big = inverse_task_scene(n_spheres=128, width=1280, height=720, dtype=jnp.float32)
    small_frame = inverse_task_scene(n_spheres=128, width=256, height=144, dtype=jnp.float32)
    small_scene = inverse_task_scene(n_spheres=64, width=1280, height=720, dtype=jnp.float32)
    cfg = RenderConfig(max_depth=3, dtype=jnp.float32, visibility="smooth", use_pallas=True)
    assert cull_smooth_ok(big, cfg, 1280 * 720)
    assert not cull_smooth_ok(small_frame, cfg, 256 * 144)
    assert not cull_smooth_ok(small_scene, cfg, 1280 * 720)
    stoch = dataclasses.replace(cfg, stochastic_roughness=True)
    import python_ray_tracer_tpu.ops.pallas_culled_smooth as cs

    # Stochastic: routed iff the hardware-validation flip is on (the
    # kernels themselves are parity-pinned by the direct-call test).
    assert cull_smooth_ok(big, stoch, 1280 * 720) == cs.CULL_SMOOTH_STOCHASTIC
    # fused_train_l2_ok yields to the culled route exactly where it applies
    assert not fused_train_l2_ok(big, cfg)
    assert fused_train_l2_ok(small_frame, cfg)


def test_render_routes_through_culled(monkeypatch):
    """End-to-end: render() on an eligible scene+cfg actually takes the
    culled path (spy on trace_culled_smooth) and matches the XLA image."""
    import python_ray_tracer_tpu.ops.pallas_culled_smooth as cs

    # Shrink the ray threshold so a CPU-sized frame routes through.
    monkeypatch.setattr(cs, "MIN_CULL_SMOOTH_RAYS", W * H)
    calls = {}
    real = cs.trace_culled_smooth

    def spy(*a, **k):
        calls["hit"] = True
        return real(*a, **k)

    monkeypatch.setattr(cs, "trace_culled_smooth", spy)
    scene = inverse_task_scene(n_spheres=128, width=W, height=H, dtype=jnp.float32)
    cfg_x, cfg_p = _cfgs()
    a = np.asarray(render(scene, cfg_x))
    b = np.asarray(render(scene, cfg_p))
    assert calls.get("hit"), "render() did not route through the culled smooth path"
    diff = np.abs(b - a)
    assert np.quantile(diff, 0.999) < 2e-4
    assert (diff > 1e-3).mean() < 1e-3


def test_nearest_list_keeps_behind_piercing_sphere():
    """The smooth NEAREST list is a pure line test (both_nappes=True): a
    sphere entirely BEHIND the rays whose line they pierce must stay a
    candidate, because the miss-lane argmax-disc fallback races over ALL
    spheres (the r5 480x270 parity bug).  The forward-only test (hard
    path / shadow behind-clauses) still culls it."""
    from python_ray_tracer_tpu.ops.pallas_culled import candidate_lists

    b_cols = 64
    o3 = jnp.zeros((3, 8, b_cols), jnp.float32)
    d3 = jnp.zeros((3, 8, b_cols), jnp.float32).at[2].set(1.0)  # all +z
    center = jnp.asarray([[0.0, 0.0, -5.0]], jnp.float32)  # behind, on the line
    radius = jnp.asarray([0.5], jnp.float32)
    _, cnt_f, _ = candidate_lists(o3, d3, center, radius, b_cols, t_margin=0.45)
    _, cnt_b, _ = candidate_lists(
        o3, d3, center, radius, b_cols, t_margin=0.45, both_nappes=True
    )
    assert int(cnt_f[0, 0]) == 0, "forward-only test should cull the behind sphere"
    assert int(cnt_b[0, 0]) == 1, "both_nappes must keep the behind sphere"


def test_fallback_parity_behind_sphere_scene():
    """End-to-end pin of the r5 fallback bug: a behind-the-camera sphere
    with the largest disc (line pierced, coverage exactly 0) plus a
    front near-miss inside the disc margin (coverage > 0).  The blocked
    sweep's miss-lane fallback picks the behind sphere and renders
    nothing; a forward-only culled list would pick the near-miss and
    render something.  Culled must match blocked exactly."""
    from python_ray_tracer_tpu.scene import build_lights, build_spheres, make_scene

    rows = [
        # Behind the camera (camera z=5, rays point -z): line pierced.
        dict(center=(0.0, 0.25, 9.0), radius=1.0),
        # Front near-miss band: line distance in (r, sqrt(r^2 + m/4)).
        dict(center=(0.56, 0.25, -2.0), radius=0.5),
        dict(center=(-0.56, 0.25, -2.0), radius=0.5),
        # A real hit so the scene isn't empty light.
        dict(center=(0.0, 0.25, -6.0), radius=0.8),
    ]
    from python_ray_tracer_tpu.scene import make_sphere_row

    spheres = build_spheres(
        [make_sphere_row(diffuse_gain=1.0, specular_gain=0.4, **r) for r in rows],
        jnp.float32,
    )
    lights = build_lights((4.0, 6.0, 6.0), [(0.4, (0.6, 0.7, 0.9))], jnp.float32)
    scene = make_scene(spheres, lights, (0.0, 0.25, 5.0), 64, 36, dtype=jnp.float32)
    cfg = RenderConfig(
        max_depth=2, dtype=jnp.float32, visibility="smooth",
        edge_sharpness=200.0, shadow_sharpness=200.0,
        use_pallas=True, pallas_interpret=True, block_rays=512,
    )
    dirs = ray_directions(scene.camera, jnp.float32, None)
    a = np.asarray(trace_fused_smooth_sub(scene.camera.position, dirs, scene, cfg))
    b = np.asarray(trace_culled_smooth(scene.camera.position, dirs, scene, cfg))
    np.testing.assert_allclose(b, a, atol=1e-6)
