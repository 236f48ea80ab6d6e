"""Fused Pallas kernels inside shard_map (tile parallelism) + remat parity."""

import jax
import jax.numpy as jnp
import numpy as np

from python_ray_tracer_tpu import RenderConfig, render
from python_ray_tracer_tpu.models.scenes import reference_scene
from python_ray_tracer_tpu.optim import make_loss_fn, scene_to_params
from python_ray_tracer_tpu.parallel import make_mesh, render_sharded


def test_pallas_inside_ray_sharding():
    """8-way tile-parallel render through the fused kernels (interpret mode
    on the virtual CPU mesh) == single-device XLA."""
    scene = reference_scene(96, 54, dtype=jnp.float32)
    cfg_x = RenderConfig(max_depth=3, dtype=jnp.float32)
    cfg_p = RenderConfig(max_depth=3, dtype=jnp.float32, use_pallas=True, pallas_interpret=True, block_rays=256)
    exp = np.asarray(jax.jit(render, static_argnums=1)(scene, cfg_x))
    mesh = make_mesh(8, 1)
    got = np.asarray(jax.jit(render_sharded, static_argnums=(1, 2))(scene, cfg_p, mesh))
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-5)


def test_pallas_inside_2d_mesh_rays_x_spheres():
    """Fused hard kernels under BOTH mesh axes: each shard's in-kernel
    sweep reduces its sphere shard; nearest-hit and shadow finish with
    pmin/psum combines (render._combine_nearest_reduced / shadow parts).
    Parity against the single-device XLA path on the (4 rays x 2 spheres)
    virtual mesh."""
    scene = reference_scene(96, 54, dtype=jnp.float32)
    cfg_x = RenderConfig(max_depth=3, dtype=jnp.float32)
    cfg_p = RenderConfig(max_depth=3, dtype=jnp.float32, use_pallas=True, pallas_interpret=True, block_rays=256)
    exp = np.asarray(jax.jit(render, static_argnums=1)(scene, cfg_x))
    mesh = make_mesh(4, 2)
    got = np.asarray(jax.jit(render_sharded, static_argnums=(1, 2))(scene, cfg_p, mesh))
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-5)


def test_pallas_2d_mesh_gradients():
    """Gradients through the sphere-sharded fused sweep (implicit-function
    VJP per shard + psum combine) == single-device XLA gradients."""
    scene = reference_scene(48, 27, dtype=jnp.float32)
    cfg_x = RenderConfig(max_depth=2, dtype=jnp.float32)
    cfg_p = RenderConfig(max_depth=2, dtype=jnp.float32, use_pallas=True, pallas_interpret=True, block_rays=256)
    target = jnp.clip(jnp.asarray(render(scene, cfg_x)), 0.0, 1.0) * 0.9
    params = scene_to_params(scene, sphere_fields=("center", "radius"), light_fields=(), camera=False)
    mesh = make_mesh(2, 2)
    g_x = jax.jit(jax.grad(make_loss_fn(scene, target, cfg_x)))(params)
    g_p = jax.jit(jax.grad(make_loss_fn(scene, target, cfg_p, mesh)))(params)
    for key in g_x:
        a, b = np.asarray(g_x[key]), np.asarray(g_p[key])
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, rtol=5e-3, atol=2e-3 * scale, err_msg=key)


def test_remat_forward_and_grads_match():
    scene = reference_scene(64, 36, dtype=jnp.float32)
    cfg = RenderConfig(max_depth=3, dtype=jnp.float32, visibility="smooth")
    cfg_r = RenderConfig(max_depth=3, dtype=jnp.float32, visibility="smooth", remat=True)
    a = np.asarray(render(scene, cfg))
    b = np.asarray(render(scene, cfg_r))
    np.testing.assert_array_equal(a, b)

    target = jnp.clip(jnp.asarray(a), 0.0, 1.0)
    params = scene_to_params(scene)
    g1 = jax.jit(jax.grad(make_loss_fn(scene, target, cfg)))(params)
    g2 = jax.jit(jax.grad(make_loss_fn(scene, target, cfg_r)))(params)
    for key in g1:
        np.testing.assert_allclose(np.asarray(g2[key]), np.asarray(g1[key]), rtol=1e-4, atol=1e-6, err_msg=key)


def test_fused_smooth_inside_ray_sharding():
    """Smooth + use_pallas under ray sharding: interpret-mode CI now runs
    the REAL fused fwd+bwd kernels inside shard_map (the VMA checker is
    disabled for the interpreter, parallel/sharded.py) — parity and
    gradients must match the single-device XLA reference.

    The target is perturbed off the optimum so gradients have real
    magnitude (at the fixed point every gradient is ~1e-8 roundoff and
    any two float paths disagree by 100%)."""
    scene = reference_scene(64, 36, dtype=jnp.float32)
    cfg_x = RenderConfig(max_depth=2, dtype=jnp.float32, visibility="smooth",
                         edge_sharpness=20.0, shadow_sharpness=20.0)
    cfg_p = RenderConfig(max_depth=2, dtype=jnp.float32, visibility="smooth",
                         edge_sharpness=20.0, shadow_sharpness=20.0,
                         use_pallas=True, pallas_interpret=True, block_rays=256)
    exp = np.asarray(jax.jit(render, static_argnums=1)(scene, cfg_x))
    mesh = make_mesh(8, 1)
    got = np.asarray(jax.jit(render_sharded, static_argnums=(1, 2))(scene, cfg_p, mesh))
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-4)

    target = jnp.clip(jnp.asarray(exp), 0.0, 1.0) * 0.85
    params = scene_to_params(scene)
    g1 = jax.jit(jax.grad(make_loss_fn(scene, target, cfg_x)))(params)
    g2 = jax.jit(jax.grad(make_loss_fn(scene, target, cfg_p, mesh)))(params)
    for key in g1:
        a, b = np.asarray(g1[key]), np.asarray(g2[key])
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, rtol=5e-3, atol=2e-3 * scale, err_msg=key)


def test_culled_kernels_inside_ray_sharding():
    """Big scenes under ray sharding route to the tile-culled kernels
    (trace() dispatch); 2-way tile-parallel culled render == the
    single-device XLA path.  2 shards (not 8): each shard pads its rays
    to the 4096-ray cull tile, and with 8 shards of a small test frame
    the padded lanes would dominate the numerics of nothing — 2 shards
    keep real rays in every tile while still exercising vma plumbing."""
    from python_ray_tracer_tpu.models.scenes import random_spheres_scene

    scene = random_spheres_scene(n_spheres=256, width=128, height=72)
    cfg_x = RenderConfig(max_depth=2, dtype=jnp.float32)
    cfg_p = RenderConfig(max_depth=2, dtype=jnp.float32, use_pallas=True,
                         pallas_interpret=True, block_rays=512)
    exp = np.asarray(jax.jit(render, static_argnums=1)(scene, cfg_x))
    mesh = make_mesh(2, 1)
    got = np.asarray(jax.jit(render_sharded, static_argnums=(1, 2))(scene, cfg_p, mesh))
    diff = np.abs(got - exp)
    assert np.quantile(diff, 0.999) < 2e-3
    assert (diff > 1e-2).mean() < 1e-3


def test_smooth_parts_sphere_sharding():
    """SMOOTH visibility under SPHERE sharding through the per-shard
    partial kernels (ops/pallas_smooth_parts): the per-shard in-kernel
    reductions + collective combines replace the (N, S_local) XLA tables.
    Forward parity and gradients vs the single-device XLA smooth path,
    on (rays x spheres) meshes, deterministic and stochastic."""
    from python_ray_tracer_tpu.models.scenes import inverse_task_scene

    scene = inverse_task_scene(n_spheres=24, width=48, height=27)
    for extra in ({}, {"stochastic_roughness": True, "rng_seed": 6}):
        cfg_x = RenderConfig(max_depth=2, dtype=jnp.float32, visibility="smooth", **extra)
        cfg_k = RenderConfig(max_depth=2, dtype=jnp.float32, visibility="smooth",
                             use_pallas=True, pallas_interpret=True, block_rays=512, **extra)
        exp = np.asarray(jax.jit(render, static_argnums=1)(scene, cfg_x))
        for shape in ((1, 2), (2, 4)):
            mesh = make_mesh(*shape)
            got = np.asarray(jax.jit(render_sharded, static_argnums=(1, 2))(scene, cfg_k, mesh))
            diff = np.abs(got - exp)
            assert np.quantile(diff, 0.999) < 2e-4, (extra, shape)
            assert (diff > 1e-2).mean() < 1e-3, (extra, shape)

    cfg_x = RenderConfig(max_depth=2, dtype=jnp.float32, visibility="smooth")
    cfg_k = RenderConfig(max_depth=2, dtype=jnp.float32, visibility="smooth",
                         use_pallas=True, pallas_interpret=True, block_rays=512)
    target = jnp.clip(jnp.asarray(render(scene, cfg_x)), 0.0, 1.0) * 0.9
    params = scene_to_params(scene)
    g_x = jax.jit(jax.grad(make_loss_fn(scene, target, cfg_x)))(params)
    mesh = make_mesh(2, 4)
    g_k = jax.jit(jax.grad(make_loss_fn(scene, target, cfg_k, mesh)))(params)
    for key in g_x:
        a, b = np.asarray(g_x[key]), np.asarray(g_k[key])
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, rtol=5e-3, atol=2e-3 * scale, err_msg=key)
