"""The renderer: pure function ``(scene, cfg) -> image``.

TPU-first redesign of the reference's render path:

* the unbounded mutual recursion ``raytrace_scene -> Shader.create ->
  _calculate_reflection -> raytrace_scene``
  (``/root/reference/ray_tracer/infrastructure/numpy/base.py:91-121`` /
  ``shader.py:143-161``, measured depth 56) becomes a fixed-depth
  ``lax.scan`` carrying ``(origin, direction, throughput, alive, accum)``,
* extract/place stream compaction (``base.py:15-25,66-79,106-119``) becomes
  masked lanes: every lane computes every bounce, dead lanes are multiplied
  away (SURVEY §3.7) — static shapes, fully fusable by XLA,
* the per-shape Python loops (``base.py:97,102``; ``shader.py:126``) become
  dense (N rays × S spheres) sweeps with a nearest-hit reduction
  (:mod:`.ops.intersect`), optionally the fused Pallas kernel.

Visibility modes:

* ``hard`` replicates the reference's step functions exactly (strict
  ``disc > 0 & t > 0`` hits, shadow = "this sphere is the nearest hit along
  the light ray", ``shader.py:114-128``),
* ``smooth`` relaxes hit coverage and shadow occlusion with sigmoids so
  silhouette and shadow edges carry gradients (the differentiable-rendering
  upgrade BASELINE.json config 3 mandates; the reference is forward-only).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from .camera import ray_directions
from .config import RenderConfig, VISIBILITY_SMOOTH
from .ops.intersect import intersect_all, intersect_all_stable, nearest_hit
from .ops.shading import NUDGE, LaneMaterial, gather_material, shade
from .ops.vecmath import normalize, reflect
from .scene import Scene


def _sweep(origin: jax.Array, direction: jax.Array, scene: Scene, cfg: RenderConfig):
    """All-spheres intersection sweep, Pallas or XLA."""
    if cfg.use_pallas:
        from .ops.pallas_intersect import intersect_all_pallas

        return intersect_all_pallas(origin, direction, scene.spheres.center, scene.spheres.radius, cfg.faraway)
    sweep = intersect_all_stable if cfg.stable_intersect else intersect_all
    return sweep(origin, direction, scene.spheres.center, scene.spheres.radius, cfg.faraway)


def _soft_cover(sol: jax.Array, disc: jax.Array, sharpness: float) -> jax.Array:
    """Soft "this quadratic has a positive root" in [0, 1].

    ``sigmoid(k*disc) * sigmoid(k*sol)`` → the hard ``disc > 0 & sol > 0``
    as ``k → ∞`` (the strict inequalities of ``shape.py:50``).
    """
    return jax.nn.sigmoid(sharpness * disc) * jax.nn.sigmoid(sharpness * sol)


def _shadow_visibility(
    point: jax.Array,  # (N, 3) nudged origin
    to_light: jax.Array,  # (N, 3) unit dir
    idx: jax.Array,  # (N,) nearest sphere per lane
    scene: Scene,
    cfg: RenderConfig,
) -> jax.Array:
    """Shadow test, ref ``shader.py:114-128``.

    Hard: lit iff the lane's own sphere is the nearest hit along the shadow
    ray (the self-hit sits at FARAWAY when the path is clear, so equality
    holds on a clear path).  Smooth: product over *other* spheres of
    (1 - soft occlusion).
    """
    res = _sweep(point, to_light, scene, cfg)
    n = point.shape[0]
    if cfg.visibility == VISIBILITY_SMOOTH:
        occl = _soft_cover(res.sol, res.disc, cfg.shadow_sharpness)  # (N, S)
        not_self = jnp.arange(res.t.shape[1], dtype=jnp.int32)[None, :] != idx[:, None]
        clear = jnp.prod(jnp.where(not_self, 1.0 - occl, jnp.ones_like(occl)), axis=1)
        return clear.astype(point.dtype)
    tmin = jnp.min(res.t, axis=1)
    t_self = res.t[jnp.arange(n), idx]
    return (t_self == tmin).astype(point.dtype)


def trace(
    origin: jax.Array,  # (N, 3) or (3,)
    direction: jax.Array,  # (N, 3) unit
    scene: Scene,
    cfg: RenderConfig,
) -> jax.Array:
    """Trace N rays to ``cfg.max_depth`` bounces; returns (N, 3) color.

    Misses contribute black (ref ``base.py:100``: color starts at (0,0,0)
    and only hit lanes are placed back).
    """
    dtype = cfg.dtype
    direction = jnp.asarray(direction, dtype)
    n = direction.shape[0]
    origin = jnp.broadcast_to(jnp.asarray(origin, dtype), direction.shape)
    cam_pos = jnp.asarray(scene.camera.position, dtype)
    light_pos = jnp.asarray(scene.lights.point_position, dtype)

    def bounce(carry, _):
        o, d, throughput, alive, accum = carry

        res = _sweep(o, d, scene, cfg)
        near = nearest_hit(res.t, cfg.faraway)

        smooth = cfg.visibility == VISIBILITY_SMOOTH
        if smooth:
            # For lanes that miss everything, attribute coverage (and its
            # gradient) to the sphere whose discriminant came closest.
            idx = jnp.where(near.hit, near.idx, jnp.argmax(res.disc, axis=1).astype(jnp.int32))
            cover_all = _soft_cover(res.sol, res.disc, cfg.edge_sharpness)
            coverage = cover_all[jnp.arange(n), idx] * alive
        else:
            idx = near.idx
            coverage = near.hit.astype(dtype) * alive

        # Sanitize t so dead lanes stay finite (masked-lane contract).
        t_safe = jnp.where(near.hit, near.t, jnp.ones_like(near.t))
        mat: LaneMaterial = gather_material(scene.spheres, idx)

        p = o + d * t_safe[:, None]  # shader.py:73
        normal = (p - mat.center) * (1.0 / mat.radius)[:, None]  # shader.py:74
        to_light = normalize(light_pos[None, :] - p)  # shader.py:75
        to_camera = normalize(cam_pos[None, :] - p)  # shader.py:76 — ORIGINAL camera, every bounce
        p_nudged = p + normal * NUDGE  # shader.py:77

        in_light = _shadow_visibility(p_nudged, to_light, idx, scene, cfg)
        local = shade(p, normal, to_light, to_camera, in_light, mat, scene)

        accum = accum + local.color * (throughput * coverage)[:, None]
        throughput = throughput * coverage * local.refl_coeff
        alive = coverage if smooth else (alive * near.hit.astype(dtype))

        o_next = p_nudged
        d_next = reflect(d, normal)  # shader.py:151
        return (o_next, d_next, throughput, alive, accum), None

    init = (
        origin,
        direction,
        jnp.ones((n,), dtype),
        jnp.ones((n,), dtype),
        jnp.zeros((n, 3), dtype),
    )
    (_, _, _, _, accum), _ = jax.lax.scan(bounce, init, None, length=cfg.max_depth)
    return accum


def render(scene: Scene, cfg: RenderConfig) -> jax.Array:
    """Render the scene to an (H, W, 3) float image (unclipped).

    The full pipeline of ``application.py:43-52``: camera ray generation →
    trace → (quantization lives in :mod:`.utils.image`).
    """
    dirs = ray_directions(scene.camera, cfg.dtype)
    color = trace(scene.camera.position, dirs, scene, cfg)
    return color.reshape(scene.camera.height, scene.camera.width, 3)


_render_jit = jax.jit(render, static_argnums=1)


def render_jit(scene: Scene, cfg: RenderConfig) -> jax.Array:
    """Jitted :func:`render` with a persistent compilation cache."""
    return _render_jit(scene, cfg)
