"""CPU probe: how much would MARGIN-RELAXED interval culling cut the
blocked SMOOTH training sweeps? (Round-5 candidate lever.)

Key fact making this exact rather than approximate: the smooth kernels'
occlusion factor is ``sig(sharp*disc) * sig(sharp*sol)`` with
``disc = b^2 - 4c = 4*(r^2 - dist^2(line, center))``.  For any sphere
with ``disc < -90/sharp`` the sigmoid is <= sig(-90) ~ 8e-40, so
``clear *= (1 - occl)`` rounds to EXACTLY 1.0f and a missed-lane
coverage weight is < 1e-38 — adding it to the accumulator changes
nothing in float32.  Culling spheres outside ``disc > -m`` therefore
changes neither image nor gradients beyond ~1e-38 absolute.  And
``disc > -m  <=>  dist^2 < r^2 + m/4`` — the EXISTING conservative
interval test (`pallas_culled.interval_hit_mask`) with the radius
inflated to ``sqrt(r^2 + m/4)``.

This probe measures, for config-5-class scenes at the blocked mode's
8192-ray tiles (horizontal image bands): the fraction of the sphere
table a margin-culled sweep would touch, for bounce-0 nearest rays,
bounce-0 shadow rays (light-apex cone), and bounce-1 mirror rays
(expected ~full: no re-sort inside the fused train kernel).

Usage: python benchmarks/smooth_cull_probe.py [sharp] [spheres ...]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from python_ray_tracer_tpu.camera import ray_directions_t  # noqa: E402
from python_ray_tracer_tpu.models.scenes import inverse_task_scene  # noqa: E402
from python_ray_tracer_tpu.ops.pallas_culled import (  # noqa: E402
    _tile_bounds, interval_hit_mask, pack_tiles,
)
from python_ray_tracer_tpu.ops.pallas_intersect import _round_up  # noqa: E402

# Ray-tile size the probe models.  Intentionally pinned to the PRE-flip
# 8192-ray blocked-mode floor (the production _BLK_MIN_BLOCK_RAYS dropped to
# 4096 in round 4): the recorded candidate fractions in docs/PERF.md were
# measured at 8192-ray tiles.  Halving the tile roughly halves each tile's
# spatial footprint, which can only LOWER candidate fractions — re-run with
# BLOCK = 4096 to re-price the negative result at the production geometry.
BLOCK = 8192
W, H = 256, 144


def tile_frac(o3, d3, center, radius_eff, b_cols):
    o_lo, o_hi = _tile_bounds(o3, b_cols)
    d_lo, d_hi = _tile_bounds(d3, b_cols)
    mask = interval_hit_mask(o_lo, o_hi, d_lo, d_hi, center, radius_eff)
    return float(mask.mean())


def main() -> None:
    sharp = float(sys.argv[1]) if len(sys.argv) > 1 else 200.0
    counts = [int(a) for a in sys.argv[2:]] or [64, 256, 1024, 2048]
    margin = 90.0 / sharp  # disc units; sig(-90) rounds all products away
    b_cols = BLOCK // 8

    for s in counts:
        scene = inverse_task_scene(n_spheres=s, width=W, height=H)
        dtype = jnp.float32
        center = jnp.asarray(scene.spheres.center, dtype)
        radius = jnp.asarray(scene.spheres.radius, dtype)
        r_eff = jnp.sqrt(radius * radius + margin / 4.0)
        cam = jnp.asarray(scene.camera.position, dtype)
        light = jnp.asarray(scene.lights.point_position, dtype)  # shadow-ray targets

        d_t = ray_directions_t(scene.camera, dtype)  # (3, N)
        n = d_t.shape[1]
        n_pad = _round_up(n, BLOCK)
        if n_pad != n:
            d_t = jnp.concatenate([d_t, jnp.broadcast_to(d_t[:, :1], (3, n_pad - n))], axis=1)
        o_t = jnp.broadcast_to(cam[:, None], (3, n_pad))
        o3 = pack_tiles(o_t, b_cols)
        d3 = pack_tiles(d_t, b_cols)
        frac_b0 = tile_frac(o3, d3, center, r_eff, b_cols)

        # Bounce-0 hits -> shadow rays and mirror rays (XLA, exact enough
        # for a fraction probe: plain quadratic nearest-hit).
        oc = o_t.T[:, None, :] - center[None, :, :]  # (N, S, 3)
        d_n = d_t.T  # (N, 3)
        b = 2.0 * jnp.einsum("nc,nsc->ns", d_n, oc)
        c_term = jnp.sum(oc * oc, axis=-1) - (radius * radius)[None, :]
        disc = b * b - 4.0 * c_term
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t0 = 0.5 * (-b - sq)
        t1 = 0.5 * (-b + sq)
        t_sel = jnp.where((t0 > 0) & (t0 < t1), t0, t1)
        t_hit = jnp.where((disc > 0) & (t_sel > 0), t_sel, 1e30)
        tmin = jnp.min(t_hit, axis=1)
        idx = jnp.argmin(t_hit, axis=1)
        hit = tmin < 1e30
        p = d_n * jnp.where(hit, tmin, 1.0)[:, None] + o_t.T
        nrm = (p - center[idx]) / radius[idx][:, None]
        p_n = p + nrm * 1e-4

        lv = light[None, :] - p_n
        to_light = lv / jnp.linalg.norm(lv, axis=1, keepdims=True)
        o3s = pack_tiles(p_n.T, b_cols)
        d3s = pack_tiles(to_light.T, b_cols)
        # Shadow rays: same relaxed-radius interval test (the light-apex
        # refinement would only tighten this; this is the upper bound).
        frac_sh = tile_frac(o3s, d3s, center, r_eff, b_cols)

        ddn = jnp.sum(d_n * nrm, axis=1, keepdims=True)
        refl = d_n - 2.0 * ddn * nrm
        refl = refl / jnp.linalg.norm(refl, axis=1, keepdims=True)
        o3r = pack_tiles(p_n.T, b_cols)
        d3r = pack_tiles(refl.T, b_cols)
        frac_b1 = tile_frac(o3r, d3r, center, r_eff, b_cols)

        print(json.dumps({  # noqa: T201
            "probe": "smooth_cull", "spheres": s, "sharp": sharp,
            "margin_disc": round(margin, 4),
            "nearest_frac_b0": round(frac_b0, 4),
            "shadow_frac_b0": round(frac_sh, 4),
            "mirror_frac_b1": round(frac_b1, 4),
            "hit_frac": round(float(hit.mean()), 4),
        }))


if __name__ == "__main__":
    main()
