"""Persistent ray buckets: the last unpriced reordering idea (VERDICT r4
item 8).  CPU probe — order math only, no kernels.

The hard culled path re-sorts whole _SORT_G-ray groups before every
reflected bounce (argsort over group keys + one interleaved block
gather); finer granularity would cut sweep work (the g8 quality curve is
−16%, benchmarks/colsort_stats.py) but per-ray/g8 gathers are
row-count-bound and overtake the savings.  "Persistent buckets" proposes
keeping bucket membership ACROSS bounces and only moving rays whose
bucket changed — if few rays move, fine granularity becomes affordable.

This probe measures the premise: replay config 4's bounce chain and
count, per reflected bounce, the fraction of LIVE rays whose sort key
(the 25-bit origin-cell × direction-bin key) is UNCHANGED from the
previous bounce.  Rays with changed keys must move no matter how the
structure is phrased; if most live rays change keys every bounce (they
bounced — origin jumps to the hit point, direction to the mirror), the
incremental structure degenerates to the full re-sort plus bucket
bookkeeping, and the idea is closed.

    python benchmarks/bucket_persist_probe.py [--depth 4] [--spheres 1024]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from python_ray_tracer_tpu import RenderConfig  # noqa: E402
from python_ray_tracer_tpu.camera import ray_directions_t  # noqa: E402
from python_ray_tracer_tpu.models.scenes import random_spheres_scene  # noqa: E402
from python_ray_tracer_tpu.ops.pallas_culled import _SUBLANES, ray_sort_keys  # noqa: E402

DEAD_THR = 2e-4
NUDGE = 1e-3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--spheres", type=int, default=1024)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    args = ap.parse_args()

    scene = random_spheres_scene(
        n_spheres=args.spheres, width=args.width, height=args.height, dtype=jnp.float32
    )
    cfg = RenderConfig(max_depth=args.depth, dtype=jnp.float32)
    dirs_t = ray_directions_t(scene.camera, jnp.float32, None)
    block = max(cfg.block_rays, 4 * _SUBLANES * 128)
    n = dirs_t.shape[1]
    n_pad = -(-n // block) * block
    d0 = np.concatenate(
        [np.asarray(dirs_t), np.broadcast_to(np.asarray(dirs_t)[:, :1], (3, n_pad - n))], 1
    )
    o0 = np.broadcast_to(np.asarray(scene.camera.position)[:, None], d0.shape)

    center = jnp.asarray(scene.spheres.center, jnp.float32)
    radius = jnp.asarray(scene.spheres.radius, jnp.float32)
    s_cheap = scene.spheres.count - scene.spheres.n_exact
    sg = jnp.asarray(scene.spheres.specular_gain, jnp.float32)
    cc, rc = center[:s_cheap], radius[:s_cheap]
    bb_lo = jnp.min(cc - rc[:, None], axis=0)
    bb_hi = jnp.max(cc + rc[:, None], axis=0)

    @jax.jit
    def sweep(o_t, d_t):
        oc = o_t[:, None, :] - center.T[:, :, None]
        b = jnp.sum(d_t[:, None, :] * oc, axis=0)
        c = jnp.sum(oc * oc, axis=0) - (radius**2)[:, None]
        disc = b * b - c
        t = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
        t = jnp.where((disc > 0) & (t > 1e-3), t, 3e38)
        tmin = jnp.min(t, axis=0)
        idx = jnp.argmin(t, axis=0)
        hit = tmin < 3e38
        t_safe = jnp.where(hit, tmin, 1.0)
        c_w = jnp.take(center, idx, axis=0).T
        r_w = jnp.take(radius, idx)
        p = o_t + d_t * t_safe
        normal = (p - c_w) / r_w
        p_n = p + normal * NUDGE
        ddn = 2.0 * jnp.sum(d_t * normal, axis=0)
        refl = d_t - normal * ddn
        refl = refl / jnp.linalg.norm(refl, axis=0, keepdims=True)
        return p_n, refl, hit, 0.5 * jnp.take(sg, idx)

    o_t, d_t = jnp.asarray(o0), jnp.asarray(d0)
    thr = np.ones(n_pad, np.float32)
    prev_keys = None
    rows = []
    for b in range(args.depth):
        live = thr > DEAD_THR
        keys = np.asarray(
            ray_sort_keys(o_t, d_t, jnp.asarray(live), bb_lo, bb_hi)
        ) & ((1 << 24) - 1)  # strip the dead bit: bucket identity only
        if prev_keys is not None:
            n_live = max(int(live.sum()), 1)
            same = float(((keys == prev_keys) & live).sum() / n_live)
            # also: fraction keeping just their ORIGIN cell (coarser
            # persistence a hierarchical bucket could exploit)
            same_cell = float(
                (((keys >> 12) == (prev_keys >> 12)) & live).sum() / n_live
            )
            rows.append({
                "bounce": b,
                "live_frac": round(float(live.mean()), 4),
                "key_unchanged_of_live": round(same, 4),
                "cell_unchanged_of_live": round(same_cell, 4),
            })
        prev_keys = keys
        p_n, refl, hit, gain = sweep(o_t, d_t)
        thr = thr * np.where(np.asarray(hit), np.asarray(gain), 0.0)
        o_t, d_t = p_n, refl

    print(json.dumps({  # noqa: T201
        "bench": "bucket_persistence",
        "n_spheres": args.spheres,
        "res": f"{args.width}x{args.height}",
        "per_bounce": rows,
    }), flush=True)


if __name__ == "__main__":
    main()
