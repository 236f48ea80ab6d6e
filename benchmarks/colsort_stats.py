"""Would per-bounce IN-ROW per-ray re-sorting un-freeze group membership
enough to matter?  CPU probe — no kernels, order math only.

Production re-sorts frozen 64-ray groups globally before each reflected
bounce (per-ray re-sorting is priced out by XLA gather economics —
docs/PERF.md).  But `pack_tiles` maps each packed SUBLANE ROW to 512
CONSECUTIVE flat rays, and a Mosaic lane gather permutes each sublane
row independently (`take_along_axis(axis=1)` with per-row indices —
benchmarks/gather_probe.py).  So a cheap Pallas pass could re-sort rays
PER-RAY within every consecutive 512-ray segment after the global group
sort: bound-group membership (eight 64-ray runs per row) refreshed at
ray granularity each bounce instead of frozen-at-primary.

This probe replays config 4's mirror-bounce chain with full XLA sweeps,
then simulates the candidate-list quality of each ordering policy:

  g64          production: global 64-ray-group sort per bounce
  g64+row512   production + per-ray sort within 512-ray segments
  g8           global 8-ray-group sort (what finer XLA block sorts buy)
  per_ray      true global per-ray sort (the unaffordable upper bound)

    python benchmarks/colsort_stats.py [--depth 4] [--spheres 1024]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from python_ray_tracer_tpu import RenderConfig
from python_ray_tracer_tpu.camera import ray_directions_t
from python_ray_tracer_tpu.models.scenes import random_spheres_scene
from python_ray_tracer_tpu.ops.pallas_culled import (
    _SUBLANES, candidate_lists, pack_tiles, ray_sort_keys,
)

DEAD_THR = 2e-4
NUDGE = 1e-3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--spheres", type=int, default=1024)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument(
        "--policies", type=str, default="g64,g64+row512,g8,per_ray",
        help="comma list: gN, gN+row512, per_ray",
    )
    args = ap.parse_args()

    scene = random_spheres_scene(
        n_spheres=args.spheres, width=args.width, height=args.height, dtype=jnp.float32
    )
    cfg = RenderConfig(max_depth=args.depth, dtype=jnp.float32)
    dirs_t = ray_directions_t(scene.camera, jnp.float32, None)
    block = max(cfg.block_rays, 4 * _SUBLANES * 128)
    b_cols = block // _SUBLANES
    n = dirs_t.shape[1]
    n_pad = -(-n // block) * block
    d0 = np.concatenate([np.asarray(dirs_t), np.broadcast_to(np.asarray(dirs_t)[:, :1], (3, n_pad - n))], 1)
    o0 = np.broadcast_to(np.asarray(scene.camera.position)[:, None], d0.shape)

    center = jnp.asarray(scene.spheres.center, jnp.float32)
    radius = jnp.asarray(scene.spheres.radius, jnp.float32)
    s_cheap = scene.spheres.count - scene.spheres.n_exact
    sg = jnp.asarray(scene.spheres.specular_gain, jnp.float32)
    light = np.asarray(scene.lights.point_position, np.float32)

    cc, rc = center[:s_cheap], radius[:s_cheap]
    bb_lo = jnp.min(cc - rc[:, None], axis=0)
    bb_hi = jnp.max(cc + rc[:, None], axis=0)

    @jax.jit
    def sweep(o_t, d_t):
        """Full nearest sweep -> (p_n, refl, hit, gain) in flat ray order."""
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

    # Replay the chain ONCE in flat (unsorted) ray order; orderings are
    # then pure permutation bookkeeping on these arrays.
    chain = []  # per bounce: dict(o, d, thr, p_n shadow origin, valid)
    o_t, d_t = jnp.asarray(o0), jnp.asarray(d0)
    thr = np.ones(n_pad, np.float32)
    for b in range(args.depth):
        p_n, refl, hit, gain = (np.asarray(x) for x in sweep(o_t, d_t))
        chain.append({
            "o": np.asarray(o_t), "d": np.asarray(d_t), "thr": thr,
            "p_n": p_n, "hit": hit,
        })
        thr = thr * np.where(hit, gain, 0.0)
        o_t, d_t = jnp.asarray(p_n), jnp.asarray(refl)

    def nearest_work(o_f, d_f, lv):
        o3 = pack_tiles(jnp.asarray(o_f), b_cols)
        d3 = pack_tiles(jnp.asarray(d_f), b_cols)
        valid = pack_tiles(jnp.asarray(lv, jnp.float32)[None], b_cols)[0] > 0
        cand, cnt, cnt_f = candidate_lists(o3, d3, cc, rc, b_cols, valid=valid)
        t = np.asarray(valid).reshape(_SUBLANES, -1, b_cols)
        tile_live = t.max(axis=(0, 2)) > 0
        cnt_np = np.asarray(cnt)[0] + np.asarray(cnt_f)[0]
        return float((cnt_np * tile_live).sum() / (len(cnt_np) * s_cheap))

    def shadow_work(p_n, to_l, lv):
        o3 = pack_tiles(jnp.asarray(p_n), b_cols)
        d3 = pack_tiles(jnp.asarray(to_l), b_cols)
        valid = pack_tiles(jnp.asarray(lv, jnp.float32)[None], b_cols)[0] > 0
        cand, cnt, cnt_f = candidate_lists(
            o3, d3, cc, rc, b_cols, valid=valid, light=jnp.asarray(light)
        )
        t = np.asarray(valid).reshape(_SUBLANES, -1, b_cols)
        tile_live = t.max(axis=(0, 2)) > 0
        cnt_np = np.asarray(cnt)[0] + np.asarray(cnt_f)[0]
        return float((cnt_np * tile_live).sum() / (len(cnt_np) * s_cheap))

    def centroid_keys(o_f, d_f, lv_f, g):
        ng = n_pad // g
        lg = lv_f.reshape(ng, g)
        w = np.maximum(lg.sum(axis=1), 1.0)
        oc = (o_f.reshape(3, ng, g) * lg).sum(axis=2) / w
        dc = (d_f.reshape(3, ng, g) * lg).sum(axis=2) / w
        return np.asarray(ray_sort_keys(
            jnp.asarray(oc), jnp.asarray(dc), jnp.asarray(lg.any(axis=1)), bb_lo, bb_hi
        ))

    def apply_group_perm(pi, gperm, g):
        return pi.reshape(-1, g)[gperm].reshape(-1)

    policies = tuple(args.policies.split(","))
    results = {p: {"nearest": [], "shadow": []} for p in policies}
    pis = {p: np.arange(n_pad) for p in policies}

    # bounce 0 (primary, scanline order) is common to all policies
    b0 = chain[0]
    lv0 = (b0["thr"] > DEAD_THR)
    nw = nearest_work(b0["o"], b0["d"], lv0)
    to_l = light[:, None] - b0["p_n"]
    to_l = to_l / np.linalg.norm(to_l, axis=0, keepdims=True)
    sw = shadow_work(b0["p_n"], to_l, lv0 & b0["hit"])
    for p in policies:
        results[p]["nearest"].append(round(nw, 4))
        results[p]["shadow"].append(round(sw, 4))

    for b in range(1, args.depth):
        st = chain[b]
        for p in policies:
            pi = pis[p]
            o_f, d_f = st["o"][:, pi], st["d"][:, pi]
            lv_f = (st["thr"][pi] > DEAD_THR).astype(np.float32)
            if p == "per_ray":
                keys = np.asarray(ray_sort_keys(
                    jnp.asarray(o_f), jnp.asarray(d_f),
                    jnp.asarray(lv_f > 0), bb_lo, bb_hi,
                ))
                pi = pi[np.argsort(keys, kind="stable")]
            else:
                g = int(p.split("+")[0][1:])
                gperm = np.argsort(centroid_keys(o_f, d_f, lv_f, g), kind="stable")
                pi = apply_group_perm(pi, gperm, g)
                if p.endswith("+row512"):
                    # in-row refinement: per consecutive 512-ray segment
                    # (one packed sublane row), sort rays per-ray
                    o_f, d_f = st["o"][:, pi], st["d"][:, pi]
                    lv_f = st["thr"][pi] > DEAD_THR
                    keys = np.asarray(ray_sort_keys(
                        jnp.asarray(o_f), jnp.asarray(d_f),
                        jnp.asarray(lv_f), bb_lo, bb_hi,
                    )).reshape(-1, b_cols)
                    order = np.argsort(keys, axis=1, kind="stable")  # (rows, 512)
                    pi = np.take_along_axis(pi.reshape(keys.shape), order, axis=1).reshape(-1)
            pis[p] = pi
            o_f, d_f = st["o"][:, pi], st["d"][:, pi]
            lv = st["thr"][pi] > DEAD_THR
            results[p]["nearest"].append(round(nearest_work(o_f, d_f, lv), 4))
            p_s = st["p_n"][:, pi]
            to_l = light[:, None] - p_s
            to_l = to_l / np.linalg.norm(to_l, axis=0, keepdims=True)
            results[p]["shadow"].append(round(shadow_work(p_s, to_l, lv & st["hit"][pi]), 4))

    for p in policies:
        tot = sum(results[p]["nearest"]) + sum(results[p]["shadow"])
        print(json.dumps({  # noqa: T201
            "policy": p, "nearest_frac_per_bounce": results[p]["nearest"],
            "shadow_frac_per_bounce": results[p]["shadow"],
            "total_sweep_work": round(tot, 4),
        }), flush=True)


if __name__ == "__main__":
    main()
