"""Culling quality of sphere-BLOCK granularity vs per-sphere candidates.

The per-sphere candidate lists (pallas_culled.py) pay a per-bounce
argsort over (T, S) plus (T, MAX_CAND, 21) gathers.  The alternative:
Morton-sort the spheres ONCE per scene into contiguous blocks of K,
bound each block by a sphere, and interval-test tiles against B = S/K
block bounds — no argsort, no gathers, contiguous SMEM sweeps inside a
passing block.  This probe measures the price: sweep work fraction at
block granularity across tile sizes, on config-4's bounce-1 rays
(post-sort, the production configuration).
"""

from __future__ import annotations

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
    _SUBLANES, _tile_bounds, interval_hit_mask, pack_tiles, ray_sort_keys,
)

W, H, S = 1920, 1080, 1024


def morton_order(center, bb_lo, bb_hi, bits=10):
    """Morton (z-curve) rank of each sphere center — groups near spheres."""
    q = np.clip(
        ((center - bb_lo) / np.maximum(bb_hi - bb_lo, 1e-6) * ((1 << bits) - 1)),
        0,
        (1 << bits) - 1,
    ).astype(np.uint64)

    def spread(v):
        out = np.zeros_like(v)
        for b in range(bits):
            out |= ((v >> b) & 1) << (3 * b)
        return out

    code = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
    return np.argsort(code, kind="stable")


def main():
    scene = random_spheres_scene(n_spheres=S, width=W, height=H, dtype=jnp.float32)
    cfg = RenderConfig(max_depth=4, dtype=jnp.float32)
    dirs_t = ray_directions_t(scene.camera, jnp.float32, None)
    n = dirs_t.shape[1]

    center = np.asarray(scene.spheres.center, np.float32)
    radius = np.asarray(scene.spheres.radius, np.float32)
    s_cheap = scene.spheres.count - scene.spheres.n_exact
    cc, rc = center[:s_cheap], radius[:s_cheap]
    sg = jnp.asarray(scene.spheres.specular_gain, jnp.float32)
    bb_lo = (cc - rc[:, None]).min(0)
    bb_hi = (cc + rc[:, None]).max(0)

    # --- bounce-0 replication (full sweep + mirror), as in sort_cull_stats
    cj, rj = jnp.asarray(center), jnp.asarray(radius)

    @jax.jit
    def bounce0(o_t, d_t):
        oc = o_t[:, None, :] - cj.T[:, :, None]
        b = jnp.sum(d_t[:, None, :] * oc, axis=0)
        c = jnp.sum(oc * oc, axis=0) - (rj**2)[:, None]
        disc = b * b - c
        t = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
        t = jnp.where((disc > 0) & (t > 1e-3), t, 3e38)
        tmin = jnp.min(t, axis=0)
        idx = jnp.argmin(t, axis=0)
        hit = tmin < 3e38
        t_safe = jnp.where(hit, tmin, 1.0)
        c_w = jnp.take(cj, idx, axis=0).T
        r_w = jnp.take(rj, idx)
        p = o_t + d_t * t_safe
        normal = (p - c_w) / r_w
        p_n = p + normal * 1e-3
        ddn = 2.0 * jnp.sum(d_t * normal, axis=0)
        refl = d_t - normal * ddn
        refl = refl / jnp.linalg.norm(refl, axis=0, keepdims=True)
        thr = jnp.where(hit, 0.5 * jnp.take(sg, idx), 0.0)
        return p_n, refl, thr

    n_pad = -(-n // 4096) * 4096
    d_t = jnp.concatenate([dirs_t, jnp.broadcast_to(dirs_t[:, :1], (3, n_pad - n))], 1)
    o_t = jnp.broadcast_to(scene.camera.position[:, None], d_t.shape)
    p_n, refl, thr = bounce0(o_t, d_t)
    live = thr > 2e-4

    # production sort: 64-ray groups by centroid key
    gsz = 64
    ng = n_pad // gsz
    o_c = p_n.reshape(3, ng, gsz).mean(axis=2)
    d_c = refl.reshape(3, ng, gsz).mean(axis=2)
    lg = live.reshape(ng, gsz).any(axis=1)
    gperm = jnp.argsort(ray_sort_keys(o_c, d_c, lg, jnp.asarray(bb_lo), jnp.asarray(bb_hi)), stable=True)
    p_s = jnp.take(p_n.reshape(3, ng, gsz), gperm, axis=1).reshape(3, -1)
    d_s = jnp.take(refl.reshape(3, ng, gsz), gperm, axis=1).reshape(3, -1)
    lv = jnp.take(live.reshape(ng, gsz), gperm, axis=0).reshape(-1)

    # --- sphere blocks: Morton order, contiguous blocks of K ------------
    order = morton_order(cc, bb_lo, bb_hi)
    cs, rs = cc[order], rc[order]

    for k_blk in (16, 32, 64):
        nb = -(-s_cheap // k_blk)
        pad = nb * k_blk - s_cheap
        cp = np.concatenate([cs, np.repeat(cs[-1:], pad, 0)], 0)
        rp = np.concatenate([rs, np.zeros(pad, np.float32)], 0)
        cb = cp.reshape(nb, k_blk, 3)
        rb = rp.reshape(nb, k_blk)
        # block bounding spheres: center = AABB mid, radius covers all
        lo = (cb - rb[..., None]).min(1)
        hi = (cb + rb[..., None]).max(1)
        bctr = 0.5 * (lo + hi)
        brad = np.linalg.norm(
            np.maximum(hi - bctr, bctr - lo), axis=1
        )  # conservative: corner distance
        # tighter: max over spheres of |c_i - bctr| + r_i
        brad = np.minimum(
            brad,
            (np.linalg.norm(cb - bctr[:, None, :], axis=2) + rb).max(1),
        )
        bctr_j, brad_j = jnp.asarray(bctr), jnp.asarray(brad)

        for tile in (4096, 2048, 1024, 512):
            bcols = tile // _SUBLANES
            o3 = pack_tiles(p_s, bcols)
            d3 = pack_tiles(d_s, bcols)
            valid = pack_tiles(lv[None].astype(jnp.float32), bcols)[0] > 0
            o_lo, o_hi = _tile_bounds(o3, bcols, valid)
            dl, dh = _tile_bounds(d3, bcols, valid)
            mask = np.asarray(interval_hit_mask(o_lo, o_hi, dl, dh, bctr_j, brad_j))
            tlive = np.asarray(
                jnp.max(valid.reshape(_SUBLANES, -1, bcols), axis=(0, 2))
            )
            passed = (mask & tlive[:, None]).sum(1)  # blocks swept per tile
            work = passed * k_blk  # spheres swept per tile
            print(json.dumps({
                "k_blk": k_blk, "n_blocks": int(nb), "tile": tile,
                "mean_blocks_live": round(float(passed[tlive].mean()), 1),
                "sweep_work_frac": round(float(work.sum() / (len(work) * s_cheap)), 4),
            }), flush=True)


if __name__ == "__main__":
    main()
