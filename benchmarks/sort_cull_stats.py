"""Diagnose reflected-bounce culling after the ray re-sort (config 4).

Replicates bounce 0 in XLA (full sweep nearest + mirror reflection),
then measures, for bounce 1's rays, the per-tile candidate counts with
and without the (origin cell, direction bin) sort — the quantity that
decides whether the sorted culled path can beat the full sweep.
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
    _SUBLANES, candidate_lists, pack_tiles, ray_sort_keys,
)

W, H, S = 1920, 1080, 1024


def main():
    scene = random_spheres_scene(n_spheres=S, width=W, height=H, dtype=jnp.float32)
    cfg = RenderConfig(max_depth=4, dtype=jnp.float32)
    dirs_t = ray_directions_t(scene.camera, jnp.float32, None)
    block = max(cfg.block_rays, 4 * _SUBLANES * 128)
    b_cols = block // _SUBLANES
    n = dirs_t.shape[1]
    n_pad = -(-n // block) * block
    d_t = jnp.concatenate([dirs_t, jnp.broadcast_to(dirs_t[:, :1], (3, n_pad - n))], 1)
    o_t = jnp.broadcast_to(scene.camera.position[:, None], d_t.shape)

    center = jnp.asarray(scene.spheres.center, jnp.float32)  # (S, 3)
    radius = jnp.asarray(scene.spheres.radius, jnp.float32)
    s_cheap = scene.spheres.count - scene.spheres.n_exact
    sg = jnp.asarray(scene.spheres.specular_gain, jnp.float32)

    @jax.jit
    def bounce0(o_t, d_t):
        # full-sweep nearest (chunked over spheres to bound memory)
        oc = o_t[:, None, :] - center.T[:, :, None]  # (3, S, N)
        b = jnp.sum(d_t[:, None, :] * oc, axis=0)
        c = jnp.sum(oc * oc, axis=0) - (radius**2)[:, None]
        disc = b * b - c
        t = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
        t = jnp.where((disc > 0) & (t > 1e-3), t, 3e38)
        tmin = jnp.min(t, axis=0)
        idx = jnp.argmin(t, axis=0)
        hit = tmin < 3e38
        t_safe = jnp.where(hit, tmin, 1.0)
        c_w = jnp.take(center, idx, axis=0).T  # (3, N)
        r_w = jnp.take(radius, idx)
        p = o_t + d_t * t_safe
        normal = (p - c_w) / r_w
        p_n = p + normal * 1e-3
        ddn = 2.0 * jnp.sum(d_t * normal, axis=0)
        refl = d_t - normal * ddn
        refl = refl / jnp.linalg.norm(refl, axis=0, keepdims=True)
        thr = jnp.where(hit, 0.5 * jnp.take(sg, idx), 0.0)
        return p_n, refl, thr

    p_n, refl, thr = bounce0(o_t, d_t)
    live = thr > 2e-4
    print(json.dumps({"frac_live_after_b0": float(jnp.mean(live.astype(jnp.float32)))}))

    cc, rc = center[:s_cheap], radius[:s_cheap]
    bb_lo = jnp.min(cc - rc[:, None], axis=0)
    bb_hi = jnp.max(cc + rc[:, None], axis=0)

    def stats(o_f, d_f, lv, label):
        o3 = pack_tiles(o_f, b_cols)
        d3 = pack_tiles(d_f, b_cols)
        valid = pack_tiles(lv[None].astype(jnp.float32), b_cols)[0] > 0
        cand, cnt, cnt_f = candidate_lists(o3, d3, cc, rc, b_cols, valid=valid)
        t = valid.reshape(_SUBLANES, -1, b_cols)
        tile_live = np.asarray(jnp.max(t, axis=(0, 2)) > 0)
        cnt_np = np.asarray(cnt)[0] + np.asarray(cnt_f)[0]
        swept = cnt_np * tile_live
        print(json.dumps({
            "label": label,
            "frac_tiles_live": float(tile_live.mean()),
            "mean_cnt_live_tiles": float(cnt_np[tile_live].mean()) if tile_live.any() else 0.0,
            "frac_overflow_live": float((np.asarray(cnt_f)[0][tile_live] > 0).mean()) if tile_live.any() else 0.0,
            "total_sweep_work_frac": float(swept.sum() / (len(cnt_np) * s_cheap)),
        }))

    stats(p_n, refl, live, "bounce1_unsorted")

    keys = ray_sort_keys(p_n, refl, live, bb_lo, bb_hi)
    perm = jnp.argsort(keys, stable=True)
    stats(jnp.take(p_n, perm, axis=1), jnp.take(refl, perm, axis=1),
          jnp.take(live, perm), "bounce1_sorted_per_ray")

    # Group-granularity sort: permute contiguous G-ray blocks by the key
    # of their centroid ray state (cheap block gather instead of a per-ray
    # element gather).  Key-layout variants compete below.
    def key_v(o_f, d_f, lv, cell_bits, dir_bits, dir_major):
        cb, db = cell_bits, dir_bits
        cmax, dmax = (1 << cb) - 1, (1 << db) - 1
        inv = cmax / jnp.maximum(bb_hi - bb_lo, 1e-6)
        cell = [jnp.clip((o_f[a] - bb_lo[a]) * inv[a], 0, cmax).astype(jnp.uint32) for a in range(3)]
        dbin = [jnp.clip((d_f[a] + 1.0) * (0.5 * (dmax + 1)), 0, dmax).astype(jnp.uint32) for a in range(3)]
        c_part = (cell[0] << jnp.uint32(2 * cb)) | (cell[2] << jnp.uint32(cb)) | cell[1]
        d_part = (dbin[0] << jnp.uint32(2 * db)) | (dbin[1] << jnp.uint32(db)) | dbin[2]
        if dir_major:
            key = (d_part << jnp.uint32(3 * cb)) | c_part
        else:
            key = (c_part << jnp.uint32(3 * db)) | d_part
        dead = jnp.uint32(1) << jnp.uint32(3 * (cb + db))
        return jnp.where(lv, key, dead | key)

    g = 128
    ng = p_n.shape[1] // g
    o_c = p_n.reshape(3, ng, g).mean(axis=2)
    d_c = refl.reshape(3, ng, g).mean(axis=2)
    live_g = live.reshape(ng, g).any(axis=1)

    def run_variant(gkeys, label):
        gperm = jnp.argsort(gkeys, stable=True)
        def gtake(x):
            return jnp.take(x.reshape(x.shape[0], ng, g), gperm, axis=1).reshape(x.shape[0], -1)
        lv = jnp.take(live.reshape(ng, g), gperm, axis=0).reshape(-1)
        stats(gtake(p_n), gtake(refl), lv, label)

    run_variant(ray_sort_keys(o_c, d_c, live_g, bb_lo, bb_hi), "g128_current_c5d2")
    for cb, db, dm in [(4, 4, False)]:
        run_variant(key_v(o_c, d_c, live_g, cb, db, dm), f"g128_c{cb}d{db}{'_dirmajor' if dm else ''}")

    # Does the conservative tile bound tighten with smaller tiles / groups?
    def stats_bc(o_f, d_f, lv, label, bc):
        o3 = pack_tiles(o_f, bc)
        d3 = pack_tiles(d_f, bc)
        valid = pack_tiles(lv[None].astype(jnp.float32), bc)[0] > 0
        cand, cnt, cnt_f = candidate_lists(o3, d3, cc, rc, bc, valid=valid)
        t = valid.reshape(_SUBLANES, -1, bc)
        tile_live = np.asarray(jnp.max(t, axis=(0, 2)) > 0)
        cnt_np = np.asarray(cnt)[0] + np.asarray(cnt_f)[0]
        swept = cnt_np * tile_live
        print(json.dumps({
            "label": label, "tile_rays": bc * _SUBLANES,
            "mean_cnt_live_tiles": round(float(cnt_np[tile_live].mean()), 1),
            "frac_overflow_live": round(float((np.asarray(cnt_f)[0][tile_live] > 0).mean()), 3),
            "total_sweep_work_frac": round(float(swept.sum() / (len(cnt_np) * s_cheap)), 4),
        }))

    for gsz in (128, 64, 32):
        ngs = p_n.shape[1] // gsz
        o_cs = p_n.reshape(3, ngs, gsz).mean(axis=2)
        d_cs = refl.reshape(3, ngs, gsz).mean(axis=2)
        lgs = live.reshape(ngs, gsz).any(axis=1)
        gperm = jnp.argsort(key_v(o_cs, d_cs, lgs, 4, 4, False), stable=True)
        def gtake(x):
            return jnp.take(x.reshape(x.shape[0], ngs, gsz), gperm, axis=1).reshape(x.shape[0], -1)
        lvp = jnp.take(live.reshape(ngs, gsz), gperm, axis=0).reshape(-1)
        op, dp = gtake(p_n), gtake(refl)
        for bc in (512, 256, 128):
            stats_bc(op, dp, lvp, f"g{gsz}_c4d4_tile{bc * _SUBLANES}", bc)

    # Per-ray floor at each tile size (upper bound on any group scheme).
    keys_pr = key_v(p_n, refl, live, 4, 4, False)
    pperm = jnp.argsort(keys_pr, stable=True)
    opr = jnp.take(p_n, pperm, axis=1)
    dpr = jnp.take(refl, pperm, axis=1)
    lpr = jnp.take(live, pperm)
    for bc in (512, 256, 128):
        stats_bc(opr, dpr, lpr, f"perray_c4d4_tile{bc * _SUBLANES}", bc)


if __name__ == "__main__":
    main()
