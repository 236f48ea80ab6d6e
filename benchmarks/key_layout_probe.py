"""Key-layout battle + interval-test headroom for the culled path.

After the fast-sweep rework the reflected kernels still dominate the
config-4 frame, and their cost is ~linear in per-tile candidate count.
Two questions decide where the next milliseconds live:

1. Does a different (cell_bits, dir_bits) split of the group sort key
   pack live rays into tighter tiles?  (Round-2 finding so far: coarser
   cells + finer direction bins win; push that axis further.)
2. How conservative is the interval test itself — per live tile, how
   many listed candidates does NO ray in the tile actually hit?  If the
   false-positive rate is large, a tighter test (cone vs box) pays; if
   small, only sorting/granularity can reduce sweep work.

CPU-only (replicates bounce 0 in XLA), so it runs without the chip.
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
    _SUBLANES, candidate_lists, pack_tiles,
)

W, H, S = 1920, 1080, 1024
GROUP = 64


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

    center = jnp.asarray(scene.spheres.center, jnp.float32)
    radius = jnp.asarray(scene.spheres.radius, jnp.float32)
    s_cheap = scene.spheres.count - scene.spheres.n_exact
    sg = jnp.asarray(scene.spheres.specular_gain, jnp.float32)

    @jax.jit
    def bounce0(o_t, d_t):
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
        c_w = jnp.take(center, idx, axis=0).T
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

    cc, rc = center[:s_cheap], radius[:s_cheap]
    bb_lo = jnp.min(cc - rc[:, None], axis=0)
    bb_hi = jnp.max(cc + rc[:, None], axis=0)

    def key_v(o_f, d_f, lv, cb, db, dir_major=False):
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

    ng = n_pad // GROUP
    o_c = p_n.reshape(3, ng, GROUP).mean(axis=2)
    d_c = refl.reshape(3, ng, GROUP).mean(axis=2)
    live_g = live.reshape(ng, GROUP).any(axis=1)

    def sweep_frac(gkeys):
        gperm = jnp.argsort(gkeys, stable=True)
        def gtake(x):
            return jnp.take(x.reshape(x.shape[0], ng, GROUP), gperm, axis=1).reshape(x.shape[0], -1)
        lv = jnp.take(live.reshape(ng, GROUP), gperm, axis=0).reshape(-1)
        o3 = pack_tiles(gtake(p_n), b_cols)
        d3 = pack_tiles(gtake(refl), b_cols)
        valid = pack_tiles(lv[None].astype(jnp.float32), b_cols)[0] > 0
        cand, cnt, cnt_f = candidate_lists(o3, d3, cc, rc, b_cols, valid=valid)
        t = valid.reshape(_SUBLANES, -1, b_cols)
        tile_live = np.asarray(jnp.max(t, axis=(0, 2)) > 0)
        cnt_np = np.asarray(cnt)[0] + np.asarray(cnt_f)[0]
        return float((cnt_np * tile_live).sum() / (len(cnt_np) * s_cheap)), (
            o3, d3, valid, cand, cnt, cnt_f, tile_live)

    results = {}
    keep = None
    for cb, db, dm in [(4, 4, False), (3, 5, False), (2, 6, False), (4, 5, False),
                       (3, 6, False), (2, 7, False), (5, 4, False), (3, 5, True)]:
        frac, state = sweep_frac(key_v(o_c, d_c, live_g, cb, db, dm))
        label = f"c{cb}d{db}{'_dirmajor' if dm else ''}"
        results[label] = round(frac, 4)
        print(json.dumps({"key": label, "sweep_frac": round(frac, 4)}), flush=True)
        if cb == 4 and db == 4:
            keep = state  # current production layout — analyze its headroom

    # Interval-test headroom on the production layout: sample live tiles,
    # compute the EXACT per-tile union of hit spheres among live lanes.
    o3, d3, valid, cand, cnt, cnt_f, tile_live = keep
    rng = np.random.default_rng(0)
    live_ids = np.nonzero(tile_live)[0]
    sample = rng.choice(live_ids, size=min(48, len(live_ids)), replace=False)
    cnt_np = np.asarray(cnt)[0] + np.asarray(cnt_f)[0]
    o3n, d3n, vn = np.asarray(o3), np.asarray(d3), np.asarray(valid)
    ccn, rcn = np.asarray(cc), np.asarray(rc)
    ratios, exacts, listed = [], [], []
    for tix in sample:
        sl = slice(tix * b_cols, (tix + 1) * b_cols)
        o = o3n[:, :, sl].reshape(3, -1).T  # (4096, 3)
        d = d3n[:, :, sl].reshape(3, -1).T
        v = vn[:, sl].reshape(-1)
        oc = o[v, None, :] - ccn[None, :, :]
        b = np.einsum('rc,rsc->rs', d[v], oc)
        c2 = np.einsum('rsc,rsc->rs', oc, oc) - rcn[None, :] ** 2
        disc = b * b - c2
        sq = np.sqrt(np.maximum(disc, 0.0))
        t0 = -b - sq
        sol = np.where(t0 > 0, t0, sq - b)
        hits = (disc > 0) & (sol > 0)
        need = int(hits.any(axis=0).sum())
        exacts.append(need)
        listed.append(int(cnt_np[tix]))
        ratios.append(need / max(int(cnt_np[tix]), 1))
    print(json.dumps({
        "headroom_sampled_tiles": len(sample),
        "mean_listed": round(float(np.mean(listed)), 1),
        "mean_exact_union": round(float(np.mean(exacts)), 1),
        "mean_exact/listed": round(float(np.mean(ratios)), 3),
    }), flush=True)


if __name__ == "__main__":
    main()


def group_union_probe():
    """How tight does the tile candidate list get if built as the UNION
    of per-64-ray-group interval tests (instead of one tile-level box)?"""
    import python_ray_tracer_tpu.ops.pallas_culled as pc
    scene = random_spheres_scene(n_spheres=S, width=W, height=H, dtype=jnp.float32)
    cfg = RenderConfig(max_depth=4, dtype=jnp.float32)
    dirs_t = ray_directions_t(scene.camera, jnp.float32, None)
    block = max(cfg.block_rays, 4 * _SUBLANES * 128)
    b_cols = block // _SUBLANES
    n = dirs_t.shape[1]
    n_pad = -(-n // block) * block
    d_t = jnp.concatenate([dirs_t, jnp.broadcast_to(dirs_t[:, :1], (3, n_pad - n))], 1)
    o_t = jnp.broadcast_to(scene.camera.position[:, None], d_t.shape)
    center = jnp.asarray(scene.spheres.center, jnp.float32)
    radius = jnp.asarray(scene.spheres.radius, jnp.float32)
    s_cheap = scene.spheres.count - scene.spheres.n_exact
    sg = jnp.asarray(scene.spheres.specular_gain, jnp.float32)

    @jax.jit
    def bounce0(o_t, d_t):
        # chunked over rays so the CPU run never materializes (3, S, N)
        def chunk(ot, dt):
            oc = ot[:, None, :] - center.T[:, :, None]
            b = jnp.sum(dt[:, None, :] * oc, axis=0)
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
            p = ot + dt * t_safe
            normal = (p - c_w) / r_w
            p_n = p + normal * 1e-3
            ddn = 2.0 * jnp.sum(dt * normal, axis=0)
            refl = dt - normal * ddn
            refl = refl / jnp.linalg.norm(refl, axis=0, keepdims=True)
            thr = jnp.where(hit, 0.5 * jnp.take(sg, idx), 0.0)
            return p_n, refl, thr
        nchunk = 16
        oc3 = o_t.reshape(3, nchunk, -1).transpose(1, 0, 2)
        dc3 = d_t.reshape(3, nchunk, -1).transpose(1, 0, 2)
        pn, rf, th = jax.lax.map(lambda od: chunk(od[0], od[1]), (oc3, dc3))
        return (pn.transpose(1, 0, 2).reshape(3, -1),
                rf.transpose(1, 0, 2).reshape(3, -1),
                th.reshape(-1))

    p_n, refl, thr = bounce0(o_t, d_t)
    live = thr > 2e-4

    cc, rc = center[:s_cheap], radius[:s_cheap]
    bb_lo = jnp.min(cc - rc[:, None], axis=0)
    bb_hi = jnp.max(cc + rc[:, None], axis=0)

    ng = n_pad // GROUP
    o_cg = p_n.reshape(3, ng, GROUP).mean(axis=2)
    d_cg = refl.reshape(3, ng, GROUP).mean(axis=2)
    live_g = live.reshape(ng, GROUP).any(axis=1)
    gkeys = pc.ray_sort_keys(o_cg, d_cg, live_g, bb_lo, bb_hi)
    gperm = jnp.argsort(gkeys, stable=True)
    def gtake(x):
        return jnp.take(x.reshape(x.shape[0], ng, GROUP), gperm, axis=1).reshape(x.shape[0], -1)
    o_s, d_s = gtake(p_n), gtake(refl)
    lv = jnp.take(live.reshape(ng, GROUP), gperm, axis=0).reshape(-1)

    # per-group bounds (live lanes only)
    big = 1.0e30
    vg = lv.reshape(1, ng, GROUP)
    og = o_s.reshape(3, ng, GROUP); dg = d_s.reshape(3, ng, GROUP)
    g_lo = jnp.where(vg, og, big).min(axis=2).T; g_hi = jnp.where(vg, og, -big).max(axis=2).T
    gd_lo = jnp.where(vg, dg, big).min(axis=2).T; gd_hi = jnp.where(vg, dg, -big).max(axis=2).T
    gmask = pc.interval_hit_mask(g_lo, g_hi, gd_lo, gd_hi, cc, rc)  # (ng, S)
    gmask = gmask & live_g.take(gperm)[:, None]
    gpt = n_pad // block // 1  # tiles
    tiles = n_pad // block
    tmask = gmask.reshape(tiles, block // GROUP, -1).any(axis=1)  # (T, S)
    # compare with current tile-level mask
    o3 = pack_tiles(o_s, b_cols); d3 = pack_tiles(d_s, b_cols)
    valid = pack_tiles(lv[None].astype(jnp.float32), b_cols)[0] > 0
    _, cnt_t, cnt_tf = candidate_lists(o3, d3, cc, rc, b_cols, valid=valid)
    t_live = np.asarray(jnp.max(valid.reshape(_SUBLANES, -1, b_cols), axis=(0, 2)) > 0)
    cur = (np.asarray(cnt_t)[0] + np.asarray(cnt_tf)[0])
    new = np.asarray(tmask.sum(axis=1))
    print(json.dumps({
        "live_tiles": int(t_live.sum()),
        "mean_cnt_current": round(float(cur[t_live].mean()), 1),
        "mean_cnt_group_union": round(float(new[t_live].mean()), 1),
        "p95_group_union": int(np.quantile(new[t_live], 0.95)),
        "max_group_union": int(new[t_live].max()),
    }), flush=True)


if __name__ == "__main__" and os.environ.get("GROUP_UNION"):
    group_union_probe()
