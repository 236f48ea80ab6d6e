"""Time the culled path's XLA glue pieces on the chip (config-4 scale).

Per reflected bounce the path pays: ray re-sort (block permutation),
2x candidate builds (interval tests + argsort + counts), and 3 gathers
((T,512,4) geom x2, (T,512,16) material).  This times each piece inside
a LICM-safe scan so the winner of the redesign (SMEM id-indirection vs
pre-gathered rows) is chosen on data.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

from python_ray_tracer_tpu import RenderConfig
from python_ray_tracer_tpu.camera import ray_directions_t
from python_ray_tracer_tpu.models.scenes import random_spheres_scene
from python_ray_tracer_tpu.ops.pallas_culled import (
    _SUBLANES, MAX_CAND, _tile_bounds, interval_hit_mask, pack_tiles,
)

W, H, S = 1920, 1080, 1024
ITERS = 20


def timed(name, fn, *args):
    @jax.jit
    def run(*a):
        def body(carry, _):
            out = fn(carry, *a)
            return out, None

        m, _ = jax.lax.scan(body, jnp.zeros(()), None, length=ITERS)
        return m

    float(np.asarray(run(*args)))
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(run(*args)))
        reps.append((time.perf_counter() - t0) / ITERS * 1e3)
    print(json.dumps({"piece": name, "ms": round(min(reps), 3)}), flush=True)


def main():
    scene = random_spheres_scene(n_spheres=S, width=W, height=H, dtype=jnp.float32)
    dirs_t = ray_directions_t(scene.camera, jnp.float32, None)
    n = dirs_t.shape[1]
    block = 4096
    b_cols = block // _SUBLANES
    n_pad = -(-n // block) * block
    d_p = jnp.concatenate([dirs_t, jnp.broadcast_to(dirs_t[:, :1], (3, n_pad - n))], 1)
    o_p = jnp.broadcast_to(scene.camera.position[:, None], d_p.shape)
    o3 = pack_tiles(o_p, b_cols)
    d3 = pack_tiles(d_p, b_cols)
    s_cheap = scene.spheres.count - scene.spheres.n_exact
    center = jnp.asarray(scene.spheres.center[:s_cheap])
    radius = jnp.asarray(scene.spheres.radius[:s_cheap])
    geom = jnp.concatenate([center, radius[:, None]], axis=1)  # (S, 4)
    mat16 = jnp.concatenate([geom, geom, geom, geom], axis=1)  # (S, 16) stand-in
    t_tiles = n_pad // block

    def interval_only(c, o3, d3):
        o_lo, o_hi = _tile_bounds(o3 + c * 1e-12, b_cols)
        d_lo, d_hi = _tile_bounds(d3, b_cols)
        m = interval_hit_mask(o_lo, o_hi, d_lo, d_hi, center, radius)
        return m.astype(jnp.float32).mean()

    def argsort_piece(c, o3, d3):
        o_lo, o_hi = _tile_bounds(o3 + c * 1e-12, b_cols)
        d_lo, d_hi = _tile_bounds(d3, b_cols)
        m = interval_hit_mask(o_lo, o_hi, d_lo, d_hi, center, radius)
        order = jnp.argsort(jnp.where(m, 0, 1), axis=1, stable=True)
        return order.astype(jnp.float32).mean()

    def full_build_and_gather(c, o3, d3):
        o_lo, o_hi = _tile_bounds(o3 + c * 1e-12, b_cols)
        d_lo, d_hi = _tile_bounds(d3, b_cols)
        m = interval_hit_mask(o_lo, o_hi, d_lo, d_hi, center, radius)
        order = jnp.argsort(jnp.where(m, 0, 1), axis=1, stable=True).astype(jnp.int32)
        cand = order[:, :MAX_CAND]
        g = jnp.take(geom, cand, axis=0)  # (T, 512, 4)
        mt = jnp.take(mat16, cand, axis=0)  # (T, 512, 16)
        return g.mean() + mt.mean()

    def gathers_only(c, cand):
        cd = jnp.abs(cand + c.astype(jnp.int32) * 0)
        g = jnp.take(geom, cd, axis=0)
        mt = jnp.take(mat16, cd, axis=0)
        return g.mean() + mt.mean()

    key = jax.random.PRNGKey(0)
    cand0 = jax.random.randint(key, (t_tiles, MAX_CAND), 0, s_cheap, jnp.int32)

    timed("interval_tests", interval_only, o3, d3)
    timed("plus_argsort", argsort_piece, o3, d3)
    timed("plus_gathers(full build)", full_build_and_gather, o3, d3)
    timed("gathers_alone", gathers_only, cand0)


if __name__ == "__main__":
    main()
