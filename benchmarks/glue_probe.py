"""Attribute the reflected-bounce XLA glue cost of the sorted culled path.

Times each piece at config-4 shapes (N=2^21 rays, T=507 tiles, S=1023)
in LICM-safe scans on the real chip: (a) the full sort step
(unpack+keys+argsort+take+pack), (b) argsort alone, (c) the state take
alone, (d) pack/unpack transposes alone, (e) candidate_lists, (f) the
candidate gathers (geom + mat16).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from python_ray_tracer_tpu.ops.pallas_culled import (
    _SUBLANES, MAX_CAND, candidate_lists, pack_tiles, ray_sort_keys, unpack_tiles,
)

N = 1 << 21
B_COLS = 512  # 4096-ray tiles
S = 1023
ITERS = 10


def timed(name, make):
    run = jax.jit(make())
    t0 = time.perf_counter()
    float(np.asarray(jax.tree_util.tree_leaves(run(jnp.uint32(1)))[0]).ravel()[0])
    compile_s = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(jax.tree_util.tree_leaves(run(jnp.uint32(1)))[0]).ravel()[0])
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(json.dumps({"piece": name, "ms": round(best * 1e3, 2), "compile_s": round(compile_s, 1)}), flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    m = N // _SUBLANES
    state0 = jnp.ones((11, _SUBLANES, m), jnp.float32)
    pix0 = jnp.arange(N, dtype=jnp.int32)
    bb_lo = jnp.full((3,), -20.0)
    bb_hi = jnp.full((3,), 20.0)
    key_mix = (jnp.arange(N, dtype=jnp.uint32) * jnp.uint32(2654435769)) >> jnp.uint32(10)
    cc = jax.random.uniform(jax.random.PRNGKey(0), (S, 3), jnp.float32, -18, 18)
    rr = jax.random.uniform(jax.random.PRNGKey(1), (S,), jnp.float32, 0.2, 1.0)
    geom = jnp.concatenate([cc, rr[:, None]], axis=1)
    mat16 = jnp.ones((S, 16), jnp.float32)

    def scan(body, init):
        def run(seed):
            c, _ = jax.lax.scan(lambda c, _: (body(c), None), init(seed), None, length=ITERS)
            # Reduce to one scalar: fetching a big carry over the tunnel
            # (~300 MB/s) would dwarf the compute being measured.
            return jnp.stack(
                [jnp.mean(leaf.astype(jnp.float32)) for leaf in jax.tree_util.tree_leaves(c)]
            ).sum()
        return run

    def full_sort():
        def init(seed):
            return (state0 * (1.0 + seed.astype(jnp.float32) * 0), pix0)
        def body(c):
            s3, pix = c
            state = unpack_tiles(s3, B_COLS)
            live = state[6] > 2e-4
            keys = ray_sort_keys(state[0:3], state[3:6], live, bb_lo, bb_hi)
            perm = jnp.argsort(keys, stable=True)
            state = jnp.take(state, perm, axis=1)
            pix = jnp.take(pix, perm, axis=0)
            return (pack_tiles(state, B_COLS) + 1e-7, pix)
        return scan(body, init)

    def argsort_only():
        def init(seed):
            return key_mix ^ seed
        def body(k):
            perm = jnp.argsort(k, stable=True)
            return k ^ perm.astype(jnp.uint32)
        return scan(body, init)

    def take_only():
        def init(seed):
            return (state0.reshape(11, N) * (1.0 + seed.astype(jnp.float32) * 0), pix0)
        def body(c):
            st, pix = c
            return (jnp.take(st, pix, axis=1) + 1e-7, pix ^ 1)
        return scan(body, init)

    def packunpack_only():
        def init(seed):
            return state0 * (1.0 + seed.astype(jnp.float32) * 0)
        def body(s3):
            return pack_tiles(unpack_tiles(s3, B_COLS) + 1e-7, B_COLS)
        return scan(body, init)

    def cand_only():
        def init(seed):
            d = jax.random.normal(jax.random.PRNGKey(3), (3, _SUBLANES, m), jnp.float32)
            d = d / jnp.linalg.norm(d, axis=0, keepdims=True)
            o = jnp.zeros((3, _SUBLANES, m), jnp.float32) + seed.astype(jnp.float32) * 0
            return (o, d, jnp.zeros((), jnp.float32))
        def body(c):
            o, d, acc = c
            cand, cnt, cnt_f = candidate_lists(o, d, cc, rr, B_COLS)
            return (o + 1e-7, d, acc + cnt.astype(jnp.float32).mean())
        return scan(body, init)

    def gathers_only():
        def init(seed):
            cand = jnp.tile(jnp.arange(MAX_CAND, dtype=jnp.int32)[None] % S, (N // (8 * B_COLS), 1))
            return (cand ^ seed.astype(jnp.int32), jnp.zeros((), jnp.float32))
        def body(c):
            cand, acc = c
            g = jnp.take(geom, cand % S, axis=0)
            mt = jnp.take(mat16, cand % S, axis=0)
            return (cand ^ 1, acc + g.mean() + mt.mean())
        return scan(body, init)

    def sortkv_12op():
        def init(seed):
            return (state0.reshape(11, N) * (1.0 + seed.astype(jnp.float32) * 0), pix0)
        def body(c):
            st, pix = c
            keys = key_mix ^ pix.astype(jnp.uint32)
            out = jax.lax.sort([keys] + [st[i] for i in range(11)] + [pix], num_keys=1)
            return (jnp.stack(out[1:12]) + 1e-7, out[12])
        return scan(body, init)

    def group_take(g):
        ng = N // g
        def init(seed):
            return (state0.reshape(11, ng, g) * (1.0 + seed.astype(jnp.float32) * 0),
                    pix0.reshape(ng, g))
        def body(c):
            st, pix = c
            keys = (key_mix[::g] ^ pix[:, 0].astype(jnp.uint32))
            perm = jnp.argsort(keys, stable=True)
            return (jnp.take(st, perm, axis=1) + 1e-7, jnp.take(pix, perm, axis=0) ^ 1)
        return scan(body, init)

    def take_rows():
        def init(seed):
            return (jnp.ones((N, 11), jnp.float32) * (1.0 + seed.astype(jnp.float32) * 0), pix0)
        def body(c):
            st, pix = c
            return (jnp.take(st, pix, axis=0) + 1e-7, pix ^ 1)
        return scan(body, init)

    timed("full_sort_step", full_sort)
    timed("argsort_2M", argsort_only)
    timed("take_11xN", take_only)
    timed("sortkv_12op_live", sortkv_12op)
    timed("group_take_g128", lambda: group_take(128))
    timed("group_take_g32", lambda: group_take(32))
    timed("take_rows_Nx11", take_rows)
    timed("pack_unpack", packunpack_only)
    timed("candidate_lists", cand_only)
    timed("cand_gathers", gathers_only)


if __name__ == "__main__":
    main()
