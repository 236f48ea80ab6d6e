"""On-chip cost of the per-bounce sort gather at finer group sizes.

benchmarks/colsort_stats.py (CPU) says global sorting at GROUP SIZE 8
recovers most of the true per-ray sort's candidate reduction (frozen
64-ray membership is the quality ceiling of the current culled path).
The open question is the CHIP cost of the finer interleaved gather:
``take((ng, 11*G) rows, perm)`` at G=8 moves 8x the rows of G=64 at 1/8
the width — row-count-bound pricing says 8x slower, byte-bound says
free.  docs/PERF.md has conflicting per-shape rates; measure exactly the
production shape.

    python benchmarks/sortg_probe.py [--rays 2097152] [--groups 64,32,16,8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

CHANNELS = 11


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=2 * 1024 * 1024)
    ap.add_argument("--groups", type=str, default="64,32,16,8")
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    n = args.rays

    state0 = jax.random.uniform(jax.random.PRNGKey(0), (CHANNELS, n), jnp.float32)

    for g in (int(x) for x in args.groups.split(",")):
        ng = n // g

        @jax.jit
        def run(state, seed, g=g, ng=ng):
            def body(carry, _):
                st, s = carry
                # a cheap, changing pseudo-permutation: argsort of a
                # hashed key (deterministic, seed-threaded — LICM-safe)
                k = (jnp.arange(ng, dtype=jnp.uint32) * jnp.uint32(2654435761) + s)
                keys = (k ^ (k >> 15)) * jnp.uint32(0x2C1B3C6D)
                perm = jnp.argsort(keys)
                inter = st.reshape(CHANNELS, ng, g).transpose(1, 0, 2)
                inter = jnp.take(inter.reshape(ng, CHANNELS * g), perm, axis=0)
                st = inter.reshape(ng, CHANNELS, g).transpose(1, 0, 2).reshape(CHANNELS, n)
                return (st, s + jnp.uint32(1)), None

            (st, s), _ = jax.lax.scan(body, (state, seed), None, length=args.iters)
            return st

        out = run(state0, jnp.uint32(1))
        float(np.asarray(out[0, 0]))  # compile + warm, forced fetch
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(state0, jnp.uint32(7))
            float(np.asarray(out[0, 0]))
            best = min(best, (time.perf_counter() - t0) / args.iters)
        print(  # noqa: T201
            json.dumps({
                "group": g, "rows": ng, "row_bytes": 4 * CHANNELS * g,
                "ms_per_sort_gather": round(best * 1e3, 3),
                "mrows_per_s": round(ng / best / 1e6, 1),
            }),
            flush=True,
        )


if __name__ == "__main__":
    main()
