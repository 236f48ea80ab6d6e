"""Synthetic VPU ceiling for the fused train kernel's measured op mix.

Companion to benchmarks/op_census.py (VERDICT r4 item 5): a pallas kernel
whose inner loop issues the SAME per-lane op mix the census measured
(mad : cmp/select : div : sqrt : transcendental), dependency-chained so
nothing folds away, on full (8, B) vreg tiles resident in VMEM.  The
achieved op rate is this chip's realistic ceiling for that mix; the train
kernel's sustained rate over it is the honest MFU.

Usage: python benchmarks/vpu_ceiling.py [iters_per_lane]
Prints one JSON line with ops/s by class and the blended rate.
"""

from __future__ import annotations

import functools
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

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

# Census mix (benchmarks/op_census.py, depth-3 3-sphere train kernel,
# per ray lane): mad 4995, cmp 1254, div 171, sqrt 60, trans 111.
# Scaled to a ~46-op loop body (x0.9%): 45 mad + 11 cmp + 1.5 div + 0.5
# sqrt + 1 trans, issued as integer counts per 2 iterations.
MIX = dict(mad=45, cmp=11, div2=3, sqrt2=1, trans=1)  # div2/sqrt2: per 2 iters


_STRANDS = 4  # independent dependency chains so the VPU pipelines fill


def _kernel(x_ref, y_ref, o_ref, *, iters: int):
    c = jnp.full_like(x_ref[:, :], 1.0000001)
    xs = [x_ref[:, :] * (1.0 + 0.01 * s) for s in range(_STRANDS)]
    ys = [y_ref[:, :] * (1.0 - 0.01 * s) for s in range(_STRANDS)]

    def body(i, carry):
        xs, ys = list(carry[0]), list(carry[1])
        # Census mix per strand-iteration (ops split across _STRANDS
        # independent chains; totals per loop iteration = _STRANDS x the
        # per-strand counts, so ops_per_lane_iter below scales the same).
        for s in range(_STRANDS):
            x, y = xs[s], ys[s]
            # 45 mad-class
            for _ in range(15):
                x = x * c + y
                y = y * c - x
                x = x + y
            # 11 cmp/select-class
            for _ in range(5):
                x = jnp.maximum(x, y)
                y = jnp.minimum(y, x)
            x = jnp.where(x > y, x, y)
            # div + sqrt every other iteration (1.5 / 0.5 per iter)
            odd = i % 2
            x = jnp.where(odd == 0, x / (jnp.abs(y) + 1.001), x)
            y = jnp.where(odd == 0, jnp.sqrt(jnp.abs(y) + 1.0), y)
            x = jnp.where(odd == 1, x / (jnp.abs(y) + 1.002), x)
            # 1 transcendental (sigmoid, the kernel's dominant one)
            y = jax.nn.sigmoid(y * 0.25) + x * 1e-6
            xs[s] = jnp.clip(x, -2.0, 2.0)
            ys[s] = jnp.clip(y, -2.0, 2.0)
        return tuple(xs), tuple(ys)

    xs, ys = jax.lax.fori_loop(0, iters, body, (tuple(xs), tuple(ys)))
    acc = xs[0] + ys[0]
    for s in range(1, _STRANDS):
        acc = acc + xs[s] + ys[s]
    o_ref[:, :] = acc


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    sub, b = 8, 512
    m_tiles = 64  # grid breadth so the launch isn't trivially short
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (sub, b * m_tiles)), jnp.float32)
    y = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (sub, b * m_tiles)), jnp.float32)

    lane_spec = pl.BlockSpec((sub, b), lambda i: (0, i), memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        functools.partial(_kernel, iters=iters),
        grid=(m_tiles,),
        in_specs=[lane_spec, lane_spec],
        out_specs=lane_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
    )
    # Tunnel gotcha (verify skill): block_until_ready doesn't sync through
    # the axon tunnel — force a host fetch of one element.
    run = jax.jit(lambda x, y: jnp.sum(call(x, y)))
    float(np.asarray(run(x, y)))

    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(np.asarray(run(x, y)))
        best = min(best, time.perf_counter() - t0)

    lanes = x.size
    per_strand = MIX["mad"] + MIX["cmp"] + (MIX["div2"] + MIX["sqrt2"]) / 2 + MIX["trans"] + 4  # +4 clip/where glue
    per_iter = per_strand * _STRANDS
    total_ops = lanes * iters * per_iter
    rec = {
        "bench": "vpu_ceiling",
        "mix_per_iter": MIX,
        "iters": iters,
        "lanes": lanes,
        "ops_per_lane_iter": per_iter,
        "elapsed_ms": round(best * 1e3, 3),
        "ceiling_tops": round(total_ops / best / 1e12, 3),
        "device": str(jax.devices()[0].platform),
    }
    print(json.dumps(rec), flush=True)  # noqa: T201


if __name__ == "__main__":
    main()
