"""Forward-kernel cost attribution (VERDICT r1 item 1).

Times the fused hard-visibility bounce at 960x540 x depth 3 on the real
chip, in strip-down variants, for both kernel layouts:

* ``lane``    — production round-1 kernel: per-ray values as (1, B) lane
  vectors (1 of 8 sublanes busy), blocked sublane sphere sweep.
* ``sub``     — rays packed (8, B) across sublanes, spheres iterated as
  SMEM scalars (pallas_bounce_sub).

Variants: full bounce / no shadow sweep / sweep only / shading only.

LICM-safe: ITERS frames per jit in one lax.scan, camera origin perturbed
by the previous frame's output so no iteration can be hoisted; timing
forces a host fetch.  Run on the TPU: ``python benchmarks/attrib_bench.py``.
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
from python_ray_tracer_tpu.models.scenes import reference_scene
from python_ray_tracer_tpu.ops.pallas_bounce import trace_fused
from python_ray_tracer_tpu.ops.pallas_bounce_sub import trace_fused_sub

W, H, DEPTH = 960, 540, 3
ITERS = 100
DISPATCH_MS = 0.0  # measured separately below


def time_variant(name, fn, scene, cfg):
    dirs_t = ray_directions_t(scene.camera, cfg.dtype, None)

    @jax.jit
    def run(origin0):
        def body(origin, _):
            color = fn(origin, dirs_t, scene, cfg)
            # Thread the output back into the input: defeats LICM, keeps
            # the perturbation numerically invisible (<< 1 ulp of 0.2).
            bump = jnp.clip(jnp.mean(color), 0.0, 1.0) * 1e-12
            return origin + bump, jnp.mean(color)

        origin, means = jax.lax.scan(body, origin0, None, length=ITERS)
        return means[-1]

    origin0 = jnp.asarray(scene.camera.position, cfg.dtype)
    t0 = time.perf_counter()
    float(np.asarray(run(origin0)))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(np.asarray(run(origin0)))
    elapsed = time.perf_counter() - t0
    ms_frame = elapsed / ITERS * 1e3
    rec = {
        "variant": name,
        "ms_per_frame": round(ms_frame, 4),
        "ms_per_bounce": round(ms_frame / DEPTH, 4),
        "mrays_per_s": round(W * H / (ms_frame * 1e-3) / 1e6, 1),
        "compile_s": round(compile_s, 1),
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    scene = reference_scene(W, H, dtype=jnp.float32)
    cfg = RenderConfig(max_depth=DEPTH, dtype=jnp.float32, use_pallas=True, block_rays=2048)

    def lane(origin, dirs_t, scene, cfg):
        return trace_fused(origin, dirs_t, scene, cfg, transposed=True)

    def sub(parts):
        def f(origin, dirs_t, scene, cfg):
            return trace_fused_sub(origin, dirs_t, scene, cfg, transposed=True, parts=parts)

        return f

    results = []
    results.append(time_variant("lane_full_b2048", lane, scene, cfg))
    for parts in ("full", "noshadow", "shade", "sweep"):
        results.append(time_variant(f"sub_{parts}_b2048", sub(parts), scene, cfg))
    cfg_small = RenderConfig(max_depth=DEPTH, dtype=jnp.float32, use_pallas=True, block_rays=1024)
    results.append(time_variant("sub_full_b1024", sub("full"), scene, cfg_small))
    cfg_big = RenderConfig(max_depth=DEPTH, dtype=jnp.float32, use_pallas=True, block_rays=4096)
    results.append(time_variant("sub_full_b4096", sub("full"), scene, cfg_big))

    with open("benchmarks/attrib_results.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
