"""On-chip A/B of culled-path variants at config 4 (1024 sph, 1920x1080).

Monkeypatches the module knobs and times full frames per combination.
PRODUCTION (since the 2026-08-19 flip this harness measured) is
``_SORT_G = 32`` + ``MAT_GATHER_MODE = "piecewise"`` — so the "base"
variant below IS production, and the g64/xla variants reproduce the
pre-flip round-2 configuration:

  gN        — _SORT_G = N (re-sort granularity; 64 was the r2 default)
  mat_M     — MAT_GATHER_MODE = M in {"xla", "direct", "piecewise"}
  bound32   — _BOUND_G = 32 (re-swept after the flip: loser)
  tile2048  — CULL_BLOCK_RAYS = 2048 (re-swept after the flip: loser)

Variants combine as ``gN+mat_M`` etc.; see docs/PERF.md for the measured
table.

    python benchmarks/culled_ab.py [--frames 10] [--depth 4]
"""

from __future__ import annotations

import argparse
import dataclasses
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


def time_culled(scene, cfg, frames: int) -> float:
    from python_ray_tracer_tpu.camera import ray_directions_t
    from python_ray_tracer_tpu.ops.pallas_culled import trace_fused_culled

    @jax.jit
    def run(scene):
        def body(carry, _):
            cam = dataclasses.replace(
                scene.camera, position=scene.camera.position + carry * 1e-6
            )
            sc = dataclasses.replace(scene, camera=cam)
            dirs_t = ray_directions_t(sc.camera, cfg.dtype)
            color = trace_fused_culled(sc.camera.position, dirs_t, sc, cfg, transposed=True)
            return jnp.mean(color), None

        final, _ = jax.lax.scan(
            body, jnp.zeros((), scene.camera.position.dtype), None, length=frames
        )
        return final

    ref = float(np.asarray(run(scene)))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        got = float(np.asarray(run(scene)))
        best = min(best, (time.perf_counter() - t0) / frames)
    assert got == ref
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--spheres", type=int, default=1024)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument(
        "--variants", type=str,
        default="g64,g32,g16,g8,mat_direct,mat_piecewise,g8+mat_best,g8+tile2048",
    )
    args = ap.parse_args()

    import python_ray_tracer_tpu.ops.pallas_culled as pc
    from python_ray_tracer_tpu import RenderConfig
    from python_ray_tracer_tpu.models.scenes import random_spheres_scene

    scene = random_spheres_scene(
        n_spheres=args.spheres, width=args.width, height=args.height, dtype=jnp.float32
    )
    cfg = RenderConfig(max_depth=args.depth, dtype=jnp.float32, use_pallas=True)

    base_g, base_m = pc._SORT_G, pc.MAT_GATHER_MODE
    mat_best = [None]  # filled by the mat_* variants

    base_blk = pc.CULL_BLOCK_RAYS

    base_bg = pc._BOUND_G

    base_fs = pc.FULL_SWEEP_FROM_BOUNCE

    def set_variant(v: str):
        pc._SORT_G, pc.MAT_GATHER_MODE, pc.CULL_BLOCK_RAYS = base_g, base_m, base_blk
        pc._BOUND_G = base_bg
        pc.FULL_SWEEP_FROM_BOUNCE = base_fs
        if v == "base":
            pass
        elif v.startswith("fullsweep"):
            # fullsweepK: skip candidate builds from bounce K on
            pc.FULL_SWEEP_FROM_BOUNCE = int(v[len("fullsweep"):])
        elif v == "bound32":
            pc._BOUND_G = 32
        elif v.startswith("tile"):
            pc.CULL_BLOCK_RAYS = int(v[4:])
        elif v == "g8+tile2048":
            pc._SORT_G = 8
            pc.CULL_BLOCK_RAYS = 2048
        elif v.startswith("g") and "+mat" not in v:
            pc._SORT_G = int(v[1:])
        elif v == "mat_direct":
            pc.MAT_GATHER_MODE = "direct"
        elif v == "mat_piecewise":
            pc.MAT_GATHER_MODE = "piecewise"
        elif v.endswith("+mat_best") and v.startswith("g"):
            pc._SORT_G = int(v[1:].split("+", 1)[0])
            if mat_best[0] is None:
                raise RuntimeError("run mat_* variants first")
            pc.MAT_GATHER_MODE = mat_best[0]
        elif v.startswith("g") and "+mat_" in v:
            g, m = v[1:].split("+mat_", 1)
            pc._SORT_G = int(g)
            pc.MAT_GATHER_MODE = m
        elif v != "g64":
            raise ValueError(v)

    results = {}
    for v in args.variants.split(","):
        try:
            set_variant(v)
            s = time_culled(scene, cfg, args.frames)
            results[v] = s
            if v.startswith("mat_") and (
                mat_best[0] is None or s < results.get(f"mat_{mat_best[0]}", 1e9)
            ):
                mat_best[0] = v.split("_", 1)[1]
            print(json.dumps({  # noqa: T201
                "variant": v, "s_per_frame": round(s, 4),
                "mrays_per_s": round(args.width * args.height / s / 1e6, 1),
            }), flush=True)
        except Exception as e:  # noqa: BLE001 — report lowering failures, keep going
            msg = str(e).splitlines() or [type(e).__name__]
            print(json.dumps({  # noqa: T201
                "variant": v, "error": (msg[0] or type(e).__name__)[:200]
            }), flush=True)
        finally:
            pc._SORT_G, pc.MAT_GATHER_MODE, pc.CULL_BLOCK_RAYS = base_g, base_m, base_blk
            pc._BOUND_G = base_bg


if __name__ == "__main__":
    main()
