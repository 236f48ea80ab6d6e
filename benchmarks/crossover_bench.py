"""Find the culled-vs-sublane crossover sphere count on the live chip.

MIN_CULL_SPHERES (ops/pallas_culled.py) routes mid-size scenes between the
plain sublane sweep kernel (O(S) per ray, zero candidate-build overhead)
and the tile-culled kernels (candidate lists + per-bounce group sort).
The constant was first tuned when the culled path was 3x slower than it
is now — this harness re-measures the crossover.

    python benchmarks/crossover_bench.py [--counts 32,48,64,96,128] \
        [--frames 10] [--width 960] [--height 540] [--depth 3]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def time_path(scene, cfg, frames: int, fn) -> float:
    """Best-of-3 timed scans of ``frames`` camera-jittered frames."""
    from python_ray_tracer_tpu.camera import ray_directions_t

    @jax.jit
    def run(scene):
        def body(carry, _):
            cam = dataclasses.replace(
                scene.camera, position=scene.camera.position + carry * 1e-6
            )
            sc = dataclasses.replace(scene, camera=cam)
            dirs_t = ray_directions_t(sc.camera, cfg.dtype)
            color = fn(sc.camera.position, dirs_t, sc, cfg, transposed=True)
            return jnp.mean(color), None

        final, _ = jax.lax.scan(
            body, jnp.zeros((), scene.camera.position.dtype), None, length=frames
        )
        return final

    float(np.asarray(run(scene)))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(run(scene)))
        best = min(best, (time.perf_counter() - t0) / frames)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--counts", type=str, default="32,48,64,96,128,192")
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=540)
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument(
        "--interpret", action="store_true",
        help="Pallas interpreter mode (CPU smoke test of the harness only)",
    )
    ap.add_argument("--block-rays", type=int, default=0, help="0 = per-path default")
    args = ap.parse_args()

    from python_ray_tracer_tpu import RenderConfig
    from python_ray_tracer_tpu.models.scenes import random_spheres_scene
    from python_ray_tracer_tpu.ops.pallas_bounce_sub import trace_fused_sub
    from python_ray_tracer_tpu.ops.pallas_culled import trace_fused_culled

    kw = {"block_rays": args.block_rays} if args.block_rays else {}
    cfg = RenderConfig(
        max_depth=args.depth, dtype=jnp.float32, use_pallas=True,
        pallas_interpret=args.interpret, **kw,
    )
    results = []
    for s in (int(c) for c in args.counts.split(",")):
        scene = random_spheres_scene(
            n_spheres=s, width=args.width, height=args.height, dtype=jnp.float32
        )
        t_sub = time_path(scene, cfg, args.frames, trace_fused_sub)
        t_cul = time_path(scene, cfg, args.frames, trace_fused_culled)
        rec = {
            "spheres": s,
            "sublane_ms": round(t_sub * 1e3, 2),
            "culled_ms": round(t_cul * 1e3, 2),
            "culled_speedup": round(t_sub / t_cul, 3),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)  # noqa: T201

    wins = [r["spheres"] for r in results if r["culled_speedup"] > 1.0]
    print(  # noqa: T201
        json.dumps({"crossover_first_culled_win": min(wins) if wins else None}),
        flush=True,
    )


if __name__ == "__main__":
    main()
