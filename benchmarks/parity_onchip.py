"""On-chip parity: culled path (production knobs) vs the blocked lane
kernel at a big-scene config.

The CPU suite pins gather-mode and sort-granularity parity in interpret
mode (tests/test_culled.py); Mosaic-compiled lowering can differ, so any
knob flip in ops/pallas_culled.py is re-verified here on the real chip
against the independent lane-kernel implementation, with the suite's
tolerances.

    python benchmarks/parity_onchip.py [--spheres 512] [--width 960] ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--spheres", type=int, default=512)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=540)
    ap.add_argument("--depth", type=int, default=3)
    args = ap.parse_args()

    from python_ray_tracer_tpu import RenderConfig
    from python_ray_tracer_tpu.camera import ray_directions_t
    from python_ray_tracer_tpu.models.scenes import random_spheres_scene
    from python_ray_tracer_tpu.ops.pallas_bounce_sub import trace_fused_sub
    from python_ray_tracer_tpu.ops.pallas_culled import trace_fused_culled

    scene = random_spheres_scene(
        n_spheres=args.spheres, width=args.width, height=args.height,
        dtype=jnp.float32,
    )
    cfg = RenderConfig(max_depth=args.depth, dtype=jnp.float32, use_pallas=True)

    @jax.jit
    def run_culled(scene):
        dirs_t = ray_directions_t(scene.camera, cfg.dtype)
        return trace_fused_culled(
            scene.camera.position, dirs_t, scene, cfg, transposed=True
        )

    @jax.jit
    def run_lane(scene):
        dirs_t = ray_directions_t(scene.camera, cfg.dtype)
        return trace_fused_sub(
            scene.camera.position, dirs_t, scene, cfg, transposed=True
        )

    got = np.asarray(run_culled(scene))
    exp = np.asarray(run_lane(scene))
    diff = np.abs(got - exp)
    q999 = float(np.quantile(diff, 0.999))
    frac_big = float((diff > 1e-2).mean())
    ok = q999 < 2e-3 and frac_big < 1e-3
    print(json.dumps({
        "check": "culled_vs_lane_onchip", "spheres": args.spheres,
        "depth": args.depth, "q999": q999, "frac_gt_1e-2": frac_big,
        "ok": ok,
    }), flush=True)
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
