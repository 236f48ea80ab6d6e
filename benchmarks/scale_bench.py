"""BASELINE config 4 scale benchmark: 1024 spheres, 1920x1080, depth 4.

Compares the XLA sweep (optionally ray-chunked) against the fused Pallas
kernels on the current device.  All timed work runs as one on-device scan
so host dispatch latency cancels.

    python benchmarks/scale_bench.py [--frames 3] [--spheres 1024]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def time_render(scene, cfg, frames: int) -> float:
    from python_ray_tracer_tpu.render import render

    @jax.jit
    def run(scene):
        # Each iteration jitters the camera by the carry so the render is
        # NOT loop-invariant — without the data dependence XLA hoists the
        # whole body out of the scan and the timing measures one frame.
        import dataclasses

        def body(carry, _):
            cam = dataclasses.replace(
                scene.camera, position=scene.camera.position + carry * 1e-6
            )
            img = render(dataclasses.replace(scene, camera=cam), cfg)
            return jnp.mean(img), None

        final, _ = jax.lax.scan(body, jnp.zeros((), scene.camera.position.dtype), None, length=frames)
        return final

    import numpy as np

    float(np.asarray(run(scene)))  # compile + warm (forced host fetch)
    t0 = time.perf_counter()
    float(np.asarray(run(scene)))  # fetch forces full execution; scalar, so
    # transfer cost is nil
    return (time.perf_counter() - t0) / frames


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--spheres", type=int, default=1024)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--skip-xla", action="store_true")
    args = ap.parse_args()

    from python_ray_tracer_tpu import RenderConfig
    from python_ray_tracer_tpu.models.scenes import random_spheres_scene

    scene = random_spheres_scene(
        n_spheres=args.spheres, width=args.width, height=args.height, dtype=jnp.float32
    )
    n = args.width * args.height
    results = {}

    cfg_p = RenderConfig(max_depth=args.depth, dtype=jnp.float32, use_pallas=True)
    s = time_render(scene, cfg_p, args.frames)
    results["pallas_s_per_frame"] = round(s, 4)
    results["pallas_mrays_per_s"] = round(n / s / 1e6, 2)

    if not args.skip_xla:
        # XLA path needs chunking at this scale: (N, S) tables are ~8 GB.
        cfg_x = RenderConfig(max_depth=args.depth, dtype=jnp.float32, ray_chunk=131072)
        s = time_render(scene, cfg_x, args.frames)
        results["xla_chunked_s_per_frame"] = round(s, 4)
        results["xla_chunked_mrays_per_s"] = round(n / s / 1e6, 2)

    results["device"] = str(jax.devices()[0].platform)
    results["config"] = f"{args.spheres} spheres {args.width}x{args.height} depth {args.depth}"
    print(json.dumps(results))  # noqa: T201


if __name__ == "__main__":
    main()
