"""Scaling-efficiency harness: rays/s at 1..N devices (SURVEY §7 step 6).

On real multi-chip hardware this measures ICI scaling of the sharded
renderer; on a single-chip or CPU host it runs against virtual devices
(``--virtual 8``) to validate the harness and the sharding itself.

    python benchmarks/scaling_bench.py --virtual 8
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=0, help="force N virtual CPU devices")
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=540)
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument(
        "--train", action="store_true",
        help="measure full sharded Adam steps (fwd+bwd+psum+update) instead "
        "of forward frames — BASELINE config 5's multi-device shape",
    )
    args = ap.parse_args()

    if args.virtual:
        import os

        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + f" --xla_force_host_platform_device_count={args.virtual}"
        ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    import dataclasses

    import jax
    import jax.numpy as jnp

    from python_ray_tracer_tpu import RenderConfig
    from python_ray_tracer_tpu.models.scenes import reference_scene
    from python_ray_tracer_tpu.parallel import make_mesh
    from python_ray_tracer_tpu.parallel.sharded import render_sharded

    n_dev = len(jax.devices())
    scene = reference_scene(args.width, args.height, dtype=jnp.float32)
    cfg = RenderConfig(max_depth=args.depth, dtype=jnp.float32)
    n_rays = args.width * args.height

    def timed(mesh) -> float:
        import numpy as np

        if args.train:
            import optax

            from python_ray_tracer_tpu.optim import make_loss_fn, scene_to_params

            target = jnp.clip(render_sharded(scene, cfg, mesh), 0.0, 1.0) * 0.9
            loss_fn = make_loss_fn(scene, target, cfg, mesh=mesh)
            optimizer = optax.adam(1e-3)
            params0 = scene_to_params(scene)

            @jax.jit
            def run(params, opt_state):
                def body(carry, _):
                    p, s = carry
                    loss, grads = jax.value_and_grad(loss_fn)(p)
                    updates, s = optimizer.update(grads, s, p)
                    return (optax.apply_updates(p, updates), s), loss

                (_, _), losses = jax.lax.scan(
                    body, (params, opt_state), None, length=args.frames
                )
                return losses[-1]

            opt0 = optimizer.init(params0)
            float(np.asarray(run(params0, opt0)))  # compile + warm
            t0 = time.perf_counter()
            float(np.asarray(run(params0, opt0)))
            return (time.perf_counter() - t0) / args.frames

        @jax.jit
        def run(scene):
            def body(carry, _):
                cam = dataclasses.replace(scene.camera, position=scene.camera.position + carry * 1e-6)
                img = render_sharded(dataclasses.replace(scene, camera=cam), cfg, mesh)
                return jnp.mean(img), None

            final, _ = jax.lax.scan(
                body, jnp.zeros((), jnp.float32), None, length=args.frames
            )
            return final

        float(np.asarray(run(scene)))  # compile + warm (forced host fetch)
        t0 = time.perf_counter()
        float(np.asarray(run(scene)))
        return (time.perf_counter() - t0) / args.frames

    results = {
        "device": jax.devices()[0].platform,
        "n_devices": n_dev,
        "mode": "train_step" if args.train else "forward",
        "points": [],
    }
    base = None
    n = 1
    while n <= n_dev:
        s = timed(make_mesh(n, 1, devices=jax.devices()[:n]))
        rays = n_rays / s
        if base is None:
            base = rays
        results["points"].append(
            {
                "devices": n,
                "s_per_frame": round(s, 4),
                "mrays_per_s": round(rays / 1e6, 2),
                "efficiency": round(rays / (base * n), 3),
            }
        )
        n *= 2
    print(json.dumps(results))  # noqa: T201


if __name__ == "__main__":
    main()
