"""Headline benchmark: rays/sec/chip, forward+backward, 960x540 depth-3.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline (BASELINE.md, measured on the reference NumPy implementation,
which is forward-only): full 960x540 render of the main.py scene in
1.40 s = 3.7e5 primary rays/s.  We time a full fwd+bwd step (render +
L2 loss + gradients w.r.t. all scene parameters) at the same resolution
with depth-3 reflections — strictly more work per ray than the baseline's
forward-only pass — and report primary rays per second.  vs_baseline is
the speedup over the reference's forward-only primary-rays/s.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

BASELINE_PRIMARY_RAYS_PER_S = 518_400 / 1.40  # BASELINE.md: 960x540 in 1.40 s

W, H, DEPTH = 960, 540, 3
WARMUP, ITERS = 2, 10


def main() -> None:
    from python_ray_tracer_tpu import RenderConfig
    from python_ray_tracer_tpu.models.scenes import reference_scene
    from python_ray_tracer_tpu.optim import make_loss_fn, scene_to_params

    cfg = RenderConfig(max_depth=DEPTH, dtype=jnp.float32, visibility="smooth")
    scene = reference_scene(W, H, dtype=jnp.float32)
    # Target: the scene's own hard render (loss value is irrelevant to timing).
    from python_ray_tracer_tpu.render import render

    target = jnp.clip(render(scene, RenderConfig(max_depth=DEPTH, dtype=jnp.float32)), 0.0, 1.0)
    params = scene_to_params(scene)
    grad_fn = jax.jit(jax.value_and_grad(make_loss_fn(scene, target, cfg)))

    for _ in range(WARMUP):
        jax.block_until_ready(grad_fn(params))

    start = time.perf_counter()
    for _ in range(ITERS):
        jax.block_until_ready(grad_fn(params))
    elapsed = (time.perf_counter() - start) / ITERS

    rays_per_s = (W * H) / elapsed
    print(  # noqa: T201
        json.dumps(
            {
                "metric": "fwd_bwd_primary_rays_per_s_960x540_depth3",
                "value": round(rays_per_s, 1),
                "unit": "rays/s/chip",
                "vs_baseline": round(rays_per_s / BASELINE_PRIMARY_RAYS_PER_S, 3),
                "step_ms": round(elapsed * 1e3, 3),
                "device": str(jax.devices()[0].platform),
            }
        )
    )


if __name__ == "__main__":
    main()
