"""Config-5 training headline: full Adam step on the inverse-rendering task.

BASELINE config 5 is the 64-sphere inverse task (``models/scenes.py:
inverse_task_scene``, 256x144 by default).  Round 2 had no on-chip number
for it — the smooth sublane kernels capped at 16 spheres, so 64-sphere
training fell to the (1, B) lane kernels (VERDICT r2 item 1/2).  This
script measures the full Adam step (render + L2 loss + grads over ALL
scene params + update) through each available path with the same
LICM-safe on-device lax.scan harness as ``python_ray_tracer_tpu.bench``:

  blk   — the blocked sublane smooth fwd+bwd kernels (production default
          for 17..4096 spheres)
  lane  — the round-2 blocked lane kernels (forced by shrinking
          MAX_BLK_SPHERES_SMOOTH, the pre-round-3 routing)
  xla   — use_pallas=False

Usage:  python benchmarks/config5_bench.py [n_spheres ...]
Prints one JSON line per (path, n_spheres).
"""

from __future__ import annotations

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
import optax  # noqa: E402

from python_ray_tracer_tpu.config import RenderConfig  # noqa: E402
from python_ray_tracer_tpu.models.scenes import inverse_task_scene  # noqa: E402
from python_ray_tracer_tpu.optim import make_loss_fn, scene_to_params  # noqa: E402
from python_ray_tracer_tpu.render import render  # noqa: E402


def measure(path: str, n_spheres: int, width=256, height=144, depth=3, steps=100) -> dict:
    from python_ray_tracer_tpu.ops import pallas_bounce_smooth_sub as sub

    saved_cap = sub.MAX_BLK_SPHERES_SMOOTH
    if path == "lane":
        sub.MAX_BLK_SPHERES_SMOOTH = sub.MAX_SUB_SPHERES_SMOOTH  # pre-r3 routing
    try:
        cfg = RenderConfig(
            max_depth=depth, dtype=jnp.float32, visibility="smooth",
            use_pallas=(path != "xla"), block_rays=2048,
        )
        scene = inverse_task_scene(n_spheres=n_spheres, width=width, height=height)
        target = jnp.clip(render(scene, RenderConfig(max_depth=depth, dtype=jnp.float32)), 0.0, 1.0)
        params = scene_to_params(scene)
        optimizer = optax.adam(1e-3)
        loss_fn = make_loss_fn(scene, target, cfg)

        @jax.jit
        def run_steps(params, opt_state):
            def body(carry, _):
                p, s = carry
                loss, grads = jax.value_and_grad(loss_fn)(p)
                updates, s = optimizer.update(grads, s, p)
                p = optax.apply_updates(p, updates)
                return (p, s), loss

            (params, opt_state), losses = jax.lax.scan(body, (params, opt_state), None, length=steps)
            return params, opt_state, losses

        opt_state = optimizer.init(params)
        t0 = time.perf_counter()
        params_w, opt_w, losses = run_steps(params, opt_state)
        float(np.asarray(losses[-1]))
        compile_s = time.perf_counter() - t0

        elapsed = float("inf")
        for _ in range(3):
            start = time.perf_counter()
            _, _, losses2 = run_steps(params_w, opt_w)
            float(np.asarray(losses2[-1]))
            elapsed = min(elapsed, (time.perf_counter() - start) / steps)
        rec = {
            "bench": "config5_adam_step",
            "path": path,
            "n_spheres": n_spheres,
            "res": f"{width}x{height}",
            "depth": depth,
            "step_ms": round(elapsed * 1e3, 3),
            "rays_per_s": round(width * height / elapsed, 1),
            "compile_s": round(compile_s, 1),
            "device": str(jax.devices()[0].platform),
        }
        print(json.dumps(rec), flush=True)  # noqa: T201
        return rec
    finally:
        sub.MAX_BLK_SPHERES_SMOOTH = saved_cap


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [64]
    for n in sizes:
        for path in ("blk", "lane", "xla"):
            try:
                measure(path, n)
            except Exception as e:  # noqa: BLE001 — e.g. lane VMEM OOM at S>=256
                print(json.dumps({  # noqa: T201
                    "bench": "config5_adam_step", "path": path, "n_spheres": n,
                    "error": str(e).splitlines()[0][:200],
                }), flush=True)
