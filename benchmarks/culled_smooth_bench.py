"""Culled-smooth training headline: 1024-sphere 1920x1080 depth-3 Adam step.

VERDICT r4 item 1: the differentiable acceleration structure.  Measures a
full Adam step (smooth render + L2 loss + grads over ALL scene params +
update) at config-4 scale through each smooth path:

  culled  — the candidate-list culled smooth kernels (production routing
            for big scenes at big frames; ops/pallas_culled_smooth.py)
  fused   — the single-launch fused train kernel (unculled full-table
            sweeps; forced by disabling the culled route)
  blocked — the two-launch blocked fwd/bwd pair (unculled; forced by also
            zeroing MAX_FUSED_TRAIN_SPHERES)

Same LICM-safe on-device lax.scan harness as python_ray_tracer_tpu.bench.
Usage: python benchmarks/culled_smooth_bench.py [n_spheres ...] [--wh WxH]
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
from python_ray_tracer_tpu.models.scenes import random_spheres_scene  # noqa: E402
from python_ray_tracer_tpu.optim import make_loss_fn, scene_to_params  # noqa: E402
from python_ray_tracer_tpu.render import render  # noqa: E402


def measure(path: str, n_spheres: int, width=1920, height=1080, depth=3, steps=20,
            cull_bounces: int | None = None) -> dict:
    from python_ray_tracer_tpu.ops import pallas_bounce_smooth_sub as sub
    from python_ray_tracer_tpu.ops import pallas_culled_smooth as cs

    saved_rays = cs.MIN_CULL_SMOOTH_RAYS
    saved_train = sub.MAX_FUSED_TRAIN_SPHERES
    saved_cb = cs.SMOOTH_CULL_BOUNCES
    if cull_bounces is not None:
        cs.SMOOTH_CULL_BOUNCES = cull_bounces
    if path != "culled":
        cs.MIN_CULL_SMOOTH_RAYS = 1 << 60  # cull route off
    if path == "blocked":
        sub.MAX_FUSED_TRAIN_SPHERES = 0  # single-launch train kernel off
    try:
        cfg = RenderConfig(
            max_depth=depth, dtype=jnp.float32, visibility="smooth", use_pallas=True,
        )
        scene = random_spheres_scene(n_spheres=n_spheres, width=width, height=height)
        target = jnp.clip(
            render(scene, RenderConfig(max_depth=depth, dtype=jnp.float32, use_pallas=True)),
            0.0, 1.0,
        )
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
        last = float(np.asarray(losses[-1]))
        compile_s = time.perf_counter() - t0
        assert np.isfinite(last), last

        elapsed = float("inf")
        for _ in range(3):
            start = time.perf_counter()
            _, _, losses2 = run_steps(params_w, opt_w)
            float(np.asarray(losses2[-1]))
            elapsed = min(elapsed, (time.perf_counter() - start) / steps)
        rec = {
            "bench": "culled_smooth_adam_step",
            "path": path,
            "cull_bounces": cs.SMOOTH_CULL_BOUNCES,
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
        cs.MIN_CULL_SMOOTH_RAYS = saved_rays
        sub.MAX_FUSED_TRAIN_SPHERES = saved_train
        cs.SMOOTH_CULL_BOUNCES = saved_cb


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if any(a.startswith("--phasec=") for a in sys.argv[1:]):
        # A/B the batched Phase C adjoint rows (r5 flag gate): --phasec=1/0.
        from python_ray_tracer_tpu.ops import pallas_bounce_smooth_sub as _sub

        _sub._PHASEC_BATCHED = bool(int(next(
            a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--phasec="))))
        print(json.dumps({"phasec_batched": _sub._PHASEC_BATCHED}), flush=True)  # noqa: T201
    wh = next((a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--wh=")), "1920x1080")
    width, height = (int(x) for x in wh.split("x"))
    cb = next((int(a.split("=", 1)[1]) for a in sys.argv[1:] if a.startswith("--bounces=")), None)
    paths = next((a.split("=", 1)[1].split(",") for a in sys.argv[1:] if a.startswith("--paths=")), ["culled", "fused", "blocked"])
    sizes = [int(a) for a in args] or [1024]
    for n in sizes:
        for path in paths:
            try:
                measure(path, n, width=width, height=height, cull_bounces=cb)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({  # noqa: T201
                    "bench": "culled_smooth_adam_step", "path": path, "n_spheres": n,
                    "error": str(e).splitlines()[0][:200],
                }), flush=True)
