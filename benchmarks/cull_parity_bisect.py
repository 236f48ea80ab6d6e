"""Bisect the culled-smooth hardware divergence (non-stochastic).

Finds the smallest frame where blocked vs culled disagree on the chip,
then referees the failing size against the XLA smooth path to say WHICH
side is wrong.  Also reports per-bounce isolation via SMOOTH_CULL_BOUNCES.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from python_ray_tracer_tpu.camera import ray_directions  # noqa: E402
from python_ray_tracer_tpu.config import RenderConfig  # noqa: E402
from python_ray_tracer_tpu.models.scenes import inverse_task_scene  # noqa: E402
from python_ray_tracer_tpu.ops import pallas_culled_smooth as cs  # noqa: E402
from python_ray_tracer_tpu.ops.pallas_bounce_smooth_sub import trace_fused_smooth_sub  # noqa: E402
from python_ray_tracer_tpu.ops.pallas_culled_smooth import trace_culled_smooth  # noqa: E402
from python_ray_tracer_tpu.render import trace  # noqa: E402

SIZES = [(128, 72), (192, 108), (256, 144), (384, 216), (480, 270), (960, 540)]


def pair(width, height, scb=None, referee=False):
    saved = cs.SMOOTH_CULL_BOUNCES
    if scb is not None:
        cs.SMOOTH_CULL_BOUNCES = scb
    try:
        scene = inverse_task_scene(n_spheres=128, width=width, height=height,
                                   dtype=jnp.float32)
        base = dict(max_depth=3, dtype=jnp.float32, visibility="smooth",
                    edge_sharpness=200.0, shadow_sharpness=200.0)
        cfg = RenderConfig(**base, use_pallas=True)
        dirs = ray_directions(scene.camera, jnp.float32, None)
        a = np.asarray(jax.jit(lambda p, d: trace_fused_smooth_sub(
            p, d, scene, cfg))(scene.camera.position, dirs))
        b = np.asarray(jax.jit(lambda p, d: trace_culled_smooth(
            p, d, scene, cfg))(scene.camera.position, dirs))
        diff = np.abs(b - a)
        rec = {"res": f"{width}x{height}",
               "scb": cs.SMOOTH_CULL_BOUNCES if scb is not None else "default",
               "maxdiff_bc": float(diff.max()), "nbad_bc": int((diff > 1e-5).sum())}
        if referee:
            x = np.asarray(jax.jit(lambda p, d: trace(
                p, d, scene, RenderConfig(**base)))(scene.camera.position, dirs))
            rec["maxdiff_blocked_vs_xla"] = float(np.abs(a - x).max())
            rec["maxdiff_culled_vs_xla"] = float(np.abs(b - x).max())
        print(json.dumps(rec), flush=True)
        return diff.max() > 1e-5
    finally:
        cs.SMOOTH_CULL_BOUNCES = saved


if __name__ == "__main__":
    first_bad = None
    for w, h in SIZES:
        bad = pair(w, h)
        if bad and first_bad is None:
            first_bad = (w, h)
            break
    if first_bad:
        w, h = first_bad
        pair(w, h, referee=True)
        pair(w, h, scb=2)  # culled kernels at b<=1 (one sorted bounce)
