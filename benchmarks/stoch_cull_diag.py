"""Diagnostic ladder for the stochastic culled-smooth hardware desync.

stoch_cull_smoke found blocked-vs-culled forward maxdiff 0.13 on the chip
at 960x540x128 while interpret parity is clean at both sharpnesses.  Each
rung isolates one ingredient:

  r1: non-stoch, 960x540   — is the PLAIN culled path clean at scale?
  r2: stoch, 96x54         — compiled small: xi plumbing lowering?
  r3: stoch, 960x540, SCB=0 — no culled kernels, no sorts: pack path only
  r4: stoch, 960x540, SCB=1 — culled stoch kernel at b=0, no sort-follow
  r5: stoch, 960x540       — full path (the failing smoke)
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
from python_ray_tracer_tpu.ops.rng import fold_seed, seed_root  # noqa: E402


def rung(tag, width, height, stochastic, scb=None):
    saved = cs.SMOOTH_CULL_BOUNCES
    if scb is not None:
        cs.SMOOTH_CULL_BOUNCES = scb
    try:
        scene = inverse_task_scene(n_spheres=128, width=width, height=height,
                                   dtype=jnp.float32)
        cfg = RenderConfig(max_depth=3, dtype=jnp.float32, visibility="smooth",
                           edge_sharpness=200.0, shadow_sharpness=200.0,
                           stochastic_roughness=stochastic, rng_seed=7,
                           use_pallas=True)
        key = fold_seed(fold_seed(seed_root(cfg.rng_seed), 0), 4)
        dirs = ray_directions(scene.camera, jnp.float32, None)
        a = np.asarray(jax.jit(lambda p, d: trace_fused_smooth_sub(
            p, d, scene, cfg, key=key))(scene.camera.position, dirs))
        b = np.asarray(jax.jit(lambda p, d: trace_culled_smooth(
            p, d, scene, cfg, key=key))(scene.camera.position, dirs))
        diff = np.abs(b - a)
        print(json.dumps({
            "rung": tag, "res": f"{width}x{height}", "stoch": stochastic,
            "scb": cs.SMOOTH_CULL_BOUNCES if scb is not None else "default",
            "maxdiff": float(diff.max()), "nbad": int((diff > 1e-5).sum()),
        }), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"rung": tag, "error": str(e).splitlines()[0][:200]}),
              flush=True)
    finally:
        cs.SMOOTH_CULL_BOUNCES = saved


if __name__ == "__main__":
    rung("r1_nonstoch_big", 960, 540, False)
    rung("r2_stoch_small", 96, 54, True)
    rung("r3_stoch_big_scb0", 960, 540, True, scb=0)
    rung("r4_stoch_big_scb1", 960, 540, True, scb=1)
    rung("r5_stoch_big_full", 960, 540, True)
