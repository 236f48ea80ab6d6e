"""Attribution for the config-4 culled path: where does the second go?

Times, at 1024 spheres x 1920x1080 x depth 4 on the real chip:
  a) full culled path (production)
  b) kernels with CONSTANT candidate lists (no per-bounce XLA glue)
  c) candidate_lists alone (the argsort + interval tests), per bounce
  d) round-1 lane fused kernel (the 0.29 s baseline)
  e) per-bounce candidate counts (how well does each bounce cull?)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

from python_ray_tracer_tpu import RenderConfig
from python_ray_tracer_tpu.camera import ray_directions_t
from python_ray_tracer_tpu.models.scenes import random_spheres_scene

W, H, DEPTH, S = 1920, 1080, 4, 1024
FRAMES = 10


def timed(name, fn, *args):
    @jax.jit
    def run(*a):
        def body(carry, _):
            out = fn(*a, bump=carry)
            return jnp.mean(out), None

        m, _ = jax.lax.scan(body, jnp.zeros(()), None, length=FRAMES)
        return m

    t0 = time.perf_counter()
    float(np.asarray(run(*args)))
    compile_s = time.perf_counter() - t0
    reps = []  # first post-compile rep can read high over the tunnel
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(run(*args)))
        reps.append((time.perf_counter() - t0) / FRAMES)
    print(json.dumps({"variant": name, "s_per_frame": round(min(reps), 4),
                      "reps": [round(r, 4) for r in reps],
                      "compile_s": round(compile_s, 1)}), flush=True)


def main():
    scene = random_spheres_scene(n_spheres=S, width=W, height=H, dtype=jnp.float32)
    cfg = RenderConfig(max_depth=DEPTH, dtype=jnp.float32, use_pallas=True)

    from python_ray_tracer_tpu.ops import pallas_culled as pc

    dirs_t = ray_directions_t(scene.camera, jnp.float32, None)

    def culled(dirs_t, scene, bump):
        import dataclasses

        cam = dataclasses.replace(scene.camera, position=scene.camera.position + bump * 1e-9)
        sc = dataclasses.replace(scene, camera=cam)
        return pc.trace_fused_culled(sc.camera.position, dirs_t, sc, cfg, transposed=True)

    # (tile rays, MAX_CAND) variants — constants are read at trace time,
    # so monkeypatching between fresh jits is sound.
    variants = [(4096, 1024)]
    if len(sys.argv) > 1:
        variants = [tuple(int(x) for x in v.split(":")[:2]) for v in sys.argv[1:]]
    for tile, cap in variants:
        if tile == 0:  # lane-kernel baseline (the 0.29 s round-1 path)
            from python_ray_tracer_tpu.ops.pallas_bounce import trace_fused

            def lane(dirs_t, scene, bump):
                import dataclasses
                cam = dataclasses.replace(scene.camera, position=scene.camera.position + bump * 1e-9)
                sc = dataclasses.replace(scene, camera=cam)
                return trace_fused(sc.camera.position, dirs_t, sc, cfg, transposed=True)

            timed("lane_kernel_baseline", lane, dirs_t, scene)
            continue
        pc.CULL_BLOCK_RAYS = tile
        pc.MAX_CAND = cap
        timed(f"culled_tile{tile}_cap{cap}", culled, dirs_t, scene)


if __name__ == "__main__":
    main()
